"""Deterministic sampling (functions/sampling.py): partition independence,
exact quotas, prefilter equivalence, zero-shuffle plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from letarette_spark.functions.sampling import (
    hash_sample,
    quota_sample,
    stratified_sample,
    take_deterministic,
    temperature_sample,
    unit_hash,
)


@pytest.fixture(scope="module")
def df(spark):
    langs = ["go", "py", "md", "rs"]
    return spark.createDataFrame(
        [(i, langs[i % 4], f"doc {i}") for i in range(400)],
        "doc_id long, lang string, text string",
    )


def _ids(frame):
    return sorted(r["doc_id"] for r in frame.collect())


def test_hash_sample_deterministic_and_partition_independent(df):
    a = _ids(hash_sample(df, 0.2, seed=7))
    b = _ids(hash_sample(df.repartition(13), 0.2, seed=7))
    assert a == b and a  # same subset at any partitioning
    # roughly the right size (md5 uniformity; wide tolerance)
    assert 0.10 * 400 < len(a) < 0.30 * 400
    # a different seed gives a different subset
    assert a != _ids(hash_sample(df, 0.2, seed=8))
    # monotone in fraction: smaller sample nests inside larger
    assert set(a) <= set(_ids(hash_sample(df, 0.5, seed=7)))


def test_hash_sample_bounds(df):
    assert _ids(hash_sample(df, 0.0)) == []
    assert len(_ids(hash_sample(df, 1.0))) == 400
    with pytest.raises(ValueError):
        hash_sample(df, 1.5)


def test_stratified_fractions(df):
    out = stratified_sample(df, "lang", {"go": 0.5, "py": 0.1}, seed=3)
    rows = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    assert set(by_lang) <= {"go", "py"}  # default 0.0 drops the rest
    assert by_lang["go"] > by_lang.get("py", 0)
    # per-row membership equals the plain hash_sample at that fraction
    go_only = {r["doc_id"] for r in out.filter("lang = 'go'").collect()}
    expect = {
        r["doc_id"]
        for r in hash_sample(df.filter("lang = 'go'"), 0.5, seed=3).collect()
    }
    assert go_only == expect


def test_quota_exact_counts(df):
    out = quota_sample(df, "lang", 17, seed=5)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"go": 17, "py": 17, "md": 17, "rs": 17}
    # quota above the stratum size returns the whole stratum
    out2 = quota_sample(df, "lang", 500, seed=5)
    assert out2.count() == 400
    # deterministic + partition independent
    assert _ids(out) == _ids(quota_sample(df.repartition(9), "lang", 17, seed=5))


def test_quota_prefilter_equivalence(df):
    base = _ids(quota_sample(df, "lang", 10, seed=11))
    # generous prefilter keeps >= 10 rows/stratum -> identical subset
    pre = _ids(quota_sample(df, "lang", 10, seed=11, prefilter=0.8))
    assert base == pre


def test_take_deterministic(df):
    a = take_deterministic(df, 25, seed=2)
    b = take_deterministic(df.repartition(17), 25, seed=2)
    assert _ids(a) == _ids(b) and a.count() == 25
    # the 25 selected are exactly the smallest unit_hash rows
    ranked = df.select("doc_id", unit_hash(seed=2).alias("h")).collect()
    want = sorted(r["doc_id"] for r in sorted(ranked, key=lambda r: (r["h"], str(r["doc_id"])))[:25])
    assert _ids(a) == want


def test_temperature_quotas(spark):
    """Skewed strata: 300 'en', 80 'fr', 20 'zh'; target 100, alpha=0.5.
    weights sqrt: 17.32/8.94/4.47 (sum 30.74) -> quotas floor(100*w/S) =
    56 / 29 / 14."""
    import math

    df = spark.createDataFrame(
        [(i, "en" if i < 300 else ("fr" if i < 380 else "zh"), "t")
         for i in range(400)],
        "doc_id long, lang string, text string",
    )
    out = temperature_sample(df, "lang", 100, alpha=0.5, seed=3)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    s = math.sqrt(300) + math.sqrt(80) + math.sqrt(20)
    want = {
        "en": int(100 * math.sqrt(300) / s),
        "fr": int(100 * math.sqrt(80) / s),
        "zh": int(100 * math.sqrt(20) / s),
    }
    assert counts == want
    # alpha=1 keeps the natural proportions; quota caps at stratum size
    nat = temperature_sample(df, "lang", 400, alpha=1.0, seed=3)
    ncounts = {r["lang"]: r["count"] for r in nat.groupBy("lang").count().collect()}
    assert ncounts == {"en": 300, "fr": 80, "zh": 20}
    # alpha=0 flattens to equal quotas (pow(n,0)=1)
    flat = temperature_sample(df, "lang", 60, alpha=0.0, seed=3)
    fcounts = {r["lang"]: r["count"] for r in flat.groupBy("lang").count().collect()}
    assert fcounts == {"en": 20, "fr": 20, "zh": 20}
    # deterministic + partition independent
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(df.repartition(11), "lang", 100, 0.5, seed=3).collect()
    )
    assert a == b


def test_split_by_cluster(spark):
    from letarette_spark.functions.sampling import split_by_cluster

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(1, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"
    )
    out = {r["doc_id"]: r for r in split_by_cluster(docs, pairs, 0.3, seed=4).collect()}
    assert set(out) == set(range(1, 9))
    # clusters are atomic: {1,2,3} share a component AND a split
    assert out[1]["component"] == out[2]["component"] == out[3]["component"] == 1
    assert out[1]["split"] == out[2]["split"] == out[3]["split"]
    assert out[5]["component"] == out[6]["component"] == 5
    assert out[5]["split"] == out[6]["split"]
    # singletons are their own component
    for i in (4, 7, 8):
        assert out[i]["component"] == i
    # extreme fractions
    all_train = split_by_cluster(docs, pairs, 0.0).filter("split = 'test'").count()
    all_test = split_by_cluster(docs, pairs, 1.0).filter("split = 'train'").count()
    assert all_train == 0 and all_test == 0
    # deterministic under repartition
    a = sorted(map(tuple, split_by_cluster(docs, pairs, 0.3, seed=4).collect()))
    b = sorted(map(tuple, split_by_cluster(docs.repartition(5), pairs, 0.3, seed=4).collect()))
    assert a == b


def test_filter_plans_have_no_exchange(df):
    for frame in (
        hash_sample(df, 0.3, seed=1),
        stratified_sample(df, "lang", {"go": 0.5}, seed=1),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "sampling filters must not shuffle"


# ---- deterministic shard shuffle (assign_shards / shard_positions /
# ---- write_training_shards): the final pipeline stage before training


def _py_shard(doc_id, n=8, seed=7):
    import hashlib

    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % n, h


def test_assign_shards_zero_shuffle_and_partition_independent(df):
    from letarette_spark.functions.sampling import assign_shards, shard_positions

    plan = assign_shards(df, 8, seed=7)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "shard assignment must be a pure projection"

    a = sorted(map(tuple, shard_positions(df, 8, seed=7).collect()))
    b = sorted(map(tuple, shard_positions(df.repartition(13), 8, seed=7).collect()))
    assert a == b and len(a) == 400
    assert {t[1] for t in a} == set(range(8))  # every shard populated


def test_shard_positions_match_python_oracle(df):
    from letarette_spark.functions.sampling import shard_positions

    per_shard = {}
    for r in df.select("doc_id").collect():
        s, h = _py_shard(r["doc_id"])
        per_shard.setdefault(s, []).append((h, str(r["doc_id"]), r["doc_id"]))
    expected = {
        (did, s, pos)
        for s, lst in per_shard.items()
        for pos, (_, _, did) in enumerate(sorted(lst), 1)
    }
    got = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_positions(df, 8, seed=7).collect()
    }
    assert got == expected


def test_write_training_shards_ordered_files(df, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from letarette_spark.functions.sampling import write_training_shards

    out = str(tmp_path / "shards")
    write_training_shards(df, out, 8, seed=7)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == 8
    seq = {}
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, "each shard must be ONE ordered file"
        s = int(d.rsplit("=", 1)[1])
        t = pq.read_table(files[0])
        assert "sort_key" not in t.column_names  # helper column dropped
        seq[s] = t.column("doc_id").to_pylist()
    assert sum(len(v) for v in seq.values()) == 400
    # in-file order == digest order (the python oracle), shard == md5 % 8
    for s, ids in seq.items():
        assert all(_py_shard(i)[0] == s for i in ids)
        assert ids == sorted(ids, key=lambda i: (_py_shard(i)[1], str(i)))
    # bit-identical rewrite from a different input partitioning
    out2 = str(tmp_path / "shards2")
    write_training_shards(df.repartition(5), out2, 8, seed=7)
    for s, ids in seq.items():
        f2 = glob.glob(os.path.join(out2, f"shard={s}", "*.parquet"))
        assert pq.read_table(f2[0]).column("doc_id").to_pylist() == ids
