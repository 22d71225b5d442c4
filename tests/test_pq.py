"""Product quantization (functions/pq.py) vs a numpy reference:
codebook seeding, Lloyd refinement, encoding argmin ties, ADC ranking."""

from __future__ import annotations

import numpy as np
import pytest

from letarette_spark.functions.pq import (
    pq_adc_lut,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)

DIM, M, K = 16, 4, 4
DSUB = DIM // M


def _vectors(n=40, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, DIM).round(3)  # round: stable float literals


def _df(spark, vecs):
    return spark.createDataFrame(
        [
            {"vec_id": i, "embedding": [float(x) for x in v]}
            for i, v in enumerate(vecs)
        ]
    )


def _np_books_seed(vecs):
    seeds = vecs[:K]  # k lowest ids
    return [
        [list(s[j * DSUB : (j + 1) * DSUB]) for s in seeds] for j in range(M)
    ]


def _np_encode(vecs, books):
    out = []
    for v in vecs:
        codes = []
        for s in range(M):
            sub = v[s * DSUB : (s + 1) * DSUB]
            d2 = [float(np.sum((sub - np.array(c)) ** 2)) for c in books[s]]
            codes.append(int(np.argmin(d2)))  # argmin ties -> lowest index
        out.append(codes)
    return out


def _np_lloyd(vecs, n_iter):
    books = _np_books_seed(vecs)
    for _ in range(n_iter):
        codes = _np_encode(vecs, books)
        new = [list(b) for b in books]
        for s in range(M):
            for j in range(K):
                members = [
                    vecs[i][s * DSUB : (s + 1) * DSUB]
                    for i, c in enumerate(codes)
                    if c[s] == j
                ]
                if members:
                    new[s][j] = list(np.mean(members, axis=0))
        if new == books:
            break
        books = new
    return books


def test_seed_codebooks_match_numpy(spark):
    vecs = _vectors()
    books = pq_codebooks(_df(spark, vecs), m=M, k=K, n_iter=0)
    exp = _np_books_seed(vecs)
    assert np.allclose(np.array(books), np.array(exp))


def test_lloyd_refinement_matches_numpy(spark):
    vecs = _vectors()
    books = pq_codebooks(_df(spark, vecs), m=M, k=K, n_iter=2)
    exp = _np_lloyd(vecs, 2)
    assert np.allclose(np.array(books), np.array(exp), atol=1e-9)


def test_encode_matches_numpy_argmin(spark):
    vecs = _vectors()
    books = pq_codebooks(_df(spark, vecs), m=M, k=K, n_iter=1)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(_df(spark, vecs), books).collect()
    }
    exp = _np_encode(vecs, books)
    assert got == {i: c for i, c in enumerate(exp)}


def test_seed_vectors_encode_to_themselves(spark):
    """Seed vector j's subvectors ARE codebook entries j: zero distance,
    exact in float64 (identical fold on identical operands)."""
    vecs = _vectors()
    books = pq_codebooks(_df(spark, vecs), m=M, k=K, n_iter=0)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(_df(spark, vecs), books).collect()
    }
    for j in range(K):
        assert got[j] == [j] * M


def test_adc_topk_matches_numpy(spark):
    vecs = _vectors(60)
    df = _df(spark, vecs)
    books = pq_codebooks(df, m=M, k=K, n_iter=1)
    got = [(r["vec_id"], r["adist"]) for r in
           pq_adc_topk(df, query_id=3, codebooks=books, k=7).collect()]
    lut = pq_adc_lut([float(x) for x in vecs[3]], books)
    codes = _np_encode(vecs, books)
    dists = [
        (i, sum(lut[s][codes[i][s]] for s in range(M)))
        for i in range(len(vecs)) if i != 3
    ]
    dists.sort(key=lambda t: (t[1], t[0]))
    exp = dists[:7]
    assert [i for i, _ in got] == [i for i, _ in exp]
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-9


def test_adc_approximates_true_neighbors(spark):
    """Clustered data: ADC's top neighbors land in the query's true
    cluster (the approximation is useful, not just self-consistent)."""
    rng = np.random.RandomState(0)
    centers = rng.randn(4, DIM) * 5
    vecs = np.array([
        centers[i % 4] + rng.randn(DIM) * 0.1 for i in range(48)
    ]).round(3)
    df = _df(spark, vecs)
    books = pq_codebooks(df, m=M, k=K, n_iter=3)
    got = [r["vec_id"] for r in
           pq_adc_topk(df, query_id=0, codebooks=books, k=8).collect()]
    assert all(i % 4 == 0 for i in got), got  # query 0's cluster is i%4==0


def test_dim_not_divisible_raises(spark):
    with pytest.raises(ValueError):
        pq_codebooks(_df(spark, _vectors()), m=3, k=K)


def test_ivf_pq_topk_matches_numpy(spark):
    """IVF routing (cosine argmax cells, probe top-nprobe) composed with
    ADC ranking, vs a full numpy reference."""
    from letarette_spark.functions.pq import ivf_pq_topk
    from letarette_spark.functions.similarity import (
        ivf_centroids,
        ivf_probe_cells,
    )

    vecs = _vectors(60)
    df = _df(spark, vecs)
    cents = ivf_centroids(df, n_cells=5, n_iter=1)
    books = pq_codebooks(df, m=M, k=K, n_iter=1)
    got = [(r["vec_id"], r["adist"]) for r in
           ivf_pq_topk(df, query_id=3, centroids=cents, codebooks=books,
                       k=7, nprobe=2).collect()]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y; na += x * x; nb += y * y
        d = (na ** 0.5) * (nb ** 0.5)
        return dot / d if d else float("-inf")

    cells = {
        i: min(range(len(cents)),
               key=lambda j: (-cos(list(v), cents[j]), j))
        for i, v in enumerate(vecs)
    }
    probe = set(ivf_probe_cells([float(x) for x in vecs[3]], cents, 2))
    lut = pq_adc_lut([float(x) for x in vecs[3]], books)
    codes = _np_encode(vecs, books)
    dists = [
        (i, sum(lut[s][codes[i][s]] for s in range(M)))
        for i in range(len(vecs))
        if i != 3 and cells[i] in probe
    ]
    dists.sort(key=lambda t: (t[1], t[0]))
    exp = dists[:7]
    assert [i for i, _ in got] == [i for i, _ in exp], (got, exp)
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-9


def test_pq_index_partition_pruning_and_equality(spark, tmp_path):
    """The materialized IVF-PQ index: cell predicate lands in
    PartitionFilters (directory pruning — the 100-TB claim) and the
    indexed query returns exactly what the in-memory ivf_pq_topk does."""
    from pyspark.sql import functions as F

    from letarette_spark.functions.pq import (
        ivf_pq_topk,
        pq_index_topk,
        pq_index_write,
    )
    from letarette_spark.functions.similarity import (
        ivf_centroids,
        ivf_probe_cells,
    )

    vecs = _vectors(60)
    df = _df(spark, vecs)
    cents = ivf_centroids(df, n_cells=4, n_iter=1)
    books = pq_codebooks(df, m=M, k=K, n_iter=1)
    path = str(tmp_path / "pqidx")
    pq_index_write(df, path, cents, books)

    qv = [float(x) for x in vecs[3]]
    out = pq_index_topk(spark, path, qv, cents, books, k=7, nprobe=2,
                        exclude_id=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan, plan

    got = [(r["vec_id"], round(r["adist"], 9)) for r in out.collect()]
    exp = [(r["vec_id"], round(r["adist"], 9)) for r in
           ivf_pq_topk(df, query_id=3, centroids=cents, codebooks=books,
                       k=7, nprobe=2).collect()]
    assert got == exp

    # files actually read are only the probed cell dirs
    probed = set(ivf_probe_cells(qv, cents, 2))
    files = [
        r["f"]
        for r in spark.read.parquet(path)
        .filter(F.col("cell").isin(list(probed)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    assert files and all(
        any(f"cell={c}/" in f for c in probed) for f in files
    ), files


def test_ivf_pq_rerank_matches_numpy_and_improves_order(spark):
    """Shortlist by ADC, exact-cosine re-rank: matches the numpy
    composition, and the final ordering is by TRUE cosine."""
    from letarette_spark.functions.pq import ivf_pq_rerank_topk, ivf_pq_topk
    from letarette_spark.functions.similarity import ivf_centroids

    vecs = _vectors(60)
    df = _df(spark, vecs)
    cents = ivf_centroids(df, n_cells=5, n_iter=1)
    books = pq_codebooks(df, m=M, k=K, n_iter=1)
    got = [(r["vec_id"], r["cos"]) for r in
           ivf_pq_rerank_topk(df, query_id=3, centroids=cents,
                              codebooks=books, k=5, shortlist=12,
                              nprobe=2).collect()]

    short = [r["vec_id"] for r in
             ivf_pq_topk(df, query_id=3, centroids=cents, codebooks=books,
                         k=12, nprobe=2).collect()]

    def cos(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y; na += x * x; nb += y * y
        d = (na ** 0.5) * (nb ** 0.5)
        return dot / d if d else float("-inf")

    exp = sorted(
        ((i, cos(list(vecs[i]), list(vecs[3]))) for i in short),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [i for i, _ in got] == [i for i, _ in exp], (got, exp)
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-9
    # ordering is by true cosine, descending
    assert all(got[i][1] >= got[i + 1][1] for i in range(len(got) - 1))

    with pytest.raises(ValueError):
        ivf_pq_rerank_topk(df, 3, cents, books, k=10, shortlist=5)


def test_null_embeddings_dropped_from_codes_and_topk(spark):
    """A NULL embedding has no meaningful code: without the isNotNull
    filter in pq_encode, every codebook distance is NULL, the struct
    array_min tie-breaks to code 0, and the row competes in ADC top-k
    with a finite distance. It must simply not appear."""
    vecs = _vectors(12)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows.append((99, None))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    books = pq_codebooks(emb, m=M, k=K)
    codes = pq_encode(emb, books)
    ids = {r["vec_id"] for r in codes.collect()}
    assert 99 not in ids
    assert ids == set(range(12))
    top = pq_adc_topk(emb, 0, books, k=11).collect()
    assert len(top) == 11
    assert all(r["vec_id"] != 99 for r in top)


def test_arrow_encode_matches_jvm_expr_twin(spark):
    """The Arrow encoder (pq_encode) must be code-for-code identical to
    the JVM expression formulation (pq_encode_expr) — including near-tie
    distances, negative values, and the corpus embeddings."""
    import numpy as np

    from letarette_spark.functions.pq import pq_encode_expr

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((64, 16)).astype(np.float64)
    # plant exact ties: duplicate codeword subvectors
    vecs[10] = vecs[11]
    books = pq_codebooks(_df(spark, vecs), m=4, k=8, n_iter=1)
    df = _df(spark, vecs)
    arrow = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    jvm = {r["vec_id"]: list(r["codes"]) for r in pq_encode_expr(df, books).collect()}
    assert arrow == jvm

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books2 = pq_codebooks(emb, m=8, k=16, n_iter=1)
    arrow2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books2).collect()}
    jvm2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode_expr(emb, books2).collect()}
    assert arrow2 == jvm2
