"""Incremental upsert / delete / compaction / streaming ingest.

The strongest check: after a sequence of upserts, the engine must be
rank-identical to a fresh FTS5 index built from the FINAL corpus state —
incremental maintenance must be observationally equivalent to a rebuild
(the reference gets this from SQLite triggers; we get it from delta
segments + tombstones + stats refresh)."""

from __future__ import annotations

import math

import pytest

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.builder import Index, build_index
from letarette_spark.index.incremental import compact_index, upsert_documents
from letarette_spark.query.executor import Searcher
from tests.fts5_oracle import Fts5Index

CFG = AnalyzerConfig(mode="porter")


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [
            {"doc_id": f"d{r}", "rowid": r, "space": "main", "title": t,
             "body": b, "alive": a}
            for r, t, b, a in rows
        ]
    )


BASE = [
    (1, "alpha one", "the quick brown fox jumps over the lazy dog", True),
    (2, "beta two", "pack my box with five dozen liquor jugs", True),
    (3, "gamma three", "sphinx of black quartz judge my vow", True),
    (4, "delta four", "quick zephyrs blow vexing daft jim", True),
]

UPDATES_1 = [
    (2, "beta two v2", "a quick movement of the enemy will jeopardize gold", True),
    (5, "epsilon five", "the five boxing wizards jump quickly", True),
]

UPDATES_2 = [
    (3, "gamma three", "", False),                      # tombstone
    (1, "alpha one v2", "jinxed wizards pluck ivy from the big quilt quickly", True),
]

FINAL = [
    (1, "alpha one v2", "jinxed wizards pluck ivy from the big quilt quickly"),
    (2, "beta two v2", "a quick movement of the enemy will jeopardize gold"),
    (4, "delta four", "quick zephyrs blow vexing daft jim"),
    (5, "epsilon five", "the five boxing wizards jump quickly"),
]

QUERIES = ["quick", "wizard*", "five", "quick jump", '"my box"', "quartz", "the -gold"]


def _assert_matches_final_oracle(searcher, oracle):
    from letarette_spark.query.parser import (
        compile_match_string, parse_query, reduce_phrases,
    )

    for q in QUERIES:
        match = compile_match_string(reduce_phrases(parse_query(q)))
        expected = oracle.search(match, limit=10) if match else []
        df, _t, _c = searcher.search_df(q, limit=10)
        got = [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
        assert [r for r, _ in got] == [r for r, _ in expected], (q, got, expected)
        for (_, sg), (_, se) in zip(got, expected):
            assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), (q, sg, se)


@pytest.fixture(scope="module")
def upserted(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("inc_index"))
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    upsert_documents(spark, root, _docs_df(spark, UPDATES_2), batch_id=2)
    oracle = Fts5Index.build(FINAL)
    return root, oracle


def test_upserts_match_fresh_oracle(spark, upserted):
    root, oracle = upserted
    idx = Index.open(spark, root, CFG)
    assert len(idx.segments) == 2
    assert idx.meta["ndocs"] == 4
    _assert_matches_final_oracle(Searcher(idx), oracle)


def test_batch_replay_is_noop(spark, upserted):
    root, oracle = upserted
    idx = upsert_documents(spark, root, _docs_df(spark, UPDATES_2), batch_id=2)
    assert len(idx.segments) == 2  # replayed batch id -> unchanged
    _assert_matches_final_oracle(Searcher(idx), oracle)


def test_compaction_preserves_results(spark, upserted):
    root, oracle = upserted
    idx = compact_index(spark, root)
    assert idx.segments == []
    assert idx.meta["ndocs"] == 4
    _assert_matches_final_oracle(Searcher(idx), oracle)
    # tombstoned doc really gone from storage, not just filtered
    assert idx.docs().filter("rowid = 3 AND alive").count() == 0


def test_streaming_ingest(spark, tmp_path):
    import pandas as pd

    from letarette_spark.streaming.indexer import stream_document_updates

    root = str(tmp_path / "stream_index")
    # no explicit rowid: both builder and upsert derive xxhash64(doc_id),
    # the identity contract that makes streamed tombstones land
    base = _docs_df(spark, BASE).drop("rowid")
    build_index(spark, base, root, config=CFG, n_build_partitions=2, chunk_size=2)

    src = tmp_path / "updates"
    src.mkdir()
    pdf = pd.DataFrame(
        [
            {"doc_id": "d5", "space": "main", "title": "epsilon five",
             "body": "the five boxing wizards jump quickly", "alive": True},
            {"doc_id": "d3", "space": "main", "title": "gamma three",
             "body": "", "alive": False},
        ]
    )
    pdf["updated_at"] = pd.Series([pd.NaT, pd.NaT], dtype="datetime64[us]")
    pdf.to_parquet(src / "batch1.parquet")

    q = stream_document_updates(
        spark, root, str(src), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    idx = Index.open(spark, root, CFG)
    s = Searcher(idx)
    _df, total, _ = s.search_df("wizard*")
    assert total == 1
    _df, total, _ = s.search_df("sphinx")
    assert total == 0  # d3 tombstoned
    assert idx.meta["ndocs"] == 4


def test_upsert_invalidates_wand_blocks(spark, tmp_path):
    """Blocks built before an upsert reflect the old snapshot; the upsert
    must invalidate them or the WAND fast path would serve deleted docs."""
    from letarette_spark.index.blocks import build_blocks, has_blocks

    root = str(tmp_path / "blk_inval")
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    idx = Index.open(spark, root, CFG)
    build_blocks(idx, block_size=16)
    assert has_blocks(idx)

    idx = upsert_documents(spark, root, _docs_df(spark, UPDATES_2), batch_id=9)
    assert not has_blocks(idx)
    s = Searcher(idx)
    _df, total, _ = s.search_df("sphinx")   # d3 tombstoned by UPDATES_2
    assert total == 0


def test_housekeeping_rebuilds_wand_blocks(spark, tmp_path, monkeypatch):
    """A churning index must regain the block-max fast path: upsert drops
    the stale blocks, housekeeping compacts and REBUILDS them, and a
    single-term query routes through wand_topk again with rank-identical
    results (round-2 verdict task #3)."""
    from letarette_spark.index.blocks import build_blocks, has_blocks
    from letarette_spark.query import wand as wand_mod
    from letarette_spark.streaming.indexer import run_housekeeping

    root = str(tmp_path / "blk_rebuild")
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    build_blocks(Index.open(spark, root, CFG), block_size=16)

    upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    upsert_documents(spark, root, _docs_df(spark, UPDATES_2), batch_id=2)
    idx = Index.open(spark, root, CFG)
    assert not has_blocks(idx) and idx.segments

    did = run_housekeeping(spark, root, compact_segments_over=0)
    assert did["compacted"] and did["blocks"]
    idx = Index.open(spark, root, CFG)
    assert has_blocks(idx) and not idx.segments

    hits = []
    real = wand_mod.wand_topk
    monkeypatch.setattr(
        wand_mod, "wand_topk",
        lambda *a, **k: hits.append(1) or real(*a, **k),
    )
    # housekeeping refreshed auto-stopwords over the tiny corpus; pin an
    # empty set so the FTS5 oracle comparison stays apples-to-apples
    s = Searcher(idx, stopwords=frozenset(), synonyms={})
    df, total, _ = s.search_df("quick", limit=10)
    got = [(r["rowid"], r["score"]) for r in df.collect()]
    assert hits, "single-term query must route through the WAND fast path"
    expected = Fts5Index.build(FINAL).search('"quick"', limit=10)
    assert [r for r, _ in got] == [r for r, _ in expected]
    for (_, sg), (_, se) in zip(got, expected):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12)


def test_maintain_runs_idle_cadence(spark, tmp_path):
    """maintain() is the scheduler glue for the reference's 5-min idle
    housekeeping cadence (indexer.go:479-487): ticks fire every
    idle_seconds on the injected clock, busy ticks are skipped, idle
    ticks run run_housekeeping, and a compacting tick clears registered
    result caches."""
    from letarette_spark.query.cache import ResultCache
    from letarette_spark.streaming.indexer import maintain

    root = str(tmp_path / "maintain_idx")
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)

    now = [0.0]
    slept = []

    def clock():
        return now[0]

    def sleep(s):
        slept.append(s)
        now[0] += s

    busy = [True, False, False]  # first tick busy, then idle

    cache = ResultCache()
    cache.put(("sentinel",), "value", {"d1"})
    reports = maintain(
        spark, root, idle_seconds=300.0, max_cycles=3,
        is_idle=lambda: not (busy.pop(0) if busy else False),
        clock=clock, sleep=sleep, caches=[cache],
        compact_segments_over=0,
    )
    assert reports[0] == {"skipped": "busy"}
    assert reports[1]["compacted"] and reports[1]["stopwords"]
    assert not reports[2]["compacted"]  # already compacted
    # the cadence actually waited between ticks
    assert slept and all(s <= 300.0 for s in slept)
    # compaction cleared the registered cache
    assert cache.get(("sentinel",)) is None
    idx = Index.open(spark, root, CFG)
    assert not idx.segments


def test_streaming_batch_latest_version_wins(spark, tmp_path):
    """A micro-batch carrying v1 and v2 of a document must index the row
    with the max updated_at (the reference serializes writes in order);
    dropDuplicates would keep an arbitrary one."""
    import pandas as pd

    from letarette_spark.streaming.indexer import stream_document_updates

    root = str(tmp_path / "ver_index")
    base = _docs_df(spark, BASE).drop("rowid")
    build_index(spark, base, root, config=CFG, n_build_partitions=2, chunk_size=2)

    src = tmp_path / "updates"
    src.mkdir()
    pdf = pd.DataFrame(
        [
            {"doc_id": "d9", "space": "main", "title": "niner",
             "body": "stale version mentioning unicorns", "alive": True},
            {"doc_id": "d9", "space": "main", "title": "niner",
             "body": "fresh version mentioning dragons", "alive": True},
        ]
    )
    pdf["updated_at"] = pd.Series(
        pd.to_datetime(["2024-01-01 00:00:00", "2024-01-02 00:00:00"]),
        dtype="datetime64[us]",
    )
    pdf.to_parquet(src / "batch1.parquet")

    q = stream_document_updates(
        spark, root, str(src), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    s = Searcher(Index.open(spark, root, CFG))
    _df, total, _ = s.search_df("dragons")
    assert total == 1
    _df, total, _ = s.search_df("unicorns")
    assert total == 0


def test_upsert_does_not_scan_base_postings(spark, tmp_path, monkeypatch):
    """The additive stats merge must never read the base postings table —
    the one genuine scale-killer of a recompute-per-micro-batch design."""
    root = str(tmp_path / "merge_index")
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)

    def boom(self):
        raise AssertionError("upsert path read base postings")

    monkeypatch.setattr(Index, "postings", boom)
    idx = upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    monkeypatch.undo()
    assert idx.meta["ndocs"] == 5  # 4 base + d5 new, d2 replaced

    # exactness after the merge: rank-identical to a rebuild oracle
    mid = [
        (1, "alpha one", "the quick brown fox jumps over the lazy dog"),
        (2, "beta two v2", "a quick movement of the enemy will jeopardize gold"),
        (3, "gamma three", "sphinx of black quartz judge my vow"),
        (4, "delta four", "quick zephyrs blow vexing daft jim"),
        (5, "epsilon five", "the five boxing wizards jump quickly"),
    ]
    _assert_matches_final_oracle(Searcher(idx), Fts5Index.build(mid))


def test_docs_point_lookup_prunes_buckets(spark, tmp_path):
    root = str(tmp_path / "prune_index")
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    idx = Index.open(spark, root, CFG)
    nb = idx.meta["docs_buckets"]
    got = idx.docs_for_rowids([2])
    assert [r["doc_id"] for r in got.collect()] == ["d2"]
    want_rb = 2 % nb
    files = got.inputFiles()
    assert files, "point lookup read no files"
    assert all(f"rb={want_rb}/" in f for f in files), files


def test_upsert_commit_is_crash_atomic(spark, tmp_path, monkeypatch):
    """A kill anywhere before the manifest pointer flip leaves the previous
    snapshot fully readable (stats dirs are staged, never mutated)."""
    root = str(tmp_path / "crash_index")
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    before = Index.open(spark, root, CFG).meta

    from letarette_spark.index.manifest import Manifest

    def boom(self, meta):
        raise RuntimeError("injected crash at commit point")

    monkeypatch.setattr(Manifest, "commit_snapshot", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    monkeypatch.undo()

    idx = Index.open(spark, root, CFG)
    assert idx.meta["snapshot_id"] == before["snapshot_id"]
    assert idx.segments == []
    assert idx.term_stats().count() == before["nterms"]
    s = Searcher(idx)
    _df, total, _ = s.search_df("sphinx")
    assert total == 1  # pre-upsert corpus intact

    # the retried upsert then lands normally
    idx = upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    assert idx.meta["ndocs"] == 5
    _df, total, _ = Searcher(idx).search_df("wizard*")
    assert total == 1


def test_streaming_housekeeping_compacts_and_maintains(spark, tmp_path):
    """Housekeeping cadence (reference: idle-cycle doHousekeeping every
    5 min — indexer.go:476-487): compaction bounds segment pileup,
    stopwords refresh, spelling rebuilds when lag exceeds MaxLag."""
    import os

    import pandas as pd

    from letarette_spark.streaming.indexer import (
        run_housekeeping,
        stream_document_updates,
    )

    root = str(tmp_path / "hk_index")
    build_index(spark, _docs_df(spark, BASE).drop("rowid"), root, config=CFG,
                n_build_partitions=2, chunk_size=2)

    src = tmp_path / "updates"
    src.mkdir()
    for i, (rid, title, body, alive) in enumerate(UPDATES_1):
        pdf = pd.DataFrame([{
            "doc_id": f"d{rid}", "space": "main", "title": title,
            "body": body, "alive": alive,
        }])
        pdf["updated_at"] = pd.Series([pd.NaT], dtype="datetime64[us]")
        pdf.to_parquet(src / f"batch{i}.parquet")

    q = stream_document_updates(
        spark, root, str(src), str(tmp_path / "ckpt"),
        available_now=True, max_files_per_trigger=1,
        housekeep_every_batches=1, compact_segments_over=0,
    )
    q.awaitTermination(180)

    idx = Index.open(spark, root, CFG)
    assert idx.segments == []  # compacted away by housekeeping
    assert os.path.exists(os.path.join(root, "stopwords.json"))
    _df, total, _ = Searcher(idx, stopwords=frozenset()).search_df("wizard*")
    assert total == 1

    # force a spelling rebuild via the lag gate
    did = run_housekeeping(spark, root, spelling_min_count=1,
                           spelling_max_lag=0, compact_segments_over=None)
    assert did["spelling"] and os.path.exists(os.path.join(root, "speling"))


def test_randomized_upsert_sequences_match_rebuild_oracle(spark, tmp_path):
    """Property-style: a random sequence of inserts/replaces/deletes over
    several batches, through the ADDITIVE stats-merge path, must stay
    rank-identical to FTS5 rebuilt from the final state — then again
    after compaction. Also drives the bag-of-words API through the
    with-segments exhaustive fallback."""
    import random

    rnd = random.Random(5)
    words = ("quick brown fox lazy dog wizard sphinx quartz zephyr parser "
             "buffer token stream index merge gold silver copper vector").split()

    def make_body():
        return " ".join(rnd.choice(words) for _ in range(rnd.randint(6, 14)))

    state: dict[int, tuple[str, str]] = {}
    initial = []
    for r in range(1, 9):
        t, b = f"title {rnd.choice(words)}", make_body()
        state[r] = (t, b)
        initial.append((r, t, b, True))

    root = str(tmp_path / "rand_index")
    build_index(spark, _docs_df(spark, initial), root, config=CFG,
                n_build_partitions=2, chunk_size=2)

    next_id = 9
    for batch_no in range(3):
        ops = []
        for _ in range(rnd.randint(2, 4)):
            kind = rnd.choice(["insert", "replace", "delete"])
            if kind == "insert" or not state:
                rid, next_id = next_id, next_id + 1
                t, b = f"title {rnd.choice(words)}", make_body()
                state[rid] = (t, b)
                ops.append((rid, t, b, True))
            elif kind == "replace":
                rid = rnd.choice(sorted(state))
                t, b = f"title {rnd.choice(words)} v2", make_body()
                state[rid] = (t, b)
                ops.append((rid, t, b, True))
            else:
                rid = rnd.choice(sorted(state))
                del state[rid]
                ops.append((rid, "", "", False))
        # one row per doc_id per batch (the upsert contract)
        dedup = {}
        for rid, t, b, alive in ops:
            dedup[rid] = (rid, t, b, alive)
        upsert_documents(spark, root, _docs_df(spark, list(dedup.values())),
                         batch_id=100 + batch_no)

    oracle = Fts5Index.build([(r, t, b) for r, (t, b) in sorted(state.items())])
    queries = ["quick", "wizard*", '"lazy dog"', "parser -buffer",
               "gold silver", "sphinx"]

    def check(idx):
        from letarette_spark.query.parser import (
            compile_match_string, parse_query, reduce_phrases,
        )

        s = Searcher(idx)
        for q in queries:
            match = compile_match_string(reduce_phrases(parse_query(q)))
            expected = oracle.search(match, limit=10) if match else []
            df, _t, _c = s.search_df(q, limit=10)
            got = ([(r["rowid"], r["score"]) for r in df.collect()]
                   if df is not None else [])
            assert [r for r, _ in got] == [r for r, _ in expected], (q, got, expected)
            for (_, sg), (_, se) in zip(got, expected):
                assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), q

    idx = Index.open(spark, root, CFG)
    assert idx.meta["ndocs"] == len(state)
    check(idx)

    # bag-of-words API through the exhaustive with-segments fallback
    s = Searcher(idx)
    bw = s.search_terms_df(["quick", "wizard"], mode="or", limit=10)
    exp = oracle.search('"quick" OR "wizard"', limit=10)
    got = [(r["rowid"], r["score"]) for r in bw.collect()]
    assert [r for r, _ in got] == [r for r, _ in exp]
    for (_, sg), (_, se) in zip(got, exp):
        assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12)

    check(compact_index(spark, root))
