"""Snapshot retention + time-travel reads (Iceberg VERSION AS OF analog).

The manifest already commits every mutation as a numbered snapshot behind
an atomic CURRENT pointer (manifest.py). With snapshot_retention > 1 the
older snapshot states stay readable: Index.open(..., snapshot_id=n) must
serve EXACTLY the results the index served when snapshot n was current,
through upserts, deletes, and compaction — and expire_snapshots must
reclaim the data dirs only expired snapshots referenced without touching
the current serving state.

Reference tie-in: the reference exposes a single live SQLite state; the
snapshot/retention model is the Spark-native extension of its
crash-atomic index swap (letarette/db.go transactions) to a multi-reader
cluster where a long-running query must keep reading the state it
planned against.
"""

from __future__ import annotations

import math
import os

import pytest

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.builder import Index, build_index
from letarette_spark.index.incremental import (
    compact_index,
    expire_snapshots,
    upsert_documents,
)
from letarette_spark.index.manifest import Manifest
from letarette_spark.query.executor import Searcher

CFG = AnalyzerConfig(mode="porter")

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
    (3, "gamma three", "", False),  # tombstone
    (1, "alpha one v2", "jinxed wizards pluck ivy from the big quilt quickly", True),
]

QUERIES = ["quick", "five", "quartz", "wizard*", '"my box"']


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [
            {"doc_id": f"d{r}", "rowid": r, "space": "main", "title": t,
             "body": b, "alive": a}
            for r, t, b, a in rows
        ]
    )


def _results(index):
    s = Searcher(index)
    out = {}
    for q in QUERIES:
        df, _t, _c = s.search_df(q, limit=10)
        out[q] = (
            [(r["rowid"], r["score"]) for r in df.collect()] if df is not None else []
        )
    return out


def _assert_same(a, b, ctx=""):
    assert a.keys() == b.keys()
    for q in a:
        assert [r for r, _ in a[q]] == [r for r, _ in b[q]], (ctx, q, a[q], b[q])
        for (_, x), (_, y) in zip(a[q], b[q]):
            assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12), (ctx, q, x, y)


@pytest.fixture(scope="module")
def retained(spark, tmp_path_factory):
    """Build with retention=4, apply two upserts, record results at each
    state."""
    root = str(tmp_path_factory.mktemp("tt_index"))
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2, snapshot_retention=4)
    states = {}
    idx = Index.open(spark, root)
    s1 = int(idx.meta["snapshot_id"])
    states[s1] = _results(idx)
    idx = upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    s2 = int(idx.meta["snapshot_id"])
    states[s2] = _results(idx)
    idx = upsert_documents(spark, root, _docs_df(spark, UPDATES_2), batch_id=2)
    s3 = int(idx.meta["snapshot_id"])
    states[s3] = _results(idx)
    return root, states, (s1, s2, s3)


def test_time_travel_reads_serve_each_retained_state(spark, retained):
    root, states, _ = retained
    for sid, expected in states.items():
        got = _results(Index.open(spark, root, snapshot_id=sid))
        _assert_same(got, expected, ctx=f"snapshot {sid}")


def test_history_lists_retained_snapshots(spark, retained):
    root, states, (s1, s2, s3) = retained
    hist = Manifest.history(root)
    ids = [h["snapshot_id"] for h in hist]
    assert ids == sorted(states.keys())
    by_id = {h["snapshot_id"]: h for h in hist}
    assert by_id[s1]["segments"] == 0
    assert by_id[s3]["segments"] == 2
    assert by_id[s3]["ndocs"] == 4  # 5 docs, one tombstoned


def test_time_travel_survives_compaction(spark, retained):
    root, states, (s1, s2, s3) = retained
    compact_index(spark, root)
    # compaction must not collect segment dirs an older snapshot overlays
    for sid, expected in states.items():
        got = _results(Index.open(spark, root, snapshot_id=sid))
        _assert_same(got, expected, ctx=f"post-compact snapshot {sid}")
    # current (compacted) state equals the last pre-compact state
    cur = _results(Index.open(spark, root))
    _assert_same(cur, states[s3], ctx="compacted current")


def test_expire_snapshots_reclaims_and_protects_current(spark, retained):
    root, states, (s1, s2, s3) = retained
    # self-sufficient under test selection: compact first (idempotent —
    # a no-op when the compaction test already ran)
    compact_index(spark, root)
    remaining = expire_snapshots(root, keep_last=1)
    cur_id = int(Manifest.load(root).state["snapshot_id"])
    assert remaining == [cur_id]
    with pytest.raises(FileNotFoundError):
        Index.open(spark, root, snapshot_id=s1)
    # expired snapshots' data dirs are gone: no term_stats.vN other than
    # the current one, no seg/ overlay dirs
    cur = Manifest.load(root).state
    stale = [
        n
        for n in os.listdir(root)
        if n.startswith("term_stats") and n != cur.get("term_stats_dir", "term_stats")
    ]
    assert stale == []
    assert not os.path.exists(os.path.join(root, "seg"))
    # current still serves, unchanged
    _assert_same(_results(Index.open(spark, root)), states[s3], ctx="post-expire")


def test_default_retention_keeps_single_snapshot(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tt_default"))
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2)
    upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    cur_id = int(Manifest.load(root).state["snapshot_id"])
    assert Manifest.retained_ids(root) == [cur_id]
    # old versioned dirs were GC'd exactly as before this feature
    cur = Manifest.load(root).state
    stale = [
        n
        for n in os.listdir(root)
        if n.startswith("term_stats") and n != cur.get("term_stats_dir", "term_stats")
    ]
    assert stale == []


def test_phantom_snapshot_file_is_invisible(spark, tmp_path_factory):
    """A crash between the snapshot-file write and the CURRENT pointer
    flip leaves a snapshot file NEWER than CURRENT. It must never be
    listed, served, or counted by retention — and the next successful
    commit reuses its id, atomically overwriting the phantom."""
    import json
    import os

    root = str(tmp_path_factory.mktemp("tt_phantom"))
    build_index(spark, _docs_df(spark, BASE), root, config=CFG,
                n_build_partitions=2, chunk_size=2, snapshot_retention=4)
    man = Manifest.load(root)
    cur = int(man.state["snapshot_id"])
    # simulate the torn commit: phantom file at cur+1, CURRENT unchanged
    phantom = man._snapshot_path(cur + 1)
    os.makedirs(os.path.dirname(phantom), exist_ok=True)
    with open(phantom, "w") as f:
        json.dump(dict(man.state, snapshot_id=cur + 1,
                       term_stats_dir="term_stats.v999"), f)

    assert Manifest.retained_ids(root) == [cur]
    assert [h["snapshot_id"] for h in Manifest.history(root)] == [cur]
    with pytest.raises(FileNotFoundError):
        Index.open(spark, root, snapshot_id=cur + 1)

    # the next real commit takes id cur+1 and overwrites the phantom
    upsert_documents(spark, root, _docs_df(spark, UPDATES_1), batch_id=1)
    man2 = Manifest.load(root)
    assert int(man2.state["snapshot_id"]) == cur + 1
    st = Manifest.load_snapshot(root, cur + 1).state
    assert st.get("term_stats_dir") != "term_stats.v999"
    assert Manifest.retained_ids(root) == [cur, cur + 1]
