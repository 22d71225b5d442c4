"""Streaming pipeline operators (streaming/pipeline.py): windowed aggs,
session windows, and dedup under event-time watermarks.

Protocol: replay the sf0.001 events table as ts-ordered file chunks with
maxFilesPerTrigger=1 (one micro-batch per file, deterministic watermark
progression), availableNow, memory sink. The oracle is the SAME operator
run on the static frame, restricted to windows/sessions the final
watermark closed — append mode must emit exactly those, once.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from letarette_spark.streaming.pipeline import (
    dedup_events,
    hourly_counts,
    read_event_stream,
    run_stream,
    sessionize,
)

SF = "/root/testdata/sf0.001"
WM = "30 minutes"
WM_DELTA = dt.timedelta(minutes=30)


def _qname(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


@pytest.fixture(scope="module")
def static_events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .cache()
    )


@pytest.fixture(scope="module")
def chunked_dir(spark, tmp_path_factory, static_events):
    """Three ts-ordered parquet chunks (early/middle/late thirds) — no
    out-of-order data across chunks, so every event survives the
    watermark and closed windows carry full counts."""
    out = tmp_path_factory.mktemp("events_chunks")
    rows = static_events.orderBy("ts", "event_id").collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third: (i + 1) * third]
        if chunk:
            spark.createDataFrame(chunk, static_events.schema).coalesce(
                1
            ).write.parquet(str(out / f"chunk{i}"), mode="overwrite")
    # flatten: move part files up so the stream source sees 3 files
    files = sorted(str(p) for p in out.rglob("part-*.parquet"))
    flat = tmp_path_factory.mktemp("events_flat")
    for i, f in enumerate(files):
        dst = str(flat / f"{i:03d}.parquet")
        shutil.copy(f, dst)
        _stamp_mtime(dst, i)
    return str(flat)


def _stamp_mtime(path: str, order: int) -> None:
    """The file stream source orders files by MODIFICATION TIME, not
    name — files copied in quick succession get near-identical mtimes
    and replay in arbitrary order (flaky watermarks). Stamp strictly
    increasing mtimes to pin the replay order."""
    t = 1_700_000_000 + order * 60
    os.utime(path, (t, t))


def _final_watermark(static_events) -> dt.datetime:
    return static_events.agg(F.max("ts")).collect()[0][0] - WM_DELTA


def test_hourly_stream_emits_exactly_closed_windows(
    spark, tmp_path, static_events, chunked_dir
):
    stream = read_event_stream(spark, chunked_dir, max_files_per_trigger=1)
    name = _qname("hourly")
    run_stream(hourly_counts(stream, WM), str(tmp_path / "ck"), name)
    got = {
        (r["hour"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.table(name).collect()
    }
    wm = _final_watermark(static_events)
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["total_value"])
        for r in hourly_counts(static_events).collect()
        if r["hour"] + dt.timedelta(hours=1) <= wm
    }
    assert got == want
    assert len(got) > 0


def test_session_stream_emits_exactly_closed_sessions(
    spark, tmp_path, static_events, chunked_dir
):
    stream = read_event_stream(spark, chunked_dir, max_files_per_trigger=1)
    name = _qname("sessions")
    run_stream(sessionize(stream, 30, WM), str(tmp_path / "ck"), name)
    got = {
        (r["session_start"], r["user_id"]): (
            r["session_end"], r["n_events"], r["total_value"]
        )
        for r in spark.table(name).collect()
    }
    wm = _final_watermark(static_events)
    want = {
        (r["session_start"], r["user_id"]): (
            r["session_end"], r["n_events"], r["total_value"]
        )
        for r in sessionize(static_events, 30).collect()
        if r["session_end"] <= wm
    }
    assert got == want
    assert len(got) > 0


def test_session_window_agrees_with_lag_cumsum_rule(spark, static_events):
    """The native session_window produces the same per-user session
    COUNT as the batch gate's lag+cumsum rule (identical semantics:
    both split only when the gap strictly exceeds the horizon — the
    exact-gap boundary is pinned below)."""
    spans = (
        sessionize(static_events, 30)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    # microsecond precision, exactly like q_sessionize and session_window
    # (floored seconds would disagree on sub-second timestamps)
    micros = F.unix_micros(F.col("ts"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = micros - F.lag(micros).over(w)
    lagrule = (
        static_events.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"))
    )
    a = {r["user_id"]: r["n_sessions"] for r in spans.collect()}
    b = {r["user_id"]: r["n_sessions"] for r in lagrule.collect()}
    assert a == b


def test_session_window_boundary_merge_rule(spark):
    """Pin session_window's boundary semantics: an event exactly gap
    after the previous one still MERGES (inclusive boundary — same as
    the batch lag rule's strict-> split); one microsecond past the gap
    splits. session_end = last event + gap."""
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    eps = dt.timedelta(microseconds=1)
    df = spark.createDataFrame(
        [
            (1, base, 7, "a", 1.0, None),
            # exactly 30 min later: merges
            (2, base + dt.timedelta(minutes=30), 7, "a", 1.0, None),
            # 30 min + 1 us after event 2: splits
            (3, base + dt.timedelta(minutes=60) + eps, 7, "a", 1.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    spans = sessionize(df, 30).orderBy("session_start").collect()
    assert [r["n_events"] for r in spans] == [2, 1]
    assert spans[0]["session_end"] == base + dt.timedelta(minutes=60)
    assert spans[1]["session_start"] == base + dt.timedelta(minutes=60) + eps


def _mini_file(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(path, mode="overwrite")


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    """An event arriving AFTER its window was already closed and emitted
    is dropped (never re-emitted, never resurrects state) — and the
    batch run over the same files includes it: the documented
    stream/batch divergence. NB empirically pinned subtlety: the
    late-drop filter uses the watermark in effect at batch START (one
    batch behind eviction), so a late row landing in the SAME micro-batch
    that closes its window still counts; only arrival after the close is
    guaranteed-dropped — hence the window must close one batch earlier
    here."""
    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    src = tmp_path / "src"
    src.mkdir()
    _mini_file(spark, str(tmp_path / "f0"), [(1, t, 1, "a", 1.0, None),
                                             (2, t + dt.timedelta(minutes=5), 1, "a", 1.0, None)])
    # advances wm to 12:30 (in effect from the NEXT batch)
    _mini_file(spark, str(tmp_path / "f1"), [(3, t + dt.timedelta(hours=3), 1, "a", 1.0, None)])
    # batch 2: wm 12:30 closes + emits the 10:00 window (n=2)
    _mini_file(spark, str(tmp_path / "f2"), [(5, t + dt.timedelta(hours=3, minutes=5), 1, "a", 1.0, None)])
    # batch 3: late event for the closed 10:00 window -> dropped
    _mini_file(
        spark, str(tmp_path / "f3"),
        [(4, t + dt.timedelta(minutes=6), 1, "a", 1.0, None),
         (6, t + dt.timedelta(hours=3, minutes=10), 1, "a", 1.0, None)],
    )
    for i in range(4):
        part = sorted((tmp_path / f"f{i}").glob("part-*.parquet"))[0]
        dst = str(src / f"{i:03d}.parquet")
        shutil.copy(str(part), dst)
        _stamp_mtime(dst, i)

    stream = read_event_stream(spark, str(src), max_files_per_trigger=1)
    name = _qname("late")
    q = run_stream(hourly_counts(stream, WM), str(tmp_path / "ck"), name)
    rows = spark.table(name).collect()
    got = {r["hour"]: r["n"] for r in rows}
    # closed with only the 2 on-time events; emitted exactly once
    assert got[t.replace(minute=0)] == 2
    assert sum(1 for r in rows if r["hour"] == t.replace(minute=0)) == 1
    dropped = sum(
        (p["stateOperators"][0]["numRowsDroppedByWatermark"]
         if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    assert dropped == 1
    static = spark.read.parquet(str(src)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch = {r["hour"]: r["n"] for r in hourly_counts(static).collect()}
    assert batch[t.replace(minute=0)] == 3


def test_dedup_within_watermark(spark, tmp_path):
    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    src = tmp_path / "src"
    src.mkdir()
    _mini_file(spark, str(tmp_path / "f0"),
               [(1, t, 1, "a", 1.0, None), (2, t + dt.timedelta(minutes=1), 1, "a", 1.0, None)])
    # same event_id replayed in the next chunk, still inside the watermark
    _mini_file(spark, str(tmp_path / "f1"),
               [(1, t, 1, "a", 1.0, None), (3, t + dt.timedelta(minutes=2), 1, "a", 1.0, None)])
    for i in range(2):
        part = sorted((tmp_path / f"f{i}").glob("part-*.parquet"))[0]
        dst = str(src / f"{i:03d}.parquet")
        shutil.copy(str(part), dst)
        _stamp_mtime(dst, i)
    stream = read_event_stream(spark, str(src), max_files_per_trigger=1)
    name = _qname("dedup")
    run_stream(dedup_events(stream, WM), str(tmp_path / "ck"), name)
    rows = spark.table(name).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]
    # static fallback
    static = spark.read.parquet(str(src)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    assert dedup_events(static).count() == 3


def test_checkpoint_resume_emits_only_new_windows(
    spark, tmp_path, static_events, chunked_dir
):
    """Exactly-once across restarts (parquet file sink — the memory sink
    refuses checkpoint recovery): a second availableNow run over the same
    checkpoint plus one NEW chunk appends only windows the advanced
    watermark newly closed — nothing re-emitted, union == the batch
    result restricted to closed windows."""
    work = tmp_path / "src"
    work.mkdir()
    chunks = sorted(os.listdir(chunked_dir))
    for i, c in enumerate(chunks[:2]):
        shutil.copy(f"{chunked_dir}/{c}", str(work / c))
        _stamp_mtime(str(work / c), i)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def _read_out():
        return {
            (r["hour"], r["event_type"])
            for r in spark.read.parquet(out).collect()
        }

    stream = read_event_stream(spark, str(work), max_files_per_trigger=1)
    run_stream(hourly_counts(stream, WM), ck, _qname("r1"), path=out)
    first = _read_out()
    # new data arrives; resume from the same checkpoint
    shutil.copy(f"{chunked_dir}/{chunks[2]}", str(work / chunks[2]))
    _stamp_mtime(str(work / chunks[2]), 2)
    stream2 = read_event_stream(spark, str(work), max_files_per_trigger=1)
    run_stream(hourly_counts(stream2, WM), ck, _qname("r2"), path=out)
    both = _read_out()
    second = both - first
    assert first and second
    wm = _final_watermark(static_events)
    want = {
        (r["hour"], r["event_type"])
        for r in hourly_counts(static_events).collect()
        if r["hour"] + dt.timedelta(hours=1) <= wm
    }
    assert both == want
    assert len(both) == len(first) + len(second)
