"""Structured-Streaming pipeline operators — the late-data-aware streaming
twins of the batch analytics (event_hourly / sessionize) plus streaming
ingest dedup, all built from Spark's native stateful operators:

- windowed aggregation: ``window()`` groupBy + event-time watermark —
  append mode emits a window exactly once, when the watermark passes its
  end (late events inside the watermark still count; an event arriving
  after its window was closed+emitted is dropped — the drop filter runs
  against the watermark in effect at batch START, one batch behind
  eviction, so "same batch as the close" still counts: pinned
  empirically in the tests);
- sessionization: ``session_window()`` (gap-merged event-time sessions)
  — the native stateful operator instead of a sort-the-world window
  function; an event exactly gap after the previous one still MERGES
  (split only when the gap strictly exceeds the horizon — verified
  empirically and pinned by the boundary test), which is the SAME rule
  as the batch lag+cumsum gate (q_sessionize, > gap): the two agree on
  all data, including exact-gap ties (per-user cross-check + the
  session_spans oracle, which mirrors the strict-> rule);
- ingest dedup: ``dropDuplicatesWithinWatermark`` — exact-dedup state
  bounded by the watermark instead of growing forever (the only honest
  formulation of streaming dedup at 100 TB: global forever-dedup state is
  a batch join against the corpus, not stream state).

Scale shape: every operator keys state by (window/session x group key) or
the dedup key — state lives partitioned on the shuffle key across
executors, sized by the watermark horizon, not by stream history. No
Python state (applyInPandasWithState) anywhere: the built-in operators
cover these semantics entirely, JVM-side (the Spark-first rule).

The batch twins double as oracles: ``session_spans`` (same session_window
expression over a static frame) is hash-gated against a DuckDB lag+cumsum
twin, and the streaming tests replay chunked files with availableNow and
assert emitted rows == the batch result restricted to windows the final
watermark closed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet schema (ts is TIMESTAMP_NTZ in the testdata; cast to
# TIMESTAMP — session tz pinned UTC — before any event-time operation,
# CLAUDE.md: watermarks and epoch math need TimestampType)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream: each parquet file in *source_dir* is a
    replayable chunk; ``maxFilesPerTrigger=1`` makes one micro-batch per
    file so watermark progression is deterministic in tests."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def hourly_counts(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming twin of q_event_hourly: tumbling 1-hour counts/sums per
    event type. In append mode a row is emitted once, when the watermark
    passes its window end; works identically on a static frame (the
    batch oracle path — watermark is a no-op there)."""
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per user via the native session_window operator:
    events within *gap_minutes* of the session end merge — INCLUSIVE at
    the boundary (an event exactly gap after the previous one still joins;
    a session splits only when the gap strictly exceeds the horizon),
    matching the batch lag+cumsum rule in q_sessionize exactly. The span
    is [first event, last event + gap). Cross-checked per-user against
    the lag rule, pinned by an exact-gap boundary test, and hash-gated
    (session_spans) against a DuckDB twin of the strict-> semantics."""
    ev = events
    if ev.isStreaming:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def dedup_events(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact-dedup on event_id with state bounded by the
    watermark (dropDuplicatesWithinWatermark): a replayed/duplicated event
    inside the horizon is dropped; state for keys older than the watermark
    is evicted. On a static frame falls back to plain dropDuplicates."""
    if not events.isStreaming:
        return events.dropDuplicates(["event_id"])
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream(
    df: DataFrame,
    checkpoint_dir: str,
    queryName: str,
    output_mode: str = "append",
    path: str | None = None,
):
    """Drive a streaming frame with availableNow (process-everything-
    then-stop) and block until done. Default sink is in-memory (read
    back with ``spark.table(queryName)``) — fine for single-run tests
    but NOT recoverable across restarts. Pass *path* to use the
    exactly-once parquet file sink instead (append mode only): a second
    call with the same checkpoint RESUMES — only newly-arrived data is
    processed and only newly-closed windows are appended. That is the
    production shape; the memory sink refuses checkpoint recovery by
    design."""
    w = df.writeStream.queryName(queryName)
    if path is not None:
        w = w.format("parquet").option("path", path)
    else:
        w = w.format("memory")
    q = (
        w.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
