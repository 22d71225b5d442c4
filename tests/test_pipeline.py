"""One-call training-data pipeline (functions/pipeline.py): stage
sequencing, keep rules, and reason precedence."""

from __future__ import annotations

import pytest

from letarette_spark.functions.pipeline import prepare_training_data

# 60 clean words ≈ passes every Gopher gate
_WORDS = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong coffee near the harbor and discuss ancient maps with "
    "great care because every journey across the valley needs water "
    "bread patience and a steady pair of boots plus one spare lantern "
    "for the long nights beneath the cold autumn sky above the hills"
)
_NEAR = _WORDS.replace("coffee", "tea").replace("lantern", "torch")
_BENCH_SNIPPET = "alpha beta gamma delta epsilon zeta eta theta"


_CONTAM = (
    "meanwhile the research station recorded unusual readings from the "
    "northern array as " + _BENCH_SNIPPET + " appeared verbatim inside "
    "the calibration transcript which the engineers copied directly "
    "from the published evaluation suite without checking provenance "
    "and the duty officer filed a detailed report about the incident "
    "before the morning shift arrived with fresh instruments and tea"
)
_CLEAN2 = (
    "salt merchants crossed the frozen river every winter carrying "
    "heavy sacks toward the market town where carpenters traded oak "
    "planks for wool and travelers exchanged stories about distant "
    "lighthouses storms and the patient work of mending nets while "
    "children counted wagons at the gate and the innkeeper measured "
    "grain into clay jars beside the warm stove during long evenings"
)


def _docs(spark):
    rows = [
        {"doc_id": 1, "text": _WORDS},     # kept
        {"doc_id": 2, "text": "too short"},  # quality
        {"doc_id": 3, "text": _WORDS},     # exact_dup of 1
        {"doc_id": 4, "text": _NEAR},      # near_dup of 1
        {"doc_id": 5, "text": _CONTAM},    # contaminated (independent text)
        {"doc_id": 6, "text": _CLEAN2},    # kept (independent text)
    ]
    return spark.createDataFrame(rows)


def _bench(spark):
    filler = ("completely different benchmark prose follows here with "
              "plenty of words so nothing else collides by accident")
    return spark.createDataFrame(
        [{"doc_id": 100, "text": f"{filler} {_BENCH_SNIPPET} {filler}"}]
    )


def _run(spark, threshold=0.2):
    out = prepare_training_data(_docs(spark), _bench(spark),
                                threshold=threshold).collect()
    return {r["doc_id"]: (r["kept"], r["reason"]) for r in out}


def test_each_stage_drops_and_keeps(spark):
    got = _run(spark)
    assert got[1] == (True, None)
    assert got[2] == (False, "quality")
    assert got[3] == (False, "exact_dup")       # min id 1 kept
    assert got[4] == (False, "near_dup")
    assert got[5] == (False, "contaminated")
    assert got[6] == (True, None)
    assert set(got) == {1, 2, 3, 4, 5, 6}


def test_reason_precedence_near_dup_before_contaminated(spark):
    """Doc 4 would also be clean of benchmark overlap, but a doc that is
    BOTH a near-dup and contaminated must report the earlier stage."""
    docs = _docs(spark)
    # make doc 4 also contaminated
    from pyspark.sql import functions as F

    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 4,
               F.concat(F.col("text"), F.lit(" " + _BENCH_SNIPPET)))
        .otherwise(F.col("text")),
    )
    out = prepare_training_data(docs, _bench(spark)).collect()
    got = {r["doc_id"]: (r["kept"], r["reason"]) for r in out}
    assert got[4] == (False, "near_dup")


def test_no_benchmark_skips_decontamination(spark):
    out = prepare_training_data(_docs(spark), None).collect()
    got = {r["doc_id"]: (r["kept"], r["reason"]) for r in out}
    assert got[5] == (True, None)               # nothing to contaminate
    assert got[2] == (False, "quality")


def test_every_input_id_accounted_once(spark):
    out = prepare_training_data(_docs(spark), _bench(spark)).collect()
    ids = [r["doc_id"] for r in out]
    assert sorted(ids) == [1, 2, 3, 4, 5, 6]
    for r in out:
        assert r["kept"] == (r["reason"] is None)


def test_url_and_seen_stages_run_first(spark):
    """Optional incremental-ingest stages: url_dup then already_seen
    precede every content stage, and their reasons win precedence."""
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "url",
        F.when(
            F.col("doc_id") == 3,
            # same canonical URL as doc 1 (tracker param + case differ)
            F.lit("HTTP://example.com/a?utm_source=x"),
        ).otherwise(
            F.concat(F.lit("http://example.com/"), F.col("doc_id").cast("string"))
        ),
    )
    docs = docs.withColumn(
        "url",
        F.when(F.col("doc_id") == 1, F.lit("http://EXAMPLE.com/a")).otherwise(
            F.col("url")
        ),
    )
    # seen corpus already contains doc 6's text
    seen = spark.createDataFrame([{"doc_id": 999, "text": _CLEAN2}])
    out = prepare_training_data(
        docs, _bench(spark), url_col="url", seen=seen
    ).collect()
    got = {r["doc_id"]: (r["kept"], r["reason"]) for r in out}
    # doc 3 is BOTH a url-dup (of 1) and an exact content dup — the
    # url stage runs first and wins
    assert got[3] == (False, "url_dup")
    assert got[6] == (False, "already_seen")
    assert got[1] == (True, None)
    assert got[2] == (False, "quality")
    assert sorted(got) == [1, 2, 3, 4, 5, 6]


def test_seen_stage_without_url(spark):
    seen = spark.createDataFrame([{"doc_id": 999, "text": _WORDS}])
    out = prepare_training_data(_docs(spark), None, seen=seen).collect()
    got = {r["doc_id"]: (r["kept"], r["reason"]) for r in out}
    # docs 1 and 3 share _WORDS with the seen corpus: both drop as seen
    # (the already_seen stage precedes exact dedup)
    assert got[1] == (False, "already_seen")
    assert got[3] == (False, "already_seen")
    assert got[6] == (True, None)
