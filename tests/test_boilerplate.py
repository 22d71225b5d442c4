"""Boilerplate line removal (functions/boilerplate.py): df thresholds,
order preservation, blank-line immunity, all-boilerplate docs."""

from __future__ import annotations

import pytest

from letarette_spark.functions.boilerplate import (
    boilerplate_lines,
    line_stats,
    remove_boilerplate_lines,
)

FOOTER = "Copyright Example Corp"
DOCS = [
    (1, f"alpha unique line\n{FOOTER}\nmore alpha content"),
    (2, f"beta says hi\n\n{FOOTER}"),
    (3, f"{FOOTER}\ngamma closing thoughts\n{FOOTER}"),  # repeated in-doc
    (4, "delta stands alone"),
    (5, FOOTER),  # the whole doc is boilerplate
    (6, "  \nepsilon text\n  "),  # whitespace-only lines stay structural
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_line_stats_df_counts(df):
    stats = {r["line"]: r["df"] for r in line_stats(df).collect()}
    assert stats[FOOTER] == 4  # docs 1, 2, 3, 5 — in-doc repeat counts once
    assert stats["delta stands alone"] == 1
    assert "" not in stats and "  " not in stats  # blanks never counted


def test_boilerplate_threshold(df):
    assert {r["line"] for r in boilerplate_lines(df, min_df=2).collect()} == {FOOTER}
    assert boilerplate_lines(df, min_df=5).count() == 0
    with pytest.raises(ValueError):
        boilerplate_lines(df, min_df=1)


def test_removal_preserves_order_and_blanks(df):
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(df, 2).collect()}
    assert out[1] == "alpha unique line\nmore alpha content"
    assert out[2] == "beta says hi\n"          # blank line survives
    assert out[3] == "gamma closing thoughts"  # both repeats removed
    assert out[4] == "delta stands alone"      # untouched
    assert out[5] == ""                        # fully-boilerplate doc kept as ''
    assert out[6] == "  \nepsilon text\n  "    # whitespace lines untouched
    assert set(out) == {1, 2, 3, 4, 5, 6}      # no rows dropped
