"""Cross-document boilerplate line removal (CCNet-style paragraph dedup).

Web and source corpora repeat the same lines across thousands of
documents — license headers, nav footers, "All rights reserved", code
generators' banners. The standard hygiene pass removes every line whose
DOCUMENT FREQUENCY (number of distinct docs containing it) reaches a
threshold, keeping each document's remaining lines in their original
order.

Scale shape: one posexplode (linear in corpus lines), one partial-agg
``groupBy(line)`` for the df counts, one shuffle join back on ``line``,
and one ``groupBy(doc_id)`` to reassemble — every key is either the line
text (high cardinality, well spread) or the doc id. Nothing quadratic;
no Python. Empty/whitespace-only lines are structural, not boilerplate:
they are never counted and never removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line) — one row per line, original position preserved."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def line_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(line, df) document frequency per distinct non-blank line."""
    return (
        _lines(df, id_col, text_col)
        .filter(F.trim("line") != "")
        .select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("df"))
    )


def boilerplate_lines(
    df: DataFrame, min_df: int = 2, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(line, df) — the lines appearing in at least *min_df* documents."""
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    return line_stats(df, id_col, text_col).filter(F.col("df") >= min_df)


def remove_boilerplate_lines(
    df: DataFrame, min_df: int = 2, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) with boilerplate lines removed, remaining lines joined
    by '\\n' in their original order. Documents whose every line was
    boilerplate come back as '' (the row is never dropped — callers
    filter on length if they want them gone)."""
    bp = boilerplate_lines(df, min_df, id_col, text_col).select("line")
    kept = (
        _lines(df, id_col, text_col)
        .join(bp, "line", "left_anti")
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
            ).alias("__clean")
        )
    )
    return (
        df.select(id_col)
        .join(kept, id_col, "left")
        .select(
            id_col, F.coalesce("__clean", F.lit("")).alias(text_col)
        )
    )
