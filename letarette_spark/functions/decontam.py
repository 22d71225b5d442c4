"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation benchmark.

The standard training-data hygiene pass (GPT-3 appendix C / PaLM /
Llama-style): a training document is *contaminated* when it shares at
least one n-token shingle (defaults to 8, the common choice for dirty-doc
filtering) with any benchmark document. Built entirely from JVM array
intrinsics on top of ``dedup.shingles`` — no UDF, no Python in the path.

Scale shape (100 TB corpus, thousands-of-rows benchmark): the benchmark
shingle set is tiny, so it BROADCASTS; the corpus side is one linear
projection (token array → distinct shingles per doc) + a broadcast
semi/inner join — zero corpus-wide shuffle to find hits, then a single
``groupBy(doc_id)`` over the (sparse) hit rows. Nothing here is quadratic
in corpus size, and a benchmark too large to broadcast degrades to a
plain shuffle join on ``shingle`` (AQE handles the switch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.dedup import shingles
from letarette_spark.functions.simple_text import token_array


def _bench_shingles(
    benchmark: DataFrame, n: int, id_col: str, text_col: str,
    broadcast_benchmark: bool,
) -> DataFrame:
    sh = shingles(benchmark, n, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("bench_id"), "shingle"
    )
    return F.broadcast(sh) if broadcast_benchmark else sh


def contaminated_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, n_shared) — every (training doc, benchmark doc)
    pair sharing at least one n-gram, with the count of DISTINCT shared
    shingles. Shingle sets are per-document distinct on both sides."""
    bsh = _bench_shingles(
        benchmark, n, bench_id_col or id_col, bench_text_col or text_col,
        broadcast_benchmark,
    )
    dsh = shingles(docs, n, id_col=id_col, text_col=text_col)
    return (
        dsh.join(bsh, "shingle")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, n_total, n_matched, contaminated) per training document.

    n_total  = distinct n-gram shingles in the document (0 for short docs);
    n_matched = how many of those occur anywhere in the benchmark;
    contaminated = n_matched > 0. Callers wanting a fraction threshold
    filter on n_matched / n_total themselves."""
    bsh = _bench_shingles(
        benchmark, n, bench_id_col or id_col, bench_text_col or text_col,
        broadcast_benchmark,
    ).select("shingle").distinct()
    dsh = shingles(docs, n, id_col=id_col, text_col=text_col)
    matched = (
        dsh.join(bsh, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    # n_total as a scalar projection — the per-doc shingle array never
    # explodes a second time
    arr = token_array(text_col)
    idx = F.when(
        F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    totals = docs.select(
        F.col(id_col),
        F.size(F.array_distinct(sh)).cast("long").alias("n_total"),
    )
    return (
        totals.join(matched, id_col, "left")
        .select(
            id_col,
            "n_total",
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            (F.coalesce("n_matched", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """The corpus with every contaminated document removed (anti-join on
    the benchmark shingle hits) — same columns as *docs*."""
    bsh = _bench_shingles(
        benchmark, n, kw.get("bench_id_col") or id_col,
        kw.get("bench_text_col") or text_col,
        kw.get("broadcast_benchmark", True),
    ).select("shingle").distinct()
    dirty = (
        shingles(docs, n, id_col=id_col, text_col=text_col)
        .join(bsh, "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(dirty, id_col, "left_anti")
