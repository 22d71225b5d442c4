"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540): cluster the embedding space, compare pairs only WITHIN
a cluster, and drop all but one member of each semantic-duplicate pair.

Spark-first shape:
  1. cell assignment reuses the IVF machinery (similarity.ivf_centroids /
     _ivf_cell_expr) — centroids are a tiny nested literal baked into the
     plan, so assignment is one scan, zero shuffle, whole-stage codegen;
  2. within-cell pairs are an equi-join on ``cell`` (never a cross join) —
     the shuffle key is the cell id, and the quadratic blow-up is bounded
     per cell (the paper's own trick: more clusters => smaller cells; at
     100 TB you raise n_cells with corpus size so the expected cell stays
     ~constant and the join stays linear-ish);
  3. the keep rule is the paper's: within a duplicate pair, KEEP the
     example with LOWER cosine similarity to its cluster centroid (the
     more "peripheral" one preserves diversity), ties broken to the lower
     id. Deterministic, so an exact ANSI-SQL twin exists (driver gate
     ``semdedup_pairs`` / ``semdedup_kept``).

Reference relation: the letarette reference deduplicates documents by
identity only (docid upsert, internal/letarette/db.go); SemDeDup is one of
the beyond-reference training-data operators this engine adds, alongside
functions/dedup.py (MinHash/SimHash surface-form dedup) — SemDeDup catches
paraphrases those miss because it works in embedding space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.similarity import (
    _centroids_lit,
    _cosine_cols,
    _ivf_cell_expr,
    cosine_expr,
    ivf_centroids,
)


def _assigned(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, v, cell, ccos) — cell assignment plus cosine-to-own-centroid,
    both from the same centroid literal: one scan, no shuffle."""
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), v.alias("v")).filter(
        F.col("v").isNotNull()
    )
    cell = _ivf_cell_expr("v", centroids)
    return base.select(
        "id",
        "v",
        cell.alias("cell"),
    ).select(
        "id",
        "v",
        "cell",
        _cosine_cols(
            F.col("v"), F.element_at(_centroids_lit(centroids), F.col("cell") + 1)
        ).alias("ccos"),
    )


def semdedup_pairs(
    emb: DataFrame,
    centroids: list[list[float]] | None = None,
    n_cells: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cell, cos) — semantic-duplicate candidate pairs: same
    cluster cell, cosine(a, b) >= threshold, a < b.

    Scale: the join key is ``cell`` — candidates are generated per cell,
    so work is sum over cells of |cell|^2, not |corpus|^2; n_cells is the
    knob that bounds it (the SemDeDup paper uses 50k clusters at LAION
    scale). No crossJoin in the plan."""
    if centroids is None:
        centroids = ivf_centroids(
            emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        )
    assigned = _assigned(emb, centroids, id_col, vec_col)
    a = assigned.select(
        F.col("id").alias("a"), F.col("v").alias("va"), "cell"
    )
    b = assigned.select(
        F.col("id").alias("b"), F.col("v").alias("vb"), "cell"
    )
    return (
        a.join(b, "cell")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "cell", cosine_expr("va", "vb").alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def semdedup_kept(
    emb: DataFrame,
    centroids: list[list[float]] | None = None,
    n_cells: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id) — the ids SemDeDup keeps.

    Paper keep rule (arXiv:2303.09540 §3): within each duplicate pair keep
    the example LESS similar to its cluster centroid; ties to the lower
    id. Equivalently: drop x iff some same-cell y with cos(x, y) >=
    threshold ranks before x under (ccos ASC, id ASC). One within-cell
    join to find losers, one left_anti to subtract them — both keyed,
    no cross join."""
    if centroids is None:
        centroids = ivf_centroids(
            emb, n_cells=n_cells, id_col=id_col, vec_col=vec_col
        )
    assigned = _assigned(emb, centroids, id_col, vec_col).persist()
    try:
        a = assigned.select(
            F.col("id").alias("xa"), F.col("v").alias("va"),
            "cell", F.col("ccos").alias("ca"),
        )
        b = assigned.select(
            F.col("id").alias("xb"), F.col("v").alias("vb"),
            "cell", F.col("ccos").alias("cb"),
        )
        dup = (
            a.join(b, "cell")
            .filter(F.col("xa") != F.col("xb"))
            .filter(cosine_expr("va", "vb") >= F.lit(threshold))
        )
        # x=xa loses to y=xb when y ranks before x under (ccos ASC, id ASC)
        losers = dup.filter(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("xb") < F.col("xa")))
        ).select(F.col("xa").alias("id")).distinct()
        kept = (
            assigned.select("id")
            .join(losers, "id", "left_anti")
            .select(F.col("id").alias(id_col))
        )
        return kept.localCheckpoint()
    finally:
        assigned.unpersist()
