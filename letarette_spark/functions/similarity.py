"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the approximate scale path. All vector math is JVM-side
(zip_with/aggregate inside whole-stage codegen) in float64.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine_expr(a: str, b: str) -> Column:
    """cosine(a, b) for two array<double> columns, computed as
    dot / (||a|| * ||b||) in float64 (matches DuckDB list_cosine_similarity
    on double inputs)."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(F.col(a), F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(F.col(b), F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of one vector: broadcast the query row against
    the corpus — a single scan, no shuffle except the final top-k sort."""
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    )
    return (
        emb.filter(F.col(id_col) != query_id)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine_expr("v", "qv").alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_per_query(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k for a *batch* of query vectors: broadcast the (small)
    query set, window top-k per query. Scale: corpus-scan-bound; use the
    LSH variant when the query batch or corpus makes N*Q infeasible."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .crossJoin(F.broadcast(q))
        .select(query_id_col, id_col, cosine_expr("v", "qv").alias("cos"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _infer_dim(emb: DataFrame, vec_col: str) -> int | None:
    """Vector dimension from the first NON-NULL vector (one bounded job
    at plan-build time — pass dim explicitly in pipelines to stay fully
    lazy); None only when the frame has no usable vectors at all (a
    stray NULL row must not silently zero out the whole result)."""
    row = emb.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    return len(row[0]) if row is not None else None


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(dot(v, plane_i)); returns
    a long bucket id. Deterministic (seeded planes are baked into the plan
    as literals) and cheap: n_planes dot products per row, JVM-side."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(c)) for c in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
    return bucket


def banded_lsh_buckets(
    emb: DataFrame,
    bands: int = 2,
    planes_per_band: int = 4,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) — one hyperplane-LSH bucket per band, each band
    seeded independently (seed + band). Banding trades one low-recall
    signature for an OR over *bands* signatures (minhash-banding style):
    two vectors are neighbor candidates when they collide in ANY band."""
    if dim is None:
        dim = _infer_dim(emb, vec_col)
        if dim is None:  # empty frame: no buckets
            return emb.select(
                F.col(id_col),
                F.lit(0).alias("band"),
                F.lit(0).cast("long").alias("bucket"),
            ).limit(0)
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    per_band = [
        F.struct(
            F.lit(bnd).alias("band"),
            lsh_bucket_expr("v", _hyperplanes(dim, planes_per_band, seed + bnd)).alias(
                "bucket"
            ),
        )
        for bnd in range(bands)
    ]
    return v.select(
        F.col(id_col), F.explode(F.array(*per_band)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_cosine_candidates(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) hyperplane-LSH bucketing. Neighbor candidates = bucket
    collisions; join per bucket instead of the full cross product —
    the 100TB path (expected bucket size n/2^planes)."""
    if dim is None:
        dim = _infer_dim(emb, vec_col)
        if dim is None:  # empty frame: no buckets
            return emb.select(
                F.col(id_col), F.lit(0).cast("long").alias("bucket")
            ).limit(0)
    planes = _hyperplanes(dim, n_planes, seed)
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    return v.select(F.col(id_col), lsh_bucket_expr("v", planes).alias("bucket"))


def lsh_cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing the query's LSH bucket.
    Recall is tunable via n_planes (fewer planes = bigger buckets)."""
    buckets = lsh_cosine_candidates(emb, n_planes, None, seed, id_col, vec_col)
    qb = buckets.filter(F.col(id_col) == query_id).select(
        F.col("bucket").alias("qbucket")
    )
    cand_ids = (
        buckets.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != query_id))
        .select(id_col)
    )
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    )
    return (
        emb.join(cand_ids, id_col)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine_expr("v", "qv").alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
