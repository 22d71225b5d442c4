"""Deterministic, partition-independent sampling for training-data
pipelines.

``df.sample()`` is seed×partitioning dependent — the same seed yields a
different subset after a repartition, which breaks resumable pipelines
and cross-run comparisons. These operators derive a uniform [0, 1) value
from md5(seed, key) per ROW KEY instead, so the subset is a pure function
of (seed, key): stable across partitionings, cluster sizes, and reruns,
and expressible in any SQL engine (the DuckDB twins).

Scale shape:
* ``hash_sample`` / ``stratified_sample`` — a pure column-expression
  filter: zero shuffle, pushes into the scan's surviving-row pipeline.
* ``quota_sample`` — exactly-k-per-stratum needs a per-stratum order: one
  shuffle on the stratum key + a row_number window. For huge strata pass
  ``prefilter`` (an over-sampling fraction ≥ quota/stratum_size): rows
  are hash-filtered BEFORE the window, shrinking the sort input while
  returning the identical subset (the k smallest hashes all survive any
  prefilter that keeps ≥ k rows — if a stratum keeps fewer, you chose the
  fraction too low and the result is short for that stratum).
* ``take_deterministic`` — global smallest-k by hash via orderBy+limit
  (Spark's distributed TakeOrdered heap, no single-reducer sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TWO32 = float(1 << 32)


def unit_hash(key_col: Column | str = "doc_id", seed: int = 42) -> Column:
    """Uniform double in [0, 1) derived from md5('<seed>:<key>') — the
    first 8 hex chars as an integer over 2^32. Exactly reproducible in
    SQL: ('0x' || substr(md5(...), 1, 8))::BIGINT / 4294967296.0."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_TWO32)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows with unit_hash < fraction.
    Pure filter — zero shuffle; same subset at any partitioning."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(unit_hash(key_col, seed) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli fractions (e.g. language quotas as rates):
    still a pure zero-shuffle filter — the per-stratum threshold is a
    CASE expression, not a join."""
    thr = F.lit(float(default))
    for k, v in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(thr)
    return df.filter(unit_hash(key_col, seed) < thr)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    key_col: str = "doc_id",
    seed: int = 42,
    prefilter: float | None = None,
) -> DataFrame:
    """EXACTLY min(quota, |stratum|) rows per stratum: the quota smallest
    unit_hash values, ties broken by key. Deterministic and partition-
    independent. ``prefilter`` hash-filters before the window (see module
    docstring) to bound the per-stratum sort at scale."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    h = unit_hash(key_col, seed)
    src = df.filter(h < prefilter) if prefilter is not None else df
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), F.col(key_col).cast("string").asc()
    )
    return (
        src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    target_rows: int,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-mixed sample: per-stratum quotas proportional to
    count^alpha (the multilingual data-mixing rule — alpha=1 keeps the
    natural distribution, alpha→0 flattens toward uniform), totalling at
    most *target_rows*. Quotas are exact: quota_s = min(floor(target ·
    count_s^alpha / Σ count^alpha), count_s); rows are the quota smallest
    unit hashes per stratum — deterministic and partition-independent.

    NOTE for cross-engine twins: alpha=0.5 (sqrt) is IEEE-correctly
    rounded everywhere; other alphas go through pow(), which may differ
    by an ulp between libms and flip a floor() at a boundary.

    Plan: two tiny aggregates over the stratum key (broadcast back) + one
    per-stratum window — the same single shuffle quota_sample pays."""
    if target_rows < 1:
        raise ValueError(f"target_rows must be >= 1, got {target_rows}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    wa = counts.withColumn("__wa", F.pow("__n", float(alpha)))
    tot = wa.agg(F.sum("__wa").alias("__tw"))
    quotas = (
        wa.crossJoin(F.broadcast(tot))
        .select(
            strata_col,
            F.least(
                F.floor(F.lit(float(target_rows)) * F.col("__wa") / F.col("__tw")),
                F.col("__n"),
            ).cast("long").alias("__quota"),
        )
    )
    w = Window.partitionBy(strata_col).orderBy(
        unit_hash(key_col, seed).asc(), F.col(key_col).cast("string").asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(quotas), strata_col)
        .filter(F.col("__rn") <= F.col("__quota"))
        .drop("__rn", "__quota")
    )


def split_by_cluster(
    df: DataFrame,
    pairs: DataFrame,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    seed: int = 42,
) -> DataFrame:
    """Leakage-safe train/test split: near-duplicate CLUSTERS (connected
    components of *pairs*) land in one split atomically, so a document
    can never have a near-twin on the other side of the split — the
    failure mode a plain row-level split has on any deduplicatable
    corpus. Docs outside the pair graph are their own singleton cluster.

    Returns (id, component, split) with split ∈ {'train', 'test'}; the
    decision is unit_hash(component) < test_fraction — deterministic,
    partition-independent, and stable under adding unrelated documents.

    Plan: the component propagation is dedup.connected_components
    (O(log diameter) rounds over the pair graph ONLY — tiny next to the
    corpus); the corpus-side cost is one left join against that small
    frame + a pure hash filter."""
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(
            f"test_fraction must be in [0, 1], got {test_fraction}"
        )
    from letarette_spark.functions.dedup import connected_components

    comp = connected_components(pairs, a_col, b_col).withColumnRenamed(
        "id", "__cid"
    )
    comp_col = F.coalesce(F.col("component"), F.col(id_col)).alias("component")
    out = (
        df.select(id_col)
        .join(comp, F.col(id_col) == F.col("__cid"), "left")
        .select(id_col, comp_col)
    )
    return out.select(
        id_col,
        "component",
        F.when(unit_hash(F.col("component"), seed) < test_fraction, "test")
        .otherwise("train")
        .alias("split"),
    )


def take_deterministic(
    df: DataFrame, k: int, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """The k globally smallest unit_hash rows (ties by key): a stable
    'random' head at any scale — orderBy+limit compiles to a distributed
    top-k heap, never a global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return df.orderBy(
        unit_hash(key_col, seed).asc(), F.col(key_col).cast("string").asc()
    ).limit(k)


def assign_shards(
    df: DataFrame, n_shards: int, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic global shuffle for training output: adds ``shard``
    (long in [0, n_shards)) and ``sort_key`` (the full md5 hex digest of
    '<seed>:<key>'; within-shard order = digest asc, ties by key).
    shard = first-8-hex-digits-as-int % n_shards — pure integer math, so
    the assignment is exact in any SQL engine (no float-boundary flips).

    Pure projection: ZERO shuffle here; every row gets the SAME
    (shard, position) at any partitioning, cluster size, or rerun —
    ``df.orderBy(rand())``-style shuffles are none of those. This is the
    last pipeline stage before training: a global pseudo-random order,
    materialized as n_shards independent streams."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = F.col(key_col)
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(n_shards)
    ).alias("shard")
    return df.select("*", shard, h.alias("sort_key"))


def shard_positions(
    df: DataFrame, n_shards: int, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """(key, shard, pos): the manifest of the deterministic shuffle —
    ``pos`` is the row's 1-based position within its shard file as
    write_training_shards lays it out. One shuffle (the per-shard
    window); shards are uniform by construction, so the window never
    sees a skewed partition."""
    w = Window.partitionBy("shard").orderBy(
        F.col("sort_key").asc(), F.col(key_col).cast("string").asc()
    )
    return (
        assign_shards(df, n_shards, key_col, seed)
        .select(key_col, "shard", F.row_number().over(w).cast("long").alias("pos"))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    seed: int = 42,
    fmt: str = "parquet",
) -> None:
    """Materialize the deterministic shuffle as exactly n_shards ordered
    files under ``path/shard=i/`` — the conventional final write of a
    training-data pipeline (fixed shard count, global pseudo-random
    order, bit-identical across reruns and cluster sizes).

    Plan: ONE hash shuffle (repartition on the shard id co-locates each
    whole shard in one task) + a within-partition sort; partitionBy then
    writes one file per shard directory because no shard spans tasks.
    Shard sizes are uniform (md5), so tasks are balanced at any scale."""
    out = (
        assign_shards(df, n_shards, key_col, seed)
        .repartition(n_shards, "shard")
        .sortWithinPartitions(
            "shard", F.col("sort_key").asc(), F.col(key_col).cast("string").asc()
        )
        .drop("sort_key")
    )
    out.write.partitionBy("shard").format(fmt).mode("overwrite").save(path)
