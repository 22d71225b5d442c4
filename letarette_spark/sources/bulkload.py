"""Bulk document loading from JSON streams.

Reference: ``lrcli load`` (cmd/lrcli/bulkload.go:49-154) streams JSON
entries ``{id, title, text, date}`` (optionally gzipped), auto-assigns
missing ids, applies a shard filter, and loads in one transaction. Spark
version: ``spark.read.json`` (gzip handled transparently by the codec
layer), deterministic id assignment, the same FNV shard filter, and the
atomic chunk-commit build path as the "transaction".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from letarette_spark.functions.sharding import shard_expr

BULK_SCHEMA = "id string, title string, text string, date timestamp"


def load_json_docs(
    spark: SparkSession,
    path: str,
    space: str = "docs",
    auto_assign_ids: bool = False,
    limit: int | None = None,
    shard: tuple[int, int] | None = None,  # (index, group_size)
) -> DataFrame:
    """JSON doc stream -> engine docs shape (doc_id, space, title, body,
    alive, rowid)."""
    raw = spark.read.schema(BULK_SCHEMA).json(path)
    if limit:
        raw = raw.limit(limit)
    if auto_assign_ids:
        # deterministic assignment (reference assigns sequence numbers;
        # a content hash is the distribution-stable equivalent)
        raw = raw.withColumn(
            "id",
            F.coalesce(
                F.col("id"),
                F.sha2(F.concat_ws("\x00", F.col("title"), F.col("text")), 256),
            ),
        )
    docs = raw.select(
        F.col("id").alias("doc_id"),
        F.lit(space).alias("space"),
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("text"), F.lit("")).alias("body"),
        F.lit(True).alias("alive"),
    ).withColumn("rowid", F.xxhash64("doc_id"))
    if shard is not None:
        idx, group = shard
        docs = docs.filter(shard_expr("doc_id", group) == idx)
    return docs
