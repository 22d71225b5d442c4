"""Incremental index maintenance: upserts, deletes, segment compaction.

Spark-first replacement for the reference's interest-list sync loop
(internal/letarette/indexer.go:197-295 + db_index.go:42-120: documents
arrive as (id, updated, title, text, alive) updates; the docs table is
REPLACE'd and SQLite triggers delete the old FTS tokens and insert the
new). Here each upsert batch becomes an LSM-style *delta segment*:

  seg/N/postings    posting rows for the batch's alive docs
  seg/N/docs        the batch's doc rows (including tombstoned ones)
  seg/N/tombstones  rowids whose older rows (seq < N) are now dead

Queries read base + segments minus tombstones (Index._overlay). Global
statistics (ndocs, sum_dl) and term_stats are recomputed at commit so BM25
stays exact after every batch — the same property the reference gets from
FTS5 maintaining its own stats. ``compact_index`` merges everything back
into a fresh base (the analog of the reference's FTS5 'merge'/'optimize'
maintenance, indextools.go:200-264), bounding read amplification.

Exactly-once: each upsert records an optional ``batch_id``; re-delivering
the same batch id is a no-op — this is what makes the Structured-Streaming
wrapper (letarette_spark.streaming.indexer) idempotent under retries,
mirroring the reference's single-transaction doc+interest commit
(db_index.go:56-120).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from letarette_spark.index.builder import (
    DEFAULT_BUCKETS,
    Index,
    bucket_expr,
    tokenize_postings,
)
from letarette_spark.index.manifest import Manifest


def _refresh_stats(index: Index, man: Manifest, extra_meta: dict) -> None:
    """Recompute term_stats + global BM25 stats from the overlaid view and
    commit a new snapshot. Any existing WAND blocks table reflects the old
    snapshot and is invalidated (rebuild with blocks.build_blocks after a
    batch of upserts / a compaction)."""
    spark = index.spark
    index.invalidate()  # storage changed under any cached handles
    blocks_dir = os.path.join(index.root, "blocks")
    if os.path.exists(blocks_dir):
        shutil.rmtree(blocks_dir)
    extra_meta = dict(extra_meta, blocks=None)
    postings = index.postings()
    ts_tmp = os.path.join(index.root, "term_stats.tmp")
    ts_dir = os.path.join(index.root, "term_stats")
    (
        postings.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(F.col("tf0") + F.col("tf1")).alias("cnt"),
        )
        .repartitionByRange(max(2, spark.sparkContext.defaultParallelism // 2), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(ts_tmp)
    )
    if os.path.exists(ts_dir):
        shutil.rmtree(ts_dir)
    os.replace(ts_tmp, ts_dir)

    agg = postings.agg(
        F.coalesce(F.sum(F.col("tf0") + F.col("tf1")), F.lit(0)).alias("sum_dl")
    ).collect()[0]
    ndocs = index.docs().filter(F.col("alive")).count()
    nterms = spark.read.parquet(ts_dir).count()

    meta = dict(index.meta)
    meta.update(extra_meta)
    meta.update({"ndocs": ndocs, "sum_dl": int(agg["sum_dl"]), "nterms": nterms})
    meta.pop("snapshot_id", None)
    man.commit_snapshot(meta)  # man.state carries the previous snapshot_id
    index.meta = man.state


def upsert_documents(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    batch_id: int | None = None,
) -> Index:
    """Apply a batch of document updates (insert / replace / tombstone).

    ``docs`` columns: (doc_id, space, title, body, alive); rows with
    alive=false delete the document (reference keeps the doc row but
    removes it from the FTS index — same observable behavior here)."""
    index = Index.open(spark, root)
    man = Manifest.load(root)
    if batch_id is not None and batch_id in index.meta.get("applied_batches", []):
        return index  # exactly-once replay guard

    if "rowid" not in docs.columns:
        docs = docs.withColumn("rowid", F.xxhash64("doc_id"))
    seq = max((s["seq"] for s in index.segments), default=0) + 1
    seg_rel = {
        "seq": seq,
        "postings": f"seg/{seq}/postings",
        "docs": f"seg/{seq}/docs",
        "tombstones": f"seg/{seq}/tombstones",
    }

    keep = ["rowid", "doc_id", "space", "title", "body", "alive"]
    if "content_sha256" in docs.columns:
        keep.append("content_sha256")
    docs.select(*keep).write.mode("overwrite").parquet(
        os.path.join(root, seg_rel["docs"])
    )
    docs.select("rowid").distinct().write.mode("overwrite").parquet(
        os.path.join(root, seg_rel["tombstones"])
    )
    cfg = index.analyzer_config
    par = spark.sparkContext.defaultParallelism
    seg_post = tokenize_postings(
        docs.filter(F.col("alive")).repartition(par), cfg
    )
    if index.n_buckets:
        # keep the segment layout union-compatible with the bucketed base
        (
            seg_post.withColumn("bucket", bucket_expr(index.n_buckets))
            .repartition(max(2, par // 2), "bucket")
            .sortWithinPartitions("bucket", "term", "rowid")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(root, seg_rel["postings"]))
        )
    else:  # pre-bucket index layouts
        (
            seg_post.repartition(max(2, par // 2), "term")
            .sortWithinPartitions("term", "rowid")
            .write.mode("overwrite")
            .parquet(os.path.join(root, seg_rel["postings"]))
        )

    extra = {
        "segments": index.segments + [seg_rel],
        "applied_batches": (index.meta.get("applied_batches", []) + (
            [batch_id] if batch_id is not None else []
        ))[-1000:],
    }
    index.meta = dict(index.meta, segments=extra["segments"])  # overlay sees new seg
    index.invalidate()
    _refresh_stats(index, man, extra)
    return index


def compact_index(spark: SparkSession, root: str) -> Index:
    """Merge base + segments into a fresh base and drop tombstones —
    segment compaction (reference analog: stepwise FTS5 'merge',
    indextools.go:200-264). Query results are unchanged; read
    amplification returns to one sorted run."""
    index = Index.open(spark, root)
    man = Manifest.load(root)
    if not index.segments:
        return index
    par = spark.sparkContext.defaultParallelism

    post_new = os.path.join(root, "postings.compact")
    docs_new = os.path.join(root, "docs.compact")
    post = index.postings()
    if "bucket" not in post.columns:
        post = post.withColumn(
            "bucket", bucket_expr(index.n_buckets or DEFAULT_BUCKETS)
        )
    (
        post.repartition(max(2, par // 2), "bucket")
        .sortWithinPartitions("bucket", "term", "rowid")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(os.path.join(post_new, "chunk=0"))
    )
    index.docs().write.mode("overwrite").parquet(os.path.join(docs_new, "chunk=0"))

    post_dir = os.path.join(root, "postings")
    docs_dir = os.path.join(root, "docs")
    shutil.rmtree(post_dir)
    os.replace(post_new, post_dir)
    shutil.rmtree(docs_dir)
    os.replace(docs_new, docs_dir)
    shutil.rmtree(os.path.join(root, "seg"), ignore_errors=True)
    index.invalidate()

    index.meta = dict(index.meta, segments=[])
    _refresh_stats(
        index,
        man,
        {"segments": [], "postings_buckets": index.n_buckets or DEFAULT_BUCKETS},
    )
    return index
