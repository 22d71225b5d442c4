"""Incremental index maintenance: upserts, deletes, segment compaction.

Spark-first replacement for the reference's interest-list sync loop
(internal/letarette/indexer.go:197-295 + db_index.go:42-120: documents
arrive as (id, updated, title, text, alive) updates; the docs table is
REPLACE'd and SQLite triggers delete the old FTS tokens and insert the
new). Here each upsert batch becomes an LSM-style *delta segment*:

  seg/N/postings    posting rows for the batch's alive docs
  seg/N/docs        the batch's doc rows (including tombstoned ones)
  seg/N/tombstones  rowids whose older rows (seq < N) are now dead

Queries read base + segments minus tombstones (Index._overlay).

Statistics are maintained *additively*: term df/cnt and the global
(ndocs, sum_dl) are linear in documents, so an upsert of K docs merges
the delta segment's stats into the base term_stats and subtracts the
replaced versions' stats — the old versions are fetched with a
rowid-bucket-pruned point lookup (Index.docs_for_rowids) and re-tokenized.
NO scan of the base postings table happens on the upsert path; the full
recompute runs only at compaction (or for huge batches where collecting
the key set to the driver would be silly). BM25 stays exact after every
batch — the same property the reference gets from FTS5 maintaining its
own stats — and the upsert rank-identity tests pin it.

Commits are crash-atomic: new term_stats (and at compaction new postings/
docs) are staged under snapshot-versioned directories, the manifest
pointer flips last (_manifest/CURRENT.json, POSIX-atomic), and stale
directories are garbage-collected only after the commit. A kill at any
point leaves the previously committed snapshot fully readable.

Exactly-once: each upsert records an optional ``batch_id``; re-delivering
the same batch id is a no-op — this is what makes the Structured-Streaming
wrapper (letarette_spark.streaming.indexer) idempotent under retries,
mirroring the reference's single-transaction doc+interest commit
(db_index.go:56-120).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from letarette_spark.index.builder import (
    DEFAULT_BUCKETS,
    DEFAULT_DOC_BUCKETS,
    POSTINGS_SCHEMA,
    Index,
    bucket_expr,
    tokenize_postings,
)
from letarette_spark.index.manifest import Manifest

# above this batch size the merge path (which collects the batch's rowid
# set to the driver for bucket pruning) falls back to a full recompute —
# at that scale the recompute cost is amortized anyway
MERGE_MAX_BATCH = 100_000

_VERSIONED = re.compile(r"^(postings|docs|term_stats|prefix)(\.v\d+|\.tmp|\.compact)?$")


def _gc_stale_dirs(root: str, keep_rel: set[str]) -> None:
    """Remove versioned data dirs not referenced by the committed snapshot
    OR by any retained time-travel snapshot (snapshot_retention > 1 keeps
    older states readable, the Iceberg expire-snapshots model). Runs
    strictly AFTER commit — a crash before GC leaves harmless orphans that
    the next commit's GC collects."""
    ret_dirs, _ = Manifest.retained_refs(root)
    keep = set(keep_rel) | ret_dirs
    for name in os.listdir(root):
        if name in keep:
            continue
        if _VERSIONED.match(name):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)


def _gc_seg_dirs(root: str, keep_seqs: set[int]) -> None:
    """Remove delta-segment dirs (seg/<seq>) whose seq no retained snapshot
    references. Compaction empties the current snapshot's segment list, but
    a retained older snapshot may still overlay them."""
    _, ret_seqs = Manifest.retained_refs(root)
    keep = {int(s) for s in keep_seqs} | ret_seqs
    seg_root = os.path.join(root, "seg")
    if not os.path.isdir(seg_root):
        return
    removed_all = True
    for name in os.listdir(seg_root):
        try:
            seq = int(name)
        except ValueError:
            seq = None
        if seq is not None and seq in keep:
            removed_all = False
            continue
        shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
    if removed_all:
        shutil.rmtree(seg_root, ignore_errors=True)


def expire_snapshots(root: str, keep_last: int = 1) -> list[int]:
    """Expire old time-travel snapshots and collect the data dirs only they
    referenced (Iceberg ``expire_snapshots`` analog). Returns the snapshot
    ids that remain readable."""
    man = Manifest.load(root)
    man.prune_snapshot_files(keep_last)
    cur = man.state
    _gc_stale_dirs(
        root,
        keep_rel={
            cur.get("postings_dir", "postings"),
            cur.get("docs_dir", "docs"),
            cur.get("prefix_dir", "prefix"),
            cur.get("term_stats_dir", "term_stats"),
        },
    )
    _gc_seg_dirs(root, keep_seqs={int(s["seq"]) for s in cur.get("segments", [])})
    return Manifest.retained_ids(root)


def _drop_blocks(root: str) -> None:
    blocks_dir = os.path.join(root, "blocks")
    if os.path.exists(blocks_dir):
        shutil.rmtree(blocks_dir, ignore_errors=True)


def _write_term_stats(spark: SparkSession, ts: DataFrame, path: str) -> int:
    """Write a term_stats table range-partitioned + sorted by term (prefix
    scans get row-group pruning). Persist first: repartitionByRange samples
    its child and would run the upstream twice. Returns nterms."""
    par = max(2, spark.sparkContext.defaultParallelism // 2)
    ts = ts.persist()
    nterms = ts.count()
    (
        ts.repartitionByRange(par, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(path)
    )
    ts.unpersist()
    return nterms


def _merged_stats(
    spark: SparkSession,
    index: Index,
    root: str,
    seg_post_path: str,
    batch_rowids: list[int],
    alive_add: int,
    ts_new_rel: str,
) -> dict:
    """Additive stats merge for one upsert batch (called with the index
    still reflecting the PRE-batch snapshot, so docs_for_rowids sees the
    replaced versions). Returns the new global-stat meta fields."""
    cfg = index.analyzer_config

    # a delete-only batch writes a footerless postings dir: empty delta
    seg_post = index._read_seg(seg_post_path, POSTINGS_SCHEMA)
    add = (
        seg_post.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df_a"),
            F.sum(F.col("tf0") + F.col("tf1")).alias("cnt_a"),
        )
        .persist()
    )
    dl_add = int(
        add.agg(F.coalesce(F.sum("cnt_a"), F.lit(0)).alias("d")).collect()[0]["d"]
    )

    # previously-live versions of the batch's rowids: rowid-bucket-pruned
    # point lookup + re-tokenize of only those K docs (no postings scan)
    old = index.docs_for_rowids(batch_rowids).filter(F.col("alive"))
    sub = (
        tokenize_postings(old, cfg)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df_s"),
            F.sum(F.col("tf0") + F.col("tf1")).alias("cnt_s"),
        )
        .persist()
    )
    dl_sub = int(
        sub.agg(F.coalesce(F.sum("cnt_s"), F.lit(0)).alias("d")).collect()[0]["d"]
    )
    alive_sub = old.count()

    zero = F.lit(0).cast("long")
    merged = (
        index.term_stats()
        .join(add, "term", "full_outer")
        .join(sub, "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("df"), zero)
                + F.coalesce(F.col("df_a"), zero)
                - F.coalesce(F.col("df_s"), zero)
            ).cast("long").alias("df"),
            (
                F.coalesce(F.col("cnt"), zero)
                + F.coalesce(F.col("cnt_a"), zero)
                - F.coalesce(F.col("cnt_s"), zero)
            ).cast("long").alias("cnt"),
        )
        .filter(F.col("df") > 0)
    )
    nterms = _write_term_stats(spark, merged, os.path.join(root, ts_new_rel))
    add.unpersist()
    sub.unpersist()
    return {
        "ndocs": int(index.meta["ndocs"]) + alive_add - alive_sub,
        "sum_dl": int(index.meta["sum_dl"]) + dl_add - dl_sub,
        "nterms": nterms,
    }


def _full_stats(spark: SparkSession, index: Index, root: str, ts_new_rel: str) -> dict:
    """Full recompute from the overlaid view (compaction / huge batches)."""
    postings = index.postings()
    ts = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.col("tf0") + F.col("tf1")).alias("cnt"),
    )
    nterms = _write_term_stats(spark, ts, os.path.join(root, ts_new_rel))
    agg = (
        spark.read.parquet(os.path.join(root, ts_new_rel))
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("sum_dl"))
        .collect()[0]
    )
    ndocs = index.docs().filter(F.col("alive")).count()
    return {"ndocs": ndocs, "sum_dl": int(agg["sum_dl"]), "nterms": nterms}


def upsert_documents(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    batch_id: int | None = None,
    caches: "tuple | list" = (),
) -> Index:
    """Apply a batch of document updates (insert / replace / tombstone).

    ``docs`` columns: (doc_id, space, title, body, alive), one row per
    doc_id; rows with alive=false delete the document (reference keeps the
    doc row but removes it from the FTS index — same observable behavior
    here).

    ``caches``: ResultCache instances to invalidate per updated docID
    (reference: indexer.go:82-84 calls cache.Invalidate per update,
    cache.go:183-185); batches too large to enumerate clear the caches
    wholesale."""
    index = Index.open(spark, root)
    man = Manifest.load(root)
    if batch_id is not None and batch_id in index.meta.get("applied_batches", []):
        return index  # exactly-once replay guard

    if "rowid" not in docs.columns:
        docs = docs.withColumn("rowid", F.xxhash64("doc_id"))
    # seq must be fresh w.r.t. RETAINED segment dirs too, not just the
    # current snapshot's list: after a compaction, reusing seq 1 would
    # overwrite a time-travel snapshot's overlay data in place
    seg_root = os.path.join(root, "seg")
    on_disk = (
        [int(n) for n in os.listdir(seg_root) if n.isdigit()]
        if os.path.isdir(seg_root)
        else []
    )
    seq = max(
        max((s["seq"] for s in index.segments), default=0),
        max(on_disk, default=0),
    ) + 1
    seg_rel = {
        "seq": seq,
        "postings": f"seg/{seq}/postings",
        "docs": f"seg/{seq}/docs",
        "tombstones": f"seg/{seq}/tombstones",
    }
    docs = docs.persist()

    keep = ["rowid", "doc_id", "space", "title", "body", "alive"]
    if "content_sha256" in docs.columns:
        keep.append("content_sha256")
    seg_docs = docs.select(*keep)
    db = index.meta.get("docs_buckets")
    if db:
        # same rowid-bucket layout as the base: point lookups prune segments
        (
            seg_docs.withColumn("rb", F.pmod(F.col("rowid"), F.lit(db)).cast("int"))
            .write.partitionBy("rb")
            .mode("overwrite")
            .parquet(os.path.join(root, seg_rel["docs"]))
        )
    else:
        seg_docs.write.mode("overwrite").parquet(os.path.join(root, seg_rel["docs"]))
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

    # ---- stats: additive merge (pre-batch snapshot still current) ----
    ver = int(index.meta.get("snapshot_id", 0)) + 1
    ts_new_rel = f"term_stats.v{ver}"
    batch_rowids = [
        r["rowid"]
        for r in docs.select("rowid").distinct().limit(MERGE_MAX_BATCH + 1).collect()
    ]
    new_segments = index.segments + [seg_rel]
    if len(batch_rowids) <= MERGE_MAX_BATCH:
        # merge runs against the PRE-batch snapshot (docs_for_rowids must
        # see the replaced versions, not the new segment)
        stats = _merged_stats(
            spark,
            index,
            root,
            os.path.join(root, seg_rel["postings"]),
            batch_rowids,
            alive_add=docs.filter(F.col("alive")).count(),
            ts_new_rel=ts_new_rel,
        )
    else:
        index.meta = dict(index.meta, segments=new_segments)
        index.invalidate()  # overlay must see the new segment
        stats = _full_stats(spark, index, root, ts_new_rel)

    meta = dict(index.meta)
    meta.update(stats)
    meta.update(
        {
            "segments": new_segments,
            "applied_batches": (
                index.meta.get("applied_batches", [])
                + ([batch_id] if batch_id is not None else [])
            )[-1000:],
            "term_stats_dir": ts_new_rel,
            "blocks": None,  # WAND blocks reflect the old snapshot
        }
    )
    meta.pop("snapshot_id", None)
    man.commit_snapshot(meta)  # ← the atomic commit point
    index.meta = man.state
    index.invalidate()
    if caches:
        # per-docID result-cache invalidation (cache.go:183-185). The
        # doc_id list is bounded like batch_rowids; a huge batch clears.
        ids = [
            r["doc_id"]
            for r in docs.select("doc_id")
            .distinct()
            .limit(MERGE_MAX_BATCH + 1)
            .collect()
        ]
        for c in caches:
            if len(ids) > MERGE_MAX_BATCH:
                c.clear()
            else:
                for d in ids:
                    c.invalidate_doc(d)
    docs.unpersist()

    # post-commit GC of unreferenced dirs + stale WAND blocks. The prefix
    # aggregates are NOT rewritten on the upsert path (prefix_hits overlays
    # segments at query time) — keep the base dir alive.
    _gc_stale_dirs(
        root,
        keep_rel={
            index.meta.get("postings_dir", "postings"),
            index.meta.get("docs_dir", "docs"),
            index.meta.get("prefix_dir", "prefix"),
            ts_new_rel,
        },
    )
    _drop_blocks(root)
    return index


def compact_index(spark: SparkSession, root: str) -> Index:
    """Merge base + segments into a fresh base and drop tombstones —
    segment compaction (reference analog: stepwise FTS5 'merge',
    indextools.go:200-264). Query results are unchanged; read amplification
    returns to one sorted run. Stats are fully recomputed here (the one
    place that pays an index-wide scan), staged under versioned dirs and
    committed by the manifest pointer flip."""
    index = Index.open(spark, root)
    man = Manifest.load(root)
    if not index.segments:
        return index
    par = spark.sparkContext.defaultParallelism
    ver = int(index.meta.get("snapshot_id", 0)) + 1
    post_rel, docs_rel, ts_rel = (
        f"postings.v{ver}",
        f"docs.v{ver}",
        f"term_stats.v{ver}",
    )
    nb = index.n_buckets or DEFAULT_BUCKETS
    db = index.meta.get("docs_buckets", DEFAULT_DOC_BUCKETS)

    post = index.postings()
    if "bucket" not in post.columns:
        post = post.withColumn("bucket", bucket_expr(nb))
    (
        post.repartition(max(2, par // 2), "bucket")
        .sortWithinPartitions("bucket", "term", "rowid")
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(os.path.join(root, post_rel, "chunk=0"))
    )
    (
        index.docs()
        .withColumn("rb", F.pmod(F.col("rowid"), F.lit(db)).cast("int"))
        .repartition(max(2, min(par, db)), "rb")
        .write.partitionBy("rb")
        .mode("overwrite")
        .parquet(os.path.join(root, docs_rel, "chunk=0"))
    )

    new_post = spark.read.option(
        "basePath", os.path.join(root, post_rel)
    ).parquet(os.path.join(root, post_rel, "chunk=*"))

    # rebuild the prefix aggregates from the compacted postings (the one
    # place that pays the index-wide scan; upserts only overlay)
    prefix_lengths = tuple(index.meta.get("prefix_lengths") or ())
    pf_rel = None
    if prefix_lengths:
        from letarette_spark.index.builder import build_prefix_aggregates

        pf_rel = f"prefix.v{ver}"
        build_prefix_aggregates(
            spark, new_post, os.path.join(root, pf_rel), prefix_lengths,
            files_per_len=max(2, par // 4),
        )

    ts = new_post.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.col("tf0") + F.col("tf1")).alias("cnt"),
    )
    nterms = _write_term_stats(spark, ts, os.path.join(root, ts_rel))
    agg = (
        spark.read.parquet(os.path.join(root, ts_rel))
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("sum_dl"))
        .collect()[0]
    )
    ndocs = (
        spark.read.option("basePath", os.path.join(root, docs_rel))
        .parquet(os.path.join(root, docs_rel, "chunk=*"))
        .filter(F.col("alive"))
        .count()
    )

    meta = dict(
        index.meta,
        segments=[],
        postings_dir=post_rel,
        docs_dir=docs_rel,
        term_stats_dir=ts_rel,
        postings_buckets=nb,
        docs_buckets=db,
        ndocs=ndocs,
        sum_dl=int(agg["sum_dl"]),
        nterms=nterms,
        blocks=None,
    )
    if pf_rel:
        meta["prefix_dir"] = pf_rel
        meta["prefix_tail"] = True  # rebuilt aggregates include the tail
    meta.pop("snapshot_id", None)
    man.commit_snapshot(meta)  # ← the atomic commit point
    index.meta = man.state
    index.invalidate()

    keep = {post_rel, docs_rel, ts_rel}
    if pf_rel:
        keep.add(pf_rel)
    _gc_stale_dirs(root, keep_rel=keep)
    # the compacted snapshot overlays nothing, but retained time-travel
    # snapshots may still reference delta segments — GC only unreferenced
    _gc_seg_dirs(root, keep_seqs=set())
    _drop_blocks(root)
    return index
