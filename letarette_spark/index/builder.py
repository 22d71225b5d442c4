"""Inverted-index build: docs DataFrame → postings / term_stats / docs tables.

Spark-first dataflow (SURVEY.md §3.3, replacing the reference's SQLite
trigger-maintained FTS5 index, migrations/1_init.up.sql:65-97):

  docs ── mapInArrow(tokenize+per-doc aggregate) ──> posting rows
       (term, rowid, tf/positions per column, dl)     [NO shuffle: the
        per-(doc,term) aggregation happens inside the Arrow batch]
       ── hash-bucket shuffle (md5(term) % n_buckets) + partitionBy(bucket)
        + sortWithinPartitions(bucket, term, rowid) ──> partition-dir
        pruning is EXACT for query terms and the term-sorted files add
        row-group min/max pruning (the analog of FTS5's term B-tree);
        a sampler-free hash shuffle, unlike repartitionByRange, runs the
        tokenize stage exactly once
  postings ── groupBy(term).agg(count, sum) ──> term_stats
        [1 row per (term, rowid) already, so df == count(*): a pure
         partial-aggregatable shuffle — no distinct, no skew blowup]

The build is chunked by a stable hash of doc_id; each chunk commits its
files plus a lineage record, so a killed build resumes from the last
committed chunk (manifest.py). Statistics and the query-visible snapshot
commit only after every chunk is durable.
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig
from letarette_spark.index.manifest import Manifest

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("rowid", T.LongType(), False),
        T.StructField("space", T.StringType(), True),
        T.StructField("tf0", T.IntegerType(), False),   # title hits
        T.StructField("tf1", T.IntegerType(), False),   # body hits
        T.StructField("pos0", T.ArrayType(T.IntegerType()), False),
        T.StructField("pos1", T.ArrayType(T.IntegerType()), False),
        T.StructField("dl", T.IntegerType(), False),    # unweighted total tokens
    ]
)

TITLE_WEIGHT = 5.0  # reference rank config bm25(5.0, 1.0), db.go:357-361
BODY_WEIGHT = 1.0

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("rowid", T.LongType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("space", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("body", T.StringType(), True),
        T.StructField("alive", T.BooleanType(), True),
    ]
)

TERM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), True),
        T.StructField("cnt", T.LongType(), True),
    ]
)


def _parquet_or_empty(
    spark: SparkSession,
    read_path: str,
    guard_dir: str,
    fallback_schema,
    base_path: str | None = None,
):
    """Read parquet; when the read fails but *guard_dir* EXISTS (a
    zero-row write left a footerless dir), fall back to an empty frame
    with the canonical schema. A missing dir (index corruption / wrong
    root) stays a hard error — silent emptiness loses data."""
    from pyspark.errors import AnalysisException

    try:
        reader = spark.read
        if base_path:
            reader = reader.option("basePath", base_path)
        return reader.parquet(read_path)
    except AnalysisException:
        if os.path.isdir(guard_dir):
            return spark.createDataFrame([], fallback_schema)
        raise


def _read_tree(spark: SparkSession, base_dir: str, glob: str, fallback_schema):
    return _parquet_or_empty(
        spark, os.path.join(base_dir, glob), base_dir, fallback_schema,
        base_path=base_dir,
    )

DEFAULT_BUCKETS = 64
DEFAULT_DOC_BUCKETS = 16  # rowid-hash partition dirs for the docs table
# prefix posting aggregates: the analog of the reference's prefix='2 3 4'
# B-trees (1_init.up.sql:96) — per (plen, prefix, rowid) pre-merged
# position lists so wildcard queries never scan the full postings table
DEFAULT_PREFIX_LENGTHS = (2, 3, 4)
PREFIX_BUCKETS = 64  # partition dirs keyed by hash of the FIRST character
# bumped whenever the on-disk layout changes shape (readers rebuild stale
# cached indexes instead of misreading them)
LAYOUT_VERSION = 4

PREFIX_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("rowid", T.LongType(), False),
        T.StructField("space", T.StringType(), True),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("pos0", T.ArrayType(T.IntegerType()), False),
        T.StructField("pos1", T.ArrayType(T.IntegerType()), False),
    ]
)


def bucket_expr(n_buckets: int, term_col: str = "term"):
    """Portable term bucket: first 8 hex digits of md5 mod n_buckets —
    computable identically in Spark SQL and driver-side Python, so query
    terms map straight to partition directories (exact pruning)."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(term_col)), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def bucket_of(term: str, n_buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def prefix_bucket_expr(prefix_col: str = "prefix", n_buckets: int = PREFIX_BUCKETS):
    """Partition bucket for prefix aggregates: hash of the FIRST character
    only. An exact prefix lookup prunes to one dir, and a query SHORTER
    than the smallest configured length (e.g. 'a*' with lengths 2 3 4) can
    still prune to the one dir holding every 'a?' group."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.substring(F.col(prefix_col), 1, 1)), 1, 8), 16, 10
        ).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def prefix_bucket_of(prefix: str, n_buckets: int) -> int:
    return bucket_of(prefix[:1], n_buckets)


def build_prefix_aggregates(
    spark: SparkSession,
    postings: DataFrame,
    dest: str,
    prefix_lengths: tuple[int, ...],
    files_per_len: int = 8,
    n_buckets: int = PREFIX_BUCKETS,
) -> None:
    """Materialize per-(plen, prefix, rowid) merged position lists.

    Reference analog: FTS5's prefix indexes store, for each configured
    prefix length, the merged doclist of every term sharing that prefix
    (1_init.up.sql:96 `prefix='2 3 4'`) — paying ~1x the postings volume
    per length at build time so prefix queries are O(result), not
    O(index), at any vocabulary size.

    Layout: dest/plen=L/pb=<first-char bucket>/..., rows sorted by
    (prefix, rowid) within files — exact dir pruning for a prefix lookup
    plus parquet row-group min/max pruning on the prefix column. One
    postings scan + one shuffle for all lengths (explode by length).

    plen=-1 is the TERM-RANGE TAIL: the full postings laid out by
    (first-char bucket, term-sorted) with prefix = the whole term. It
    serves wildcard queries LONGER than the largest configured length
    (FTS5's equivalent is a term-range scan of its term-ordered main
    B-tree; our main postings are hash-bucketed for exact-term pruning,
    so prefix range scans get their own ordered copy): one partition
    dir + a startswith row-group-pruned scan, O(matching postings) at
    any vocabulary size — the dictionary-expansion/full-scan fallback
    is unreachable for tail-enabled indexes."""
    # two independent writes land under dest (the plen=-1 tail and the
    # merged plen=L dirs): a stale dest from a crashed earlier attempt
    # must not leak rows, so start from an empty dir like the old single
    # mode-overwrite write did
    if os.path.exists(dest):
        shutil.rmtree(dest)
    # The tail (plen=-1) groups by (prefix=term, rowid) — already UNIQUE
    # in postings (one row per term per live doc; chunk-disjoint builds
    # and tombstoned compaction both preserve it), so its "aggregation"
    # is the identity: skip the groupBy exchange and the collect_list
    # machinery outright and lay the rows out with ONE hash exchange.
    # The tail is the largest slice (full postings volume vs. the
    # prefix-merged lengths), so this halves the shuffled bytes.
    tail = postings.select(
        F.col("term").alias("prefix"), "rowid", "space", "dl", "pos0", "pos1"
    ).withColumn("pb", prefix_bucket_expr("prefix", n_buckets))

    def _write_tail():
        (
            # 2x files_per_len: the tail is the full-postings-volume write
            # and was the narrowest stage of the build (measured 2.0s at 8
            # tasks vs 1.4s at 16 for 1.26M postings); pb dirs still cap
            # the per-query file count at tasks-per-dir
            tail.repartition(max(2, files_per_len * 2), "pb")
            .sortWithinPartitions("pb", "prefix", "rowid")
            .write.partitionBy("pb")
            .mode("overwrite")
            .parquet(os.path.join(dest, "plen=-1"))
        )

    if not prefix_lengths:
        _write_tail()
        return
    # NOTE(r6): a one-exchange variant (hash on (plen, pb) + in-partition
    # sort + Arrow adjacent-row merge) was implemented and A/B-measured
    # 2x SLOWER than this two-exchange groupBy form (6.7s vs 3.4s at
    # 1.26M postings): converting 3.8M list-typed rows through the
    # Python boundary costs more than the second exchange + collect_list
    # buffering. Kept the JVM groupBy.
    lens = F.array(*[F.lit(int(x)) for x in prefix_lengths])
    rows = (
        postings.select(
            F.explode(lens).alias("plen"),
            "term", "rowid", "space", "dl", "pos0", "pos1",
        )
        .filter(F.length("term") >= F.col("plen"))
        .select(
            "plen",
            F.expr("substring(term, 1, plen)").alias("prefix"),
            "rowid", "space", "dl", "pos0", "pos1",
        )
        .groupBy("plen", "prefix", "rowid")
        .agg(
            F.first("space").alias("space"),
            F.first("dl").alias("dl"),
            F.array_sort(F.flatten(F.collect_list("pos0"))).alias("pos0"),
            F.array_sort(F.flatten(F.collect_list("pos1"))).alias("pos1"),
        )
        .withColumn("pb", prefix_bucket_expr("prefix", n_buckets))
    )
    # The tail write and the merged-lengths write are independent jobs
    # over independent scans into disjoint plen dirs: overlap them
    # (guide §2.6 back-fill). The merged write goes to a sibling staging
    # dir (NOT a concurrent append into dest — two committers listing
    # the same target would race) and its plen=L dirs are renamed in
    # after both jobs succeed; the caller's pf_tmp -> pf_dir swap
    # remains the atomic commit.
    lens_tmp = dest + ".lens"
    if os.path.exists(lens_tmp):
        shutil.rmtree(lens_tmp)

    def _write_lens():
        (
            rows.repartition(
                max(2, files_per_len * len(prefix_lengths)), "plen", "pb"
            )
            .sortWithinPartitions("plen", "pb", "prefix", "rowid")
            .write.partitionBy("plen", "pb")
            .mode("overwrite")
            .parquet(lens_tmp)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_write_tail), pool.submit(_write_lens)]
        for f in futs:
            f.result()
    for name in os.listdir(lens_tmp):
        if name.startswith("plen="):
            os.rename(
                os.path.join(lens_tmp, name), os.path.join(dest, name)
            )
    shutil.rmtree(lens_tmp, ignore_errors=True)


def tokenize_postings(docs: DataFrame, config: AnalyzerConfig) -> DataFrame:
    """Vectorized tokenize + in-batch per-(doc, term) aggregation.

    One posting row per distinct term per document, carrying per-column
    term frequencies, position lists (for phrase/NEAR evaluation) and the
    document's unweighted token count (dl) — denormalized so BM25 scoring
    never joins a doc-length table.

    Emits Arrow RecordBatches directly (mapInArrow) with position lists as
    native ListArrays over flat int32 buffers — building pandas rows of
    Python list objects measured 3-4x slower than the tokenization itself
    and did not scale with cores.
    """
    import pyarrow as pa

    cfg = config.key()

    out_type = pa.schema(
        [
            ("term", pa.string()),
            ("rowid", pa.int64()),
            ("space", pa.string()),
            ("tf0", pa.int32()),
            ("tf1", pa.int32()),
            ("pos0", pa.list_(pa.int32())),
            ("pos1", pa.list_(pa.int32())),
            ("dl", pa.int32()),
        ]
    )

    def tok(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        analyzer = Analyzer(AnalyzerConfig(
            mode=cfg["mode"],
            languages=tuple(cfg["languages"]),
            min_token_length=cfg["min_token_length"],
            stem_min=cfg["stem_min"],
            stem_max=cfg["stem_max"],
            token_chars=cfg.get("token_chars", ""),
            separators=cfg.get("separators", ""),
        ))
        for batch in batches:
            rowids = batch.column("rowid").to_pylist()
            spaces = batch.column("space").to_pylist()
            titles = batch.column("title").to_pylist()
            bodies = batch.column("body").to_pylist()
            terms: list[str] = []
            o_rowid: list[int] = []
            o_space: list[str] = []
            tf0: list[int] = []
            tf1: list[int] = []
            dls: list[int] = []
            p0_off = [0]
            p0_val: list[int] = []
            p1_off = [0]
            p1_val: list[int] = []
            for rid, sp, ti, bo in zip(rowids, spaces, titles, bodies):
                t0 = analyzer.tokens(ti or "")
                t1 = analyzer.tokens(bo or "")
                d = len(t0) + len(t1)
                agg: dict[str, tuple[list, list]] = {}
                for tk in t0:
                    agg.setdefault(tk.term, ([], []))[0].append(tk.pos)
                for tk in t1:
                    agg.setdefault(tk.term, ([], []))[1].append(tk.pos)
                for term, (a0, a1) in agg.items():
                    terms.append(term)
                    o_rowid.append(rid)
                    o_space.append(sp)
                    tf0.append(len(a0))
                    tf1.append(len(a1))
                    dls.append(d)
                    p0_val.extend(a0)
                    p0_off.append(len(p0_val))
                    p1_val.extend(a1)
                    p1_off.append(len(p1_val))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(terms, pa.string()),
                    pa.array(o_rowid, pa.int64()),
                    pa.array(o_space, pa.string()),
                    pa.array(tf0, pa.int32()),
                    pa.array(tf1, pa.int32()),
                    pa.ListArray.from_arrays(
                        pa.array(p0_off, pa.int32()), pa.array(p0_val, pa.int32())
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(p1_off, pa.int32()), pa.array(p1_val, pa.int32())
                    ),
                    pa.array(dls, pa.int32()),
                ],
                schema=out_type,
            )

    cols = docs.select("rowid", "space", "title", "body")
    return cols.mapInArrow(tok, schema=POSTINGS_SCHEMA)


@dataclass
class BuildResult:
    root: str
    ndocs: int
    nterms: int
    sum_dl: int
    chunks_built: int
    chunks_skipped: int


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    root: str,
    config: AnalyzerConfig | None = None,
    n_build_partitions: int = 16,
    chunk_size: int = 8,
    files_per_chunk: int | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    docs_buckets: int = DEFAULT_DOC_BUCKETS,
    prefix_lengths: tuple[int, ...] = DEFAULT_PREFIX_LENGTHS,
    verify_sha256: bool = False,
    snapshot_retention: int = 1,
    fail_after_chunks: int | None = None,  # test hook: simulate a killed build
) -> BuildResult:
    """Build (or resume) the inverted index at *root*.

    ``docs`` must have columns (doc_id, space, title, body, alive) and
    optionally rowid / content_sha256. Chunking key is a stable hash of
    doc_id, so a resumed build over the same input processes exactly the
    not-yet-committed chunks regardless of input partitioning.

    ``snapshot_retention`` > 1 keeps that many committed snapshots readable
    via ``Index.open(..., snapshot_id=n)`` (Iceberg-style time travel);
    mutation-path GC then preserves any data dir a retained snapshot still
    references, and ``index.incremental.expire_snapshots`` reclaims them.
    """
    config = config or AnalyzerConfig()
    if "rowid" not in docs.columns:
        docs = docs.withColumn("rowid", F.xxhash64("doc_id"))

    if verify_sha256 and "content_sha256" in docs.columns:
        bad = docs.filter(F.sha2(F.col("body"), 256) != F.col("content_sha256")).count()
        if bad:
            raise ValueError(f"content_sha256 invariant violated for {bad} rows")

    man = Manifest(root)
    plan = {
        "n_parts": n_build_partitions,
        "chunk_size": chunk_size,
        "n_buckets": n_buckets,
        "docs_buckets": docs_buckets,
        "prefix_lengths": sorted(int(x) for x in prefix_lengths),
        "analyzer": config.key(),
    }
    lineage = man.start_plan(plan)
    done = set(lineage["chunks"])

    docs = docs.withColumn(
        "build_part", F.pmod(F.xxhash64("doc_id"), F.lit(n_build_partitions))
    )
    chunk_ids = list(range(0, n_build_partitions, chunk_size))
    files_per_chunk = files_per_chunk or max(
        2, spark.sparkContext.defaultParallelism // 2
    )

    built = skipped = 0
    for ci, start in enumerate(chunk_ids):
        if str(ci) in done:
            skipped += 1
            continue
        if fail_after_chunks is not None and built >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {built} chunks")
        parts = list(range(start, min(start + chunk_size, n_build_partitions)))
        chunk_docs = docs.filter(F.col("build_part").isin(parts)).drop("build_part")

        docs_dir = os.path.join(root, "docs", f"chunk={ci}")
        post_dir = os.path.join(root, "postings", f"chunk={ci}")
        # overwrite per-chunk dirs: a chunk that wrote files but died before
        # its lineage record is cleanly rewritten on resume (idempotent).
        keep = ["rowid", "doc_id", "space", "title", "body", "alive"]
        if "content_sha256" in chunk_docs.columns:
            keep.append("content_sha256")

        # docs laid out by rowid-hash dirs (rb): point lookups by rowid
        # (upsert old-version subtraction, top-k metadata joins) prune to
        # the target buckets instead of scanning the whole docs table.
        def _write_docs(chunk_docs=chunk_docs, docs_dir=docs_dir):
            (
                chunk_docs.select(*keep)
                .withColumn(
                    "rb", F.pmod(F.col("rowid"), F.lit(docs_buckets)).cast("int")
                )
                .repartition(max(2, min(files_per_chunk, docs_buckets)), "rb")
                .write.partitionBy("rb")
                .mode("overwrite")
                .parquet(docs_dir)
            )

        # Layout: hash-bucket directories + term-sorted rows. A single hash
        # shuffle (no sampling pass, unlike repartitionByRange — tokenize
        # runs exactly once), partitionBy('bucket') directories give EXACT
        # partition pruning for query terms, and within-file term sorting
        # gives row-group min/max pruning for prefix scans. Head-term skew
        # is bounded: one term is one bucket slice, and buckets >> tasks
        # average the rest out.
        # Tokenization is CPU-bound Python: spread it over all cores even
        # when the source is a single parquet file (one input split would
        # otherwise serialize the whole chunk through one task). The
        # spread repartition sits ONLY on the tokenize branch — the docs
        # write above has its own rb hash exchange, and a shared upstream
        # round-robin pass would shuffle every document body a second
        # time for nothing.
        def _write_postings(chunk_docs=chunk_docs, post_dir=post_dir):
            postings = tokenize_postings(
                chunk_docs.filter(F.col("alive")).repartition(
                    max(spark.sparkContext.defaultParallelism, files_per_chunk)
                ),
                config,
            )
            (
                postings.withColumn("bucket", bucket_expr(n_buckets))
                .repartition(files_per_chunk, "bucket")
                .sortWithinPartitions("bucket", "term", "rowid")
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(post_dir)
            )

        # The two chunk writes are independent jobs over independent
        # scans into disjoint dirs: submit both so the docs write's I/O
        # tail back-fills the tokenize stage's cores (guide §2.6 overlap;
        # Spark schedules concurrent jobs FIFO, which is exactly the
        # back-fill behavior). Chunk commit (record_chunk) only after
        # BOTH succeed — resume semantics unchanged.
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(_write_docs), pool.submit(_write_postings)]
            for f in futs:
                f.result()
        man.record_chunk(ci, {"parts": parts, "status": "done"})
        built += 1

    # ---- finalize: global stats + snapshot commit ----
    postings_all = _read_tree(
        spark, os.path.join(root, "postings"), "chunk=*",
        T.StructType(POSTINGS_SCHEMA.fields
                     + [T.StructField("bucket", T.IntegerType())]),
    )
    ts_dir = os.path.join(root, "term_stats")

    def _finalize_term_stats():
        term_stats = postings_all.groupBy("term").agg(
            F.count(F.lit(1)).alias("df"),
            F.sum(F.col("tf0") + F.col("tf1")).alias("cnt"),
        )
        ts_tmp = os.path.join(root, "term_stats.tmp")
        # repartitionByRange SAMPLES its child: without a persist the full
        # postings scan + groupBy would run twice (sample pass + write
        # pass). The aggregated frame is one row per term — cheap to hold;
        # the range layout is worth it (term_stats lookups range-prune by
        # term).
        ts = term_stats.persist()
        try:
            ts.repartitionByRange(
                max(2, files_per_chunk), "term"
            ).sortWithinPartitions("term").write.mode("overwrite").parquet(
                ts_tmp
            )
        finally:
            ts.unpersist()
        if os.path.exists(ts_dir):
            shutil.rmtree(ts_dir)
        os.replace(ts_tmp, ts_dir)
        # global stats from the (small) term_stats table — no extra
        # postings scan: sum over terms of cnt == total tokens == sum
        # over docs of dl
        return spark.read.parquet(ts_dir).agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("sum_dl"),
            F.count(F.lit(1)).alias("nterms"),
        ).collect()[0]

    def _finalize_prefix():
        if not prefix_lengths:
            return
        pf_tmp = os.path.join(root, "prefix.tmp")
        pf_dir = os.path.join(root, "prefix")
        build_prefix_aggregates(
            spark, postings_all, pf_tmp, tuple(prefix_lengths),
            files_per_len=max(2, files_per_chunk // 2),
        )
        if os.path.exists(pf_dir):
            shutil.rmtree(pf_dir)
        os.replace(pf_tmp, pf_dir)

    def _finalize_ndocs():
        docs_all = _read_tree(
            spark, os.path.join(root, "docs"), "chunk=*", DOCS_SCHEMA
        )
        return docs_all.filter(F.col("alive")).count()

    # The three finalize jobs are independent (two disjoint postings
    # scans + one docs scan, into disjoint output dirs / a scalar):
    # overlap them so each job's straggler tail back-fills the others
    # (guide §2.6). The snapshot commit below happens only after ALL
    # futures resolve, so crash atomicity is unchanged — an interrupted
    # finalize leaves tmp dirs and an uncommitted manifest exactly as
    # the sequential form did.
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_ts = pool.submit(_finalize_term_stats)
        f_pf = pool.submit(_finalize_prefix)
        f_nd = pool.submit(_finalize_ndocs)
        agg = f_ts.result()
        f_pf.result()
        ndocs = f_nd.result()
    nterms = int(agg["nterms"])

    man.reset_history()  # a full (re)build starts a fresh snapshot history
    man.commit_snapshot(
        {
            "analyzer": config.key(),
            "layout": LAYOUT_VERSION,
            "ndocs": ndocs,
            "sum_dl": int(agg["sum_dl"]),
            "nterms": nterms,
            "weights": {"title": TITLE_WEIGHT, "body": BODY_WEIGHT},
            "postings_buckets": n_buckets,
            "docs_buckets": docs_buckets,
            "prefix_lengths": sorted(int(x) for x in prefix_lengths),
            "prefix_buckets": PREFIX_BUCKETS if prefix_lengths else None,
            "prefix_tail": bool(prefix_lengths),
            "snapshot_retention": max(1, int(snapshot_retention)),
            "plan": plan,
        }
    )
    man.clear_plan()
    return BuildResult(root, ndocs, nterms, int(agg["sum_dl"]), built, skipped)


def _merge_posting_rows(df: DataFrame) -> DataFrame:
    """Merge multiple posting/prefix rows per rowid into one: a doc may
    contain several terms matching a prefix — union their instance lists
    (FTS5 prefix-query semantics)."""
    return df.groupBy("rowid").agg(
        F.first("space").alias("space"),
        F.first("dl").alias("dl"),
        F.array_sort(F.flatten(F.collect_list("pos0"))).alias("pos0"),
        F.array_sort(F.flatten(F.collect_list("pos1"))).alias("pos1"),
    )


@dataclass
class Index:
    spark: SparkSession
    root: str
    meta: dict

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        root: str,
        config: AnalyzerConfig | None = None,
        snapshot_id: int | None = None,
    ) -> "Index":
        """Open the committed index, or — with *snapshot_id* — a retained
        older snapshot (time travel, the Iceberg ``VERSION AS OF`` analog;
        requires the index to have been built/maintained with
        ``snapshot_retention > 1``). Time-travel reads force the exhaustive
        scoring path: the WAND blocks table tracks only the CURRENT
        snapshot, so serving it for an older state could surface rows the
        old snapshot never contained."""
        if snapshot_id is None:
            man = Manifest.load(root)
        else:
            man = Manifest.load_snapshot(root, snapshot_id)
            man.state = dict(man.state, blocks=None)
        if config is not None:
            man.require_analyzer(config.key())
        return cls(spark, root, man.state)

    @property
    def analyzer_config(self) -> AnalyzerConfig:
        a = self.meta["analyzer"]
        return AnalyzerConfig(
            mode=a["mode"],
            languages=tuple(a["languages"]),
            min_token_length=a["min_token_length"],
            stem_min=a["stem_min"],
            stem_max=a["stem_max"],
            token_chars=a.get("token_chars", ""),
            separators=a.get("separators", ""),
        )

    @property
    def segments(self) -> list[dict]:
        """Delta segments from incremental upserts (seq > 0); the chunked
        base build is seq 0. See index/incremental.py."""
        return self.meta.get("segments", [])

    def _read_seg(self, path: str, fallback_schema) -> DataFrame:
        """Read one delta-segment parquet dir; a DELETE-ONLY batch writes a
        footerless dir (partitionBy of zero rows) — fall back to an empty
        frame for that case ONLY. A MISSING directory stays a hard error:
        silently treating absent tombstones as empty would resurrect
        deleted documents."""
        return _parquet_or_empty(self.spark, path, path, fallback_schema)

    def _segment_parts(
        self, table: str, base_schema
    ) -> tuple[list[DataFrame], list[DataFrame]]:
        """Per-segment (rows tagged with _seq, tombstones tagged with
        _tseq) for one overlaid table. Raises when a manifest-listed
        segment's data dir is gone — that is corruption, not emptiness."""
        parts, tombs = [], []
        for s in self.segments:
            p = os.path.join(self.root, s[table])
            if not os.path.exists(p):
                # symmetric with the tombstone guard: silently skipping
                # would vanish the segment's document versions
                raise FileNotFoundError(
                    f"index segment data missing: {p} "
                    f"(manifest lists seq {s['seq']})"
                )
            parts.append(
                self._read_seg(p, base_schema)
                .drop("rb")  # docs segments carry the rowid-bucket dir
                .withColumn("_seq", F.lit(s["seq"]))
            )
            tombs.append(
                self._read_seg(
                    os.path.join(self.root, s["tombstones"]), "rowid long"
                ).select(
                    F.col("rowid").alias("_trowid"), F.lit(s["seq"]).alias("_tseq")
                )
            )
        return parts, tombs

    @staticmethod
    def _apply_tombstones(rows: DataFrame, tombs: list[DataFrame]) -> DataFrame:
        """Drop rows whose rowid is tombstoned by a LATER segment. The
        churn between compactions is small relative to the base: broadcast
        the tombstone set (at larger churn a bloom-filter join or an
        Iceberg MERGE would take over; compaction bounds growth)."""
        tomb = tombs[0]
        for t in tombs[1:]:
            tomb = tomb.unionByName(t)
        return rows.join(
            F.broadcast(tomb),
            (F.col("rowid") == F.col("_trowid")) & (F.col("_tseq") > F.col("_seq")),
            "left_anti",
        ).drop("_seq")

    def _overlay(self, base: DataFrame, table: str) -> DataFrame:
        """Union base (seq 0) with delta segments; a row from seq S is dead
        when any later segment tombstoned its rowid (LSM-style overlay,
        mirroring FTS5's delete+insert trigger maintenance,
        1_init.up.sql:65-76)."""
        if not self.segments:
            return base
        parts, tombs = self._segment_parts(table, base.schema)
        allrows = base.withColumn("_seq", F.lit(0))
        for p in parts:
            allrows = allrows.unionByName(p)
        return self._apply_tombstones(allrows, tombs)

    def invalidate(self) -> None:
        """Drop cached DataFrame handles after storage-layout mutations
        (upserts, compaction) — stale handles reference deleted files."""
        self.__dict__.pop("_postings_df", None)
        self.__dict__.pop("_term_stats_df", None)
        self.__dict__.pop("_speling_df", None)

    @property
    def n_buckets(self) -> int | None:
        return self.meta.get("postings_buckets")

    def bucket_of_term(self, term: str) -> int | None:
        b = self.n_buckets
        return bucket_of(term, b) if b else None

    # ---- storage-dir pointers: committed snapshots reference versioned
    # dirs (term_stats.vN / postings.vN / docs.vN) so mutations stage new
    # data and flip the pointer last — a crash never leaves the committed
    # snapshot reading half-written stats (the analog of the reference's
    # single SQLite transaction around upsert + stats).
    def term_stats_dir(self) -> str:
        return os.path.join(self.root, self.meta.get("term_stats_dir", "term_stats"))

    def postings_base_dir(self) -> str:
        return os.path.join(self.root, self.meta.get("postings_dir", "postings"))

    def prefix_base_dir(self) -> str:
        return os.path.join(self.root, self.meta.get("prefix_dir", "prefix"))

    def docs_base_dir(self) -> str:
        return os.path.join(self.root, self.meta.get("docs_dir", "docs"))

    def _postings_base(self) -> DataFrame:
        """Base-snapshot postings only (seq 0, no segment overlay)."""
        base_dir = self.postings_base_dir()
        return _read_tree(
            self.spark, base_dir, "chunk=*",
            T.StructType(POSTINGS_SCHEMA.fields
                     + [T.StructField("bucket", T.IntegerType())]),
        ).drop("chunk")

    def postings(self) -> DataFrame:
        # reuse one DataFrame instance per Index: repeated queries skip
        # re-listing the file index
        cached = self.__dict__.get("_postings_df")
        if cached is not None:
            return cached
        df = self._overlay(self._postings_base(), "postings")
        self.__dict__["_postings_df"] = df
        return df

    def _terms_cond(self, terms: list[str]):
        """Pruning predicate for an exact term set: bucket partition-dir
        pruning (exact) + term pushdown (row-group min/max on sorted
        files)."""
        cond = F.col("term").isin(terms) if len(terms) > 1 else (
            F.col("term") == terms[0]
        )
        b = self.n_buckets
        if b:
            buckets = sorted({bucket_of(t, b) for t in terms})
            bcond = (
                F.col("bucket").isin(buckets)
                if len(buckets) > 1
                else (F.col("bucket") == buckets[0])
            )
            cond = bcond & cond
        return cond

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Term-pruned postings scan over the live (overlaid) view."""
        return self.postings().filter(self._terms_cond(terms))

    # ---- prefix aggregates (wildcard fast path) ----
    def _prefix_base(self, plen: int, prefix: str) -> DataFrame:
        """Base-snapshot prefix-aggregate rows for one (plen, first-char
        bucket) partition dir; empty frame when the dir does not exist."""
        npb = self.meta.get("prefix_buckets") or PREFIX_BUCKETS
        d = os.path.join(
            self.prefix_base_dir(),
            f"plen={plen}",
            f"pb={prefix_bucket_of(prefix, npb)}",
        )
        if not os.path.isdir(d):
            return self.spark.createDataFrame([], PREFIX_SCHEMA)
        return self.spark.read.schema(PREFIX_SCHEMA).parquet(d)

    def prefix_hits(self, prefix: str) -> DataFrame | None:
        """Merged per-rowid hits (rowid, space, dl, pos0, pos1) for the
        wildcard query `prefix*`, served from the build-time prefix
        aggregates — the analog of the reference's prefix='2 3 4' B-trees
        (1_init.up.sql:96). O(result) at any vocabulary size: one
        partition dir + row-group-pruned prefix predicate, never a full
        postings scan.

        Returns None when no aggregate covers this prefix length (longer
        than the largest configured length, or a pre-prefix-layout index)
        — the caller falls back to dictionary expansion.

        Delta segments are overlaid at query time: base rows for
        tombstoned rowids are dropped and the (compaction-bounded)
        segment postings contribute a startswith-filtered merge — upserts
        never rewrite the base aggregates."""
        lengths = self.meta.get("prefix_lengths") or []
        if not lengths or not prefix:
            return None
        L = len(prefix)
        cols = ["rowid", "space", "dl", "pos0", "pos1"]
        if L in lengths:
            base = (
                self._prefix_base(L, prefix)
                .filter(F.col("prefix") == prefix)
                .select(*cols)
            )
            base_is_merged = True
        elif L < min(lengths):
            # shorter than every aggregate (e.g. 'a*' with lengths 2 3 4):
            # all length-Lp groups extending the prefix live in ONE
            # first-char dir; terms shorter than Lp that match (at most a
            # handful, e.g. the bare term 'a') come from the dictionary +
            # an exact-pruned base-postings lookup
            Lp = min(x for x in lengths if x > L)
            base = (
                self._prefix_base(Lp, prefix)
                .filter(F.col("prefix").startswith(prefix))
                .select(*cols)
            )
            short_terms = [
                r["term"]
                for r in self.term_stats()
                .filter(
                    F.col("term").startswith(prefix) & (F.length("term") < Lp)
                )
                .select("term")
                .collect()
            ]
            if short_terms:
                base = base.unionByName(
                    self._postings_base()
                    .filter(self._terms_cond(short_terms))
                    .select(*cols)
                )
            base_is_merged = False
        elif self.meta.get("prefix_tail"):
            # longer than every aggregate: the plen=-1 term-range tail
            # (prefix = whole term, first-char dir, term-sorted files) —
            # one partition dir + startswith row-group pruning,
            # O(matching postings) at any vocabulary size
            base = (
                self._prefix_base(-1, prefix)
                .filter(F.col("prefix").startswith(prefix))
                .select(*cols)
            )
            base_is_merged = False
        else:
            return None

        if not self.segments:
            return base if base_is_merged else _merge_posting_rows(base)

        parts, tombs = self._segment_parts(
            "postings",
            T.StructType(POSTINGS_SCHEMA.fields
                         + [T.StructField("bucket", T.IntegerType())]),
        )
        seg_rows = parts[0]
        for p in parts[1:]:
            seg_rows = seg_rows.unionByName(p)
        seg_rows = self._apply_tombstones(
            seg_rows.filter(F.col("term").startswith(prefix)), tombs
        ).select(*cols)
        # every segment posting's rowid is tombstoned in its own segment,
        # so base-minus-tombstones and the segment rows are rowid-disjoint
        tomb_ids = tombs[0]
        for t in tombs[1:]:
            tomb_ids = tomb_ids.unionByName(t)
        tomb_ids = tomb_ids.select(F.col("_trowid").alias("rowid")).distinct()
        base = base.join(F.broadcast(tomb_ids), "rowid", "left_anti")
        if base_is_merged:
            return base.unionByName(_merge_posting_rows(seg_rows))
        return _merge_posting_rows(base.unionByName(seg_rows))

    def docs(self) -> DataFrame:
        base_dir = self.docs_base_dir()
        base = _read_tree(self.spark, base_dir, "chunk=*", DOCS_SCHEMA).drop(
            "chunk", "rb"
        )
        return self._overlay(base, "docs")

    def docs_for_rowids(self, rowids: list[int]) -> DataFrame:
        """Point lookup: current live doc rows for the given rowids.

        Scans ONLY the rowid-bucket dirs (rb = pmod(rowid, docs_buckets))
        the keys hash to — the upsert old-version fetch reads a K/buckets
        fraction of the docs table instead of all of it. Delta segments
        (bounded by compaction) are read in full; tombstone overlay rules
        apply as in docs()."""
        rowids = [int(r) for r in rowids]
        nb = self.meta.get("docs_buckets")
        base_dir = self.docs_base_dir()
        paths = []
        if nb:
            want = sorted({r % nb for r in rowids})
            if os.path.isdir(base_dir):
                for chunk in os.listdir(base_dir):
                    if not chunk.startswith("chunk="):
                        continue
                    for b in want:
                        p = os.path.join(base_dir, chunk, f"rb={b}")
                        if os.path.isdir(p):
                            paths.append(p)
        if nb and paths:
            base = self.spark.read.option("basePath", base_dir).parquet(
                *paths
            ).drop("chunk", "rb")
        elif nb and not paths:  # none of the keys' buckets exist on disk
            base = self.spark.createDataFrame([], DOCS_SCHEMA)
        else:  # pre-layout-2 index: no bucket dirs to prune
            base = _read_tree(self.spark, base_dir, "chunk=*", DOCS_SCHEMA).drop(
                "chunk", "rb"
            )
        return self._overlay(base, "docs").filter(F.col("rowid").isin(rowids))

    def term_stats(self) -> DataFrame:
        # known schema (no inference job) + one handle per Index (repeated
        # queries skip re-listing); invalidate() drops the handle
        cached = self.__dict__.get("_term_stats_df")
        if cached is not None:
            return cached
        path = self.term_stats_dir()
        if os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            df = self.spark.read.schema(TERM_STATS_SCHEMA).parquet(path)
        else:  # empty index: no footers written
            df = self.spark.createDataFrame([], TERM_STATS_SCHEMA)
        self.__dict__["_term_stats_df"] = df
        return df

    def preload(self) -> None:
        """Warm the executor block cache (reference analog: preloadDB's
        page-cache touch + fadvise, db.go:504-540). Optional."""
        self.postings().cache().count()
        self.docs().cache().count()
