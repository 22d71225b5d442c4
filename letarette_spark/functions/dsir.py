"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by how target-like its hashed
n-gram distribution is, then resample the raw pool toward the target
distribution with Gumbel top-k.

Pipeline (all relational, all linear in corpus size):
  1. ``hashed_ngram_counts`` — per-doc feature counts: unigrams + bigrams
     of the simple analyzer, hashed into ``n_buckets`` via md5 (the same
     engine-portable hash every other gate uses). One scan + one
     partial-aggregable groupBy.
  2. ``bucket_distribution`` — the global bucket histogram of a corpus,
     add-alpha smoothed over the full bucket space. Output is n_buckets
     rows — broadcast-sized by construction.
  3. ``dsir_log_weights`` — per-doc log importance weight
     log w(d) = sum_b cnt_d[b] * (ln p_target[b] - ln p_raw[b])
     via ONE broadcast join of the tiny log-ratio table onto the per-doc
     bucket counts and a groupBy(doc). The raw pool is scanned once.
  4. ``dsir_sample`` — sampling WITHOUT replacement as Gumbel top-k
     (Kool et al. 2019): key(d) = log w(d) - ln(-ln u_d) with u_d a
     deterministic md5-derived uniform in (0,1), take the k largest keys.
     Deterministic => exact ANSI-SQL twin (driver gates ``dsir_weights``,
     ``dsir_sample``).

Scale notes: the only shuffles are the two bucket-histogram groupBys
(n_buckets cardinality — trivially small) and the per-doc groupBy (keyed
on doc_id, partial-agg combine). The distribution join is broadcast. No
Python anywhere; everything stays in whole-stage codegen.

Reference relation: beyond-reference training-data operator (the
letarette reference has no selection machinery); companions:
functions/sampling.py (quota/temperature) selects by metadata, DSIR
selects by content distribution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array


def _bucket_expr(gram: Column, n_buckets: int) -> Column:
    """md5-derived bucket id in [0, n_buckets): the first 8 hex chars of
    md5(gram) as an unsigned 32-bit int, mod n_buckets — engine-portable
    (DuckDB: ('0x' || substr(md5(g),1,8))::BIGINT % n)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def _grams(text_col: str) -> Column:
    """array<string> of unigrams + space-joined bigrams, document order."""
    toks = token_array(text_col)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return F.concat(toks, bigrams)


def hashed_ngram_counts(
    df: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: list[str] = (),
) -> DataFrame:
    """(id, [*carry,] bucket, cnt) — hashed unigram+bigram bucket counts
    per doc. ``carry`` columns (functionally dependent on the id, e.g. a
    target-membership flag) ride the groupBy key — same grouping, no
    extra join."""
    carry = list(carry)
    return (
        df.select(
            F.col(id_col), *carry, F.explode(_grams(text_col)).alias("gram")
        )
        .select(
            F.col(id_col),
            *carry,
            _bucket_expr(F.col("gram"), n_buckets).alias("bucket"),
        )
        .groupBy(id_col, *carry, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_distribution(
    bucketed: DataFrame,
    n_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, p) — smoothed global distribution over the FULL bucket
    space: p[b] = (cnt[b] + alpha) / (total + alpha * n_buckets). Emits a
    row for every bucket, including empty ones (n_buckets rows total)."""
    spark = bucketed.sparkSession
    counts = bucketed.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    full = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    filled = full.join(F.broadcast(counts), "bucket", "left").select(
        "bucket", F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("c")
    )
    total = filled.agg(F.sum("c").alias("t"))
    return filled.crossJoin(F.broadcast(total)).select(
        "bucket",
        (
            (F.col("c") + F.lit(float(alpha)))
            / (F.col("t") + F.lit(float(alpha) * n_buckets))
        ).alias("p"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    n_buckets: int = 256,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_filter: Column | None = None,
) -> DataFrame:
    """(id, log_w) — per-raw-doc log importance weight under the hashed
    n-gram bag-of-words model: sum_b cnt_d[b] * ln(p_target[b]/p_raw[b]).

    Docs with zero features get log_w = 0.0 (weight 1) so the output has
    one row per raw doc.

    When the target is a SUBSET of raw (the common in-corpus case, e.g.
    "resample toward the wiki-like slice"), pass ``target_filter`` (a
    boolean Column over raw's columns) instead of a separate frame. That
    path runs two shuffle-light jobs instead of the two-frame path's
    (doc, bucket)-materializing plan: an eager map-side-combined
    histogram of BOTH distributions at once (exchange = n_buckets rows
    per partition; the 256-entry log-ratio vector is collected here, so
    calling this runs a job), then a lazy scoring scan that folds
    ``element_at(ratio_literal, bucket(gram))`` directly into
    ``groupBy(id)`` — one exchanged row per doc, never a gram- or
    (doc, bucket)-level shuffle. Results match the two-frame path to
    float association order (test-pinned at 1e-9; the driver gates pin
    the two-frame path exactly)."""
    if (target is None) == (target_filter is None):
        raise ValueError("pass exactly one of target / target_filter")
    if target_filter is not None:
        # Shuffle-light shape. The intermediate the naive form shuffles —
        # per-(doc, bucket) counts, ~n_buckets rows PER DOC — is never
        # needed as a distributed table: the only global state is the
        # 256-entry log-ratio vector, and the per-doc weight is just the
        # sum of log_ratio[bucket(gram)] over the doc's gram occurrences.
        # So: job 1 (eager, here) aggregates BOTH histograms map-side to
        # n_buckets rows (conditional agg on the target flag; the
        # exchange moves n_partitions * n_buckets tiny rows) and collects
        # the ratio vector; job 2 (lazy, returned) re-scans the text once
        # and folds element_at(ratio_literal, bucket) straight into
        # groupBy(id) — its exchange carries ONE row per doc. Neither job
        # shuffles gram-level data; the tokenize scan runs exactly twice
        # and nothing anywhere materializes (doc, bucket) pairs.
        import math

        import numpy as np

        from pyspark.sql import types as T

        from letarette_spark.functions.simple_text import token_array

        # The gram machinery (unigram+bigram build, md5 bucket) runs ONCE
        # in an Arrow stage producing a compact per-doc bucket-sequence
        # array — hashlib.md5 hex == Spark md5 hex byte-for-byte, and
        # ' '.join == concat_ws over the identical JVM token arrays, so
        # the bucket sequence is exactly what the explode + conv(md5)
        # expression produced (pinned at 1e-9 against the two-frame path
        # like before). The persisted (id, tgt, buckets) frame then feeds
        # BOTH jobs — the old shape re-ran tokenize + 20M md5s twice —
        # and neither job shuffles gram-level rows: the histogram ships
        # 2*n_buckets longs per batch, the scorer one row per doc.
        nb = int(n_buckets)
        flagged = raw.select(
            F.col(id_col),
            target_filter.alias("__tgt"),
            token_array(text_col).alias("_toks"),
        )
        id_type = raw.schema[id_col].dataType

        def to_buckets(batches):
            import hashlib

            import pyarrow as pa  # noqa: F811

            md5 = hashlib.md5
            for batch in batches:
                toks = batch.column(2).to_pylist()
                offs = [0]
                flat: list[int] = []
                for lst in toks:
                    if lst:
                        grams = list(lst)
                        grams.extend(
                            lst[i] + " " + lst[i + 1]
                            for i in range(len(lst) - 1)
                        )
                        flat.extend(
                            int(md5(g.encode()).hexdigest()[:8], 16) % nb
                            for g in grams
                        )
                    offs.append(len(flat))
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(0),
                        batch.column(1),
                        pa.ListArray.from_arrays(
                            pa.array(offs, pa.int32()),
                            pa.array(flat, pa.int32()),
                        ),
                    ],
                    names=[id_col, "__tgt", "_bk"],
                )

        bk_schema = T.StructType(
            [
                T.StructField(id_col, id_type),
                T.StructField("__tgt", T.BooleanType()),
                T.StructField("_bk", T.ArrayType(T.IntegerType())),
            ]
        )
        bk = flagged.mapInArrow(to_buckets, schema=bk_schema).persist()

        def hist_fn(batches):
            import pyarrow as pa  # noqa: F811

            for batch in batches:
                tgt = batch.column(1).to_pylist()
                bl = batch.column(2)
                flat = np.asarray(bl.flatten(), dtype=np.int64)
                lens = np.diff(np.asarray(bl.offsets))
                h_raw = np.bincount(flat, minlength=nb)
                tmask = np.repeat(
                    np.asarray([bool(t) for t in tgt]), lens
                )
                h_tgt = np.bincount(flat[tmask], minlength=nb)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(range(nb), pa.int32()),
                        pa.array(h_raw, pa.int64()),
                        pa.array(h_tgt, pa.int64()),
                    ],
                    names=["bucket", "c_raw", "c_tgt"],
                )

        hist = (
            bk.mapInArrow(hist_fn, schema="bucket int, c_raw long, c_tgt long")
            .groupBy("bucket")
            .agg(
                F.sum("c_raw").alias("c_raw"), F.sum("c_tgt").alias("c_tgt")
            )
            .collect()
        )
        c_raw = [0] * nb
        c_tgt = [0] * nb
        for r in hist:
            c_raw[r["bucket"]] = int(r["c_raw"])
            c_tgt[r["bucket"]] = int(r["c_tgt"])
        t_raw, t_tgt = sum(c_raw), sum(c_tgt)
        lr = [
            math.log((c_tgt[b] + alpha) / (t_tgt + alpha * nb))
            - math.log((c_raw[b] + alpha) / (t_raw + alpha * nb))
            for b in range(nb)
        ]
        lr_np = np.asarray(lr, dtype=np.float64)

        def score_fn(batches):
            import pyarrow as pa  # noqa: F811

            for batch in batches:
                bl = batch.column(2)
                offs = np.asarray(bl.offsets)
                offs = offs - offs[0]  # rebase: flatten() follows slices
                flat = np.asarray(bl.flatten(), dtype=np.int64)
                out_ids = []
                out_w = []
                vals = lr_np[flat] if flat.size else lr_np[:0]
                idcol = batch.column(0)
                for j in range(batch.num_rows):
                    lo, hi = offs[j], offs[j + 1]
                    if hi <= lo:
                        continue
                    # sequential left-fold in gram order — the same
                    # accumulation the partial-agg SUM performed over the
                    # exploded rows of one doc (all in one partition)
                    acc = None
                    for v in vals[lo:hi]:
                        acc = v if acc is None else acc + v
                    out_ids.append(j)
                    out_w.append(float(acc))
                yield pa.RecordBatch.from_arrays(
                    [idcol.take(pa.array(out_ids, pa.int32())),
                     pa.array(out_w, pa.float64())],
                    names=[id_col, "log_w"],
                )

        import pyarrow as pa  # noqa: F401 — referenced in closures

        scored = bk.mapInArrow(
            score_fn,
            schema=T.StructType(
                [
                    T.StructField(id_col, id_type),
                    T.StructField("log_w", T.DoubleType()),
                ]
            ),
        )
        # materialize the (one-row-per-doc) weights eagerly so the
        # persisted bucket frame can be released deterministically
        try:
            scored = scored.localCheckpoint()
        finally:
            bk.unpersist()
    else:
        raw_b = hashed_ngram_counts(raw, n_buckets, id_col, text_col)
        tgt_b = hashed_ngram_counts(target, n_buckets, id_col, text_col)
        p_raw = bucket_distribution(raw_b, n_buckets, alpha).select(
            "bucket", F.col("p").alias("p_raw")
        )
        p_tgt = bucket_distribution(tgt_b, n_buckets, alpha).select(
            "bucket", F.col("p").alias("p_tgt")
        )
        ratio = p_tgt.join(p_raw, "bucket").select(
            "bucket", (F.log("p_tgt") - F.log("p_raw")).alias("log_ratio")
        )
        scored = (
            raw_b.join(F.broadcast(ratio), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_w"))
        )
    # keep zero-feature docs (empty text): weight 1 => log_w 0
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("log_w"), F.lit(0.0)).alias("log_w"),
        )
    )


def _gumbel_key(log_w: Column, id_col: Column, seed: int) -> Column:
    """log_w - ln(-ln u) with u = (md5-derived 32-bit int + 1) / (2^32 + 1)
    in (0, 1) — deterministic per (id, seed), identical in any engine."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", id_col.cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967297.0)
    return log_w - F.log(-F.log(u))


def dsir_sample(
    raw: DataFrame,
    target: DataFrame | None = None,
    k: int = 100,
    n_buckets: int = 256,
    alpha: float = 1.0,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_filter: Column | None = None,
) -> DataFrame:
    """(id, log_w, gumbel) — the k raw docs DSIR selects: largest
    ``log_w + Gumbel(0,1)`` keys = a weighted sample without replacement
    from softmax(log_w) (Gumbel top-k). Ties broken by id.

    Scale: weights are linear (see dsir_log_weights); the top-k is
    Spark's global TakeOrdered — no full sort materialization."""
    w = dsir_log_weights(
        raw, target, n_buckets, alpha, id_col, text_col,
        target_filter=target_filter,
    )
    return (
        w.select(
            id_col,
            "log_w",
            _gumbel_key(F.col("log_w"), F.col(id_col), seed).alias("gumbel"),
        )
        .orderBy(F.desc("gumbel"), F.asc(id_col))
        .limit(k)
    )
