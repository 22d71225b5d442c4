"""Benchmark harness — prints ONE JSON line.

Times the headline paths over $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- index_build: full inverted-index build (porter mode) over the documents
  table (tokenize -> postings -> term_stats -> snapshot commit)
- engine query latencies: single-term / NEAR / NOT / phrase / wildcard BM25
  top-10 through the Searcher
- relational analytics: simple-analyzer BM25 top-k, minhash signatures,
  n-gram jaccard pairs, knn cosine
- scale-path dedup: minhash-LSH near-dup pairs (candidate-only verify),
  banded-LSH embedding dup pairs, single-pass simhash
- ANN: IVF probe-query top-k (pre-trained centroids; compare knn_cosine)

Contention robustness: this host has invisible noisy neighbors (identical
code has swung 26->90s run-to-run — BASELINE.md, CLAUDE.md), so every
timed operation runs $SPARK_GRAFT_TRIALS times (default 3) INTERLEAVED —
whole-suite passes, not back-to-back repeats, so one noisy window cannot
poison all trials of a query — and the reported number per query is the
MIN across trials. Per-trial raw timings and /proc/loadavg samples ride
in `extra.trials` / `extra.load` so a noisy window is visible in the
artifact itself.

`extra.suite_r01_total` sums the round-1 query subset (min-of-trials) so
round-over-round totals stay comparable as new queries join the suite.

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "extra": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _load_avg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:  # pragma: no cover - non-linux
        return -1.0


def _bench_sharded(spark, idx, single_searcher, n_shards: int = 4) -> dict:
    """Scatter-gather over n shard clones vs the single index: the merged
    query fans out concurrently (query/sharded.py), so its latency should
    track max-of-shards, not the sum — the reference's async NATS gather
    (pkg/client/agent.go:118-211). Returns the measured section for
    `extra.sharded`."""
    from letarette_spark.index.builder import Index
    from letarette_spark.index.cloning import export_shard, import_shard
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.sharded import sharded_search

    tmp = tempfile.mkdtemp(prefix="letarette_bench_shards_")
    try:
        shard_searchers = []
        for g in range(1, n_shards + 1):
            exp = os.path.join(tmp, f"exp{g}")
            root = os.path.join(tmp, f"idx{g}")
            export_shard(idx, exp, f"{g}/{n_shards}")
            import_shard(spark, exp, root)
            shard_searchers.append(Searcher(Index.open(spark, root)))

        queries = ("value", "key value", "table -key")
        kw = {"snippets": False, "autocorrect": False}
        # warm both paths (Python workers, file listings)
        for q in queries:
            single_searcher.search_df(q, limit=12)[0].collect()
            sharded_search(shard_searchers, q, page_limit=12, **kw)

        def best_of(fn, reps=3):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            return best

        single = {
            q: best_of(lambda q=q: single_searcher.search_df(q, limit=12)[0].collect())
            for q in queries
        }
        fan = {
            q: best_of(
                lambda q=q: sharded_search(shard_searchers, q, page_limit=12, **kw)
            )
            for q in queries
        }
        per_shard = {
            q: [
                best_of(lambda s=s, q=q: s.search(q, limit=3, **kw), reps=2)
                for s in shard_searchers
            ]
            for q in queries
        }
        return {
            "n_shards": n_shards,
            "single_sec": {q: round(v, 4) for q, v in single.items()},
            "scatter_gather_sec": {q: round(v, 4) for q, v in fan.items()},
            "per_shard_max_sec": {
                q: round(max(v), 4) for q, v in per_shard.items()
            },
            "per_shard_sum_sec": {
                q: round(sum(v), 4) for q, v in per_shard.items()
            },
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _bench_sf1(spark, cpus: int) -> dict:
    """One-shot large-corpus section (`extra.sf1`): a 10x-sf0.1 corpus
    (50k docs / 20k embeddings / deterministic near-dup structure) derived
    in-process by tools/gen_big_sf.ensure (cached under .bigsf/, gitignored).
    Catches plan behaviors that only appear past toy sizes — broadcast-
    threshold flips, partition-count effects, stage-constant vs data-bound
    costs. One trial (the round-over-round statistic stays the interleaved
    sf0.1 suite above); the by-design-exhaustive O(n^2) oracles are
    excluded — their linear scale paths (minhash-LSH, banded embedding
    LSH) are what runs here."""
    from pyspark.sql import functions as F

    from letarette_spark.analysis.tokenizer import AnalyzerConfig
    from letarette_spark.functions.dedup import minhash_lsh_pairs, simhash64
    from letarette_spark.functions.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_index_topk,
        ivf_index_write,
    )
    from letarette_spark.functions.simple_text import bm25_scores
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from tools.gen_big_sf import ensure

    sf1_dir = ensure(spark)
    documents = (
        spark.read.parquet(os.path.join(sf1_dir, "documents.parquet"))
        .repartition(cpus).cache()
    )
    embeddings = spark.read.parquet(
        os.path.join(sf1_dir, "embeddings.parquet"))
    ndocs = documents.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        return out

    engine_docs = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("lang").alias("space"),
        F.col("source").alias("title"),
        F.col("text").alias("body"),
        F.lit(True).alias("alive"),
    )
    root = tempfile.mkdtemp(prefix="letarette_bench_sf1_idx_")
    ivf_dir = tempfile.mkdtemp(prefix="letarette_bench_sf1_ivf_")
    try:
        timed(
            "index_build",
            lambda: build_index(
                spark, engine_docs, root,
                config=AnalyzerConfig(mode="porter"),
                n_build_partitions=cpus, chunk_size=cpus,
            ),
        )
        searcher = Searcher(Index.open(spark, root))
        for name, q in [
            ("engine_single", "value"),
            ("engine_near", "key value"),
            ("engine_wildcard", "val*"),
        ]:
            # warm once (file listings), then time
            searcher.search_df(q, limit=10)[0].collect()
            timed(name, lambda q=q: searcher.search_df(q, limit=10)[0].collect())
        timed(
            "bm25_topk_simple",
            lambda: bm25_scores(documents, ["key", "value"])
            .orderBy(F.desc("score")).limit(10).collect(),
        )
        timed(
            "minhash_lsh_pairs",
            lambda: minhash_lsh_pairs(
                documents, bands=4, rows_per_band=2, n=3, threshold=0.05
            ).count(),
        )
        timed("simhash", lambda: simhash64(documents).count())
        from letarette_spark.functions.lm_score import lm_perplexity

        timed("lm_perplexity", lambda: lm_perplexity(documents).count())
        from letarette_spark.functions.html import html_to_text

        # sum(length) forces the regex chain to actually run (a bare
        # count() would let Catalyst prune the projection away)
        timed(
            "html_text",
            lambda: documents.select(
                html_to_text(
                    F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
                ).alias("t")
            ).agg(F.sum(F.length("t"))).collect(),
        )
        from letarette_spark.functions.bpe import bpe_train

        timed(
            "bpe_train_32",
            lambda: bpe_train(documents, n_merges=32, batch=8),
        )
        timed(
            "knn_cosine",
            lambda: cosine_topk(embeddings, query_id=0, k=5).collect(),
        )
        cents = timed(
            "ivf_build",
            lambda: (
                lambda c: (ivf_index_write(embeddings, ivf_dir, c), c)[1]
            )(ivf_centroids(embeddings, n_cells=16, n_iter=1)),
        )
        qvec = [
            float(x)
            for x in embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        timed(
            "ann_ivf_indexed",
            lambda: ivf_index_topk(
                spark, ivf_dir, qvec, cents, k=5, nprobe=4
            ).collect(),
        )
    finally:
        documents.unpersist()
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(ivf_dir, ignore_errors=True)
    return {
        "ndocs": ndocs,
        "sf1_dir": sf1_dir,
        "build_docs_per_sec": round(ndocs / timings["index_build"], 2),
        "queries": timings,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", 3)))

    from letarette_spark.session import get_spark

    spark = get_spark(app_name="letarette_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from letarette_spark.analysis.tokenizer import AnalyzerConfig
    from letarette_spark.functions.dedup import (
        jaccard_pairs,
        lsh_embedding_duplicate_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
        simhash64,
    )
    from letarette_spark.functions.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
    )
    from letarette_spark.functions.simple_text import bm25_scores
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher

    docs_path = os.path.join(sf_dir, "documents.parquet")
    # single-file parquet -> one input split; rebalance across cores before
    # the CPU-bound text work (a real corpus would arrive as many files).
    documents = spark.read.parquet(docs_path).repartition(cpus).cache()
    embeddings = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ndocs = documents.count()

    engine_docs = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("lang").alias("space"),
        F.col("source").alias("title"),
        F.col("text").alias("body"),
        F.lit(True).alias("alive"),
    )

    # IVF centroids trained once + the corpus materialized in the
    # cell-partitioned layout (both build-side costs, like the index
    # build below). Two query-side numbers each trial:
    #   ann_ivf          — in-memory probe: recomputes the 16-cosine
    #                      cell assignment per row, so it does MORE
    #                      per-row work than knn_cosine's exact scan
    #                      (only the final scoring set shrinks)
    #   ann_ivf_indexed  — the actual scale path: directory-pruned scan
    #                      of the materialized cells (reads
    #                      ~nprobe/n_cells of the bytes at any size)
    from letarette_spark.functions.similarity import (
        ivf_index_topk,
        ivf_index_write,
    )

    ivf_cents = ivf_centroids(embeddings, n_cells=16, n_iter=1)
    ivf_dir = tempfile.mkdtemp(prefix="letarette_bench_ivf_")
    ivf_index_write(embeddings, ivf_dir, ivf_cents)
    ivf_qvec = [
        float(x)
        for x in embeddings.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    # PQ: codebooks trained once (build-side, like centroids); per-trial
    # queries score the ~4-byte codes via the ADC literal-LUT plan
    from letarette_spark.functions.pq import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks,
    )

    pq_books = pq_codebooks(embeddings, m=8, k=16, n_iter=1)
    from letarette_spark.functions.pq import pq_index_topk, pq_index_write

    pq_dir = tempfile.mkdtemp(prefix="letarette_bench_pq_")
    pq_index_write(embeddings, pq_dir, ivf_cents, pq_books)

    trial_timings: list[dict[str, float]] = []
    load_samples: list[float] = [_load_avg()]
    lat: list[float] = []
    roots: list[str] = []

    try:
        for t in range(trials):
            timings: dict[str, float] = {}
            trial_timings.append(timings)

            def timed(name, fn):
                t0 = time.perf_counter()
                out = fn()
                timings[name] = round(time.perf_counter() - t0, 4)
                return out

            # fresh root per trial: rebuilding into an existing root would
            # RESUME (skip all chunks) and fake a near-zero build time
            root = tempfile.mkdtemp(prefix=f"letarette_bench_idx_{t}_")
            roots.append(root)
            timed(
                "index_build",
                lambda: build_index(
                    spark, engine_docs, root,
                    config=AnalyzerConfig(mode="porter"),
                    n_build_partitions=max(4, cpus // 2),
                    chunk_size=max(4, cpus // 2),  # single chunk: throughput
                ),
            )
            idx = Index.open(spark, root)
            searcher = Searcher(idx)

            for name, q in [
                ("engine_single", "value"),
                ("engine_near", "key value"),
                ("engine_not", "table -key"),
                ("engine_phrase", '"key value"'),
                ("engine_wildcard", "val*"),
            ]:
                timed(name, lambda q=q: searcher.search_df(q, limit=10)[0].collect())

            timed(
                "bm25_topk_simple",
                lambda: bm25_scores(documents, ["key", "value"])
                .orderBy(F.desc("score")).limit(10).collect(),
            )
            timed(
                "minhash_signatures",
                lambda: minhash_signatures(documents, k=8).count(),
            )
            timed(
                "jaccard_pairs",
                lambda: jaccard_pairs(documents, n=3, threshold=0.05).count(),
            )
            timed(
                "knn_cosine",
                lambda: cosine_topk(embeddings, query_id=0, k=5).collect(),
            )
            timed(
                "ann_ivf",
                lambda: ivf_topk(
                    embeddings, query_id=0, k=5, nprobe=4, centroids=ivf_cents
                ).collect(),
            )
            timed(
                "ann_ivf_indexed",
                lambda: ivf_index_topk(
                    spark, ivf_dir, ivf_qvec, ivf_cents, k=5, nprobe=4
                ).collect(),
            )
            timed(
                "pq_adc",
                lambda: pq_adc_topk(
                    embeddings, query_id=0, codebooks=pq_books, k=5
                ).collect(),
            )
            timed(
                "ivf_pq",
                lambda: ivf_pq_topk(
                    embeddings, query_id=0, centroids=ivf_cents,
                    codebooks=pq_books, k=5, nprobe=4,
                ).collect(),
            )
            timed(
                "ivf_pq_indexed",
                lambda: pq_index_topk(
                    spark, pq_dir, ivf_qvec, ivf_cents, pq_books,
                    k=5, nprobe=4, exclude_id=0,
                ).collect(),
            )
            timed(
                "minhash_lsh_pairs",
                lambda: minhash_lsh_pairs(
                    documents, bands=4, rows_per_band=2, n=3, threshold=0.05
                ).count(),
            )
            timed(
                "lsh_embedding_dups",
                lambda: lsh_embedding_duplicate_pairs(
                    embeddings, threshold=0.3, bands=2, planes_per_band=4, dim=64
                ).count(),
            )
            timed("simhash", lambda: simhash64(documents).count())
            from letarette_spark.functions.html import html_to_text

            # sum(length) forces the regex chain to run (a bare count()
            # would let Catalyst prune the projection away)
            timed(
                "html_text",
                lambda: documents.select(
                    html_to_text(
                        F.concat(
                            F.lit("<p>"), F.col("text"), F.lit("</p>")
                        )
                    ).alias("t")
                ).agg(F.sum(F.length("t"))).collect(),
            )

            # batch retrieval: 32 queries resolved in ONE job (the offline
            # fan-in path, query/batch.py) — compare against 32× the warm
            # per-query latency below to see the amortization
            from letarette_spark.query.batch import search_batch

            words = [
                "value", "key", "table", "index", "parser", "buffer",
                "token", "query", "search", "document", "config",
                "handler", "client", "server", "worker", "shard",
            ]
            batch_qs = words + [
                f"{a} {b}" for a, b in zip(words, words[1:] + words[:1])
            ]
            timed(
                "batch_search_32q",
                lambda: search_batch(searcher, batch_qs, limit=10).count(),
            )

            # benchmark decontamination: one corpus scan + broadcast
            # semi-join against a doc_id%20 'benchmark' slice
            from letarette_spark.functions.decontam import (
                decontamination_report,
            )

            timed(
                "decontam_report",
                lambda: decontamination_report(
                    documents.filter(F.col("doc_id") % 20 != 0),
                    documents.filter(F.col("doc_id") % 20 == 0),
                    n=8,
                ).count(),
            )

            # corpus-trained bigram-LM perplexity (train + score, one call)
            # and cross-document sequence packing (one window + one groupBy)
            from letarette_spark.functions.lm_score import lm_perplexity
            from letarette_spark.functions.packing import pack_sequences

            timed("lm_perplexity", lambda: lm_perplexity(documents).count())
            timed(
                "pack_sequences",
                lambda: pack_sequences(
                    documents, budget=128, n_groups=cpus
                ).count(),
            )

            # BPE tokenizer training (32 merges in symbol-disjoint batches
            # of 8 -> 4 vocab-table rounds after the one corpus scan) and
            # the Arrow-batched corpus re-encode with the learned merges
            from letarette_spark.functions.bpe import bpe_encode, bpe_train

            bpe_merges = timed(
                "bpe_train_32",
                lambda: bpe_train(documents, n_merges=32, batch=8),
            )
            timed(
                "bpe_encode",
                lambda: bpe_encode(documents, bpe_merges).count(),
            )

            # deterministic shard-shuffle training write (the final
            # pipeline stage): one hash shuffle + in-partition sort +
            # 32 ordered parquet shard files
            from letarette_spark.functions.sampling import (
                write_training_shards,
            )

            def _shard_write():
                out = tempfile.mkdtemp(prefix="bench_shards_")
                try:
                    write_training_shards(documents, out + "/s", 32)
                finally:
                    shutil.rmtree(out, ignore_errors=True)

            timed("shard_write_32", _shard_write)

            # data-selection ops: SemDeDup cell-scoped semantic dedup,
            # DSIR importance resampling, margin-denoised hard negatives,
            # URL canonicalization + URL-keyed dedup
            from letarette_spark.functions.dsir import dsir_sample
            from letarette_spark.functions.semdedup import semdedup_kept
            from letarette_spark.functions.similarity import hard_negatives
            from letarette_spark.functions.urls import url_dedup

            timed(
                "semdedup_kept",
                lambda: semdedup_kept(
                    embeddings, n_cells=16, threshold=0.3
                ).count(),
            )
            timed(
                "dsir_sample",
                lambda: dsir_sample(
                    documents, target_filter=F.col("lang") == "en",
                    k=min(ndocs // 10, 1000),
                ).count(),
            )
            timed(
                "hard_negatives",
                lambda: hard_negatives(
                    embeddings, query_ids=[0, 1, 2, 3, 4], k=5
                ).count(),
            )
            from letarette_spark.functions.bloom import incremental_dedup

            timed(
                "bloom_incr_dedup",
                lambda: incremental_dedup(
                    documents.filter(F.col("doc_id") % 3 == 0),
                    documents.filter(F.col("doc_id") % 2 == 0),
                    "text",
                ).count(),
            )
            timed(
                "url_dedup",
                lambda: url_dedup(
                    documents.select(
                        "doc_id",
                        F.concat(
                            F.lit("https://example.com/d/"),
                            (F.col("doc_id") % (ndocs // 2)).cast("string"),
                            F.lit("?utm_source=x&a=1"),
                        ).alias("url"),
                    )
                ).count(),
            )

            # query-latency distribution over warm repeats (reference lrload
            # reports mean/median/p90/p95/p99 — cmd/lrload/main.go:317-358)
            for _ in range(3):
                for q in ("value", "key value", "table -key", '"key value"'):
                    t0 = time.perf_counter()
                    searcher.search_df(q, limit=10)[0].collect()
                    lat.append(time.perf_counter() - t0)

            load_samples.append(_load_avg())
            # keep only the last trial's index on disk while running
            if len(roots) > 1:
                shutil.rmtree(roots.pop(0), ignore_errors=True)

        # ---- sharded scatter-gather (one-shot, after the trials): 4
        # shard clones of the last trial's index; latency must track the
        # slowest shard (concurrent scatter), not the sum ----
        sharded = _bench_sharded(spark, idx, searcher, n_shards=4)

        # ---- 10x-corpus sanity section (one-shot; skippable via env for
        # quick local iteration) ----
        sf1 = (
            _bench_sf1(spark, cpus)
            if os.environ.get("SPARK_GRAFT_SF1", "1") != "0"
            else None
        )
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)
        shutil.rmtree(ivf_dir, ignore_errors=True)
        shutil.rmtree(pq_dir, ignore_errors=True)
        spark.stop()

    # min across interleaved trials: the best number each operation reached
    # in ANY window is the least contention-biased estimate on this host
    best = {
        k: min(tt[k] for tt in trial_timings if k in tt)
        for k in trial_timings[0]
    }
    lat.sort()

    def pct(p: float) -> float:
        return round(lat[min(len(lat) - 1, int(p * len(lat)))], 4)

    latency = {
        "n": len(lat),
        "mean": round(sum(lat) / len(lat), 4),
        "p50": pct(0.50),
        "p90": pct(0.90),
        "p95": pct(0.95),
        "p99": pct(0.99),
    }

    total = round(sum(best.values()), 4)
    r01_set = (
        "index_build", "engine_single", "engine_near", "engine_not",
        "engine_phrase", "engine_wildcard", "bm25_topk_simple",
        "minhash_signatures", "jaccard_pairs", "knn_cosine",
    )
    result = {
        "metric": "index_build_plus_query_suite",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in best.items()},
        "sf": sf_dir,
        "extra": {
            "ndocs": ndocs,
            "build_docs_per_sec": round(ndocs / best["index_build"], 2),
            "cpus": cpus,
            "n_trials": trials,
            "trials": trial_timings,
            "load": load_samples,
            "query_latency": latency,
            "suite_r01_total": round(sum(best[k] for k in r01_set), 4),
            "batch_queries_per_sec": round(32 / best["batch_search_32q"], 2),
            "sharded": sharded,
            "sf1": sf1,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
