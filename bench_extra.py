"""Per-operator isolation bench (guide §1.4) — NOT the driver metric.

Times individual operators from bench.py's suite with the same arguments,
each labeled (setJobDescription) and terminated the same way bench.py
terminates them (collect/count), plus optional noop-sink runs and
.explain("formatted") capture to plans/<dir>/<op>_<suffix>.txt.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 --ops semdedup_kept,pq_adc \
      --plans plans/r06 --suffix before --trials 2

Prints one JSON line {"op": sec, ...} (min of trials).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--ops", default="")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from letarette_spark.session import get_spark

    spark = get_spark(app_name="letarette_bench_extra",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    documents = (
        spark.read.parquet(os.path.join(args.sf, "documents.parquet"))
        .repartition(args.cpus).cache()
    )
    embeddings = spark.read.parquet(
        os.path.join(args.sf, "embeddings.parquet"))
    ndocs = documents.count()

    from letarette_spark.functions.dedup import (
        jaccard_pairs,
        lsh_embedding_duplicate_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
        simhash64,
    )
    from letarette_spark.functions.pq import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks,
    )
    from letarette_spark.functions.semdedup import semdedup_kept
    from letarette_spark.functions.similarity import (
        cosine_topk,
        hard_negatives,
        ivf_centroids,
        ivf_topk,
    )

    ivf_cents = ivf_centroids(embeddings, n_cells=16, n_iter=1)
    pq_books = pq_codebooks(embeddings, m=8, k=16, n_iter=1)

    # (name, df_factory, terminal) — terminal mirrors bench.py
    def dsub(m):  # doc_id % m slices used by bloom bench
        return documents.filter(F.col("doc_id") % m == 0)

    from letarette_spark.functions.bloom import incremental_dedup
    from letarette_spark.functions.lm_score import lm_perplexity
    from letarette_spark.functions.packing import pack_sequences
    from letarette_spark.functions.dsir import dsir_sample

    ops: dict[str, tuple] = {
        "semdedup_kept": (
            lambda: semdedup_kept(embeddings, n_cells=16, threshold=0.3),
            "count",
        ),
        "lsh_embedding_dups": (
            lambda: lsh_embedding_duplicate_pairs(
                embeddings, threshold=0.3, bands=2, planes_per_band=4, dim=64
            ),
            "count",
        ),
        "jaccard_pairs": (
            lambda: jaccard_pairs(documents, n=3, threshold=0.05),
            "count",
        ),
        "minhash_signatures": (
            lambda: minhash_signatures(documents, k=8),
            "count",
        ),
        "minhash_lsh_pairs": (
            lambda: minhash_lsh_pairs(
                documents, bands=4, rows_per_band=2, n=3, threshold=0.05
            ),
            "count",
        ),
        "simhash": (lambda: simhash64(documents), "count"),
        "knn_cosine": (
            lambda: cosine_topk(embeddings, query_id=0, k=5), "collect"),
        "ann_ivf": (
            lambda: ivf_topk(
                embeddings, query_id=0, k=5, nprobe=4, centroids=ivf_cents
            ),
            "collect",
        ),
        "pq_adc": (
            lambda: pq_adc_topk(
                embeddings, query_id=0, codebooks=pq_books, k=5
            ),
            "collect",
        ),
        "ivf_pq": (
            lambda: ivf_pq_topk(
                embeddings, query_id=0, centroids=ivf_cents,
                codebooks=pq_books, k=5, nprobe=4,
            ),
            "collect",
        ),
        "hard_negatives": (
            lambda: hard_negatives(
                embeddings, query_ids=[0, 1, 2, 3, 4], k=5
            ),
            "count",
        ),
        "bloom_incr_dedup": (
            lambda: incremental_dedup(
                documents.filter(F.col("doc_id") % 3 == 0),
                documents.filter(F.col("doc_id") % 2 == 0),
                "text",
            ),
            "count",
        ),
        "lm_perplexity": (lambda: lm_perplexity(documents), "count"),
        "pack_sequences": (
            lambda: pack_sequences(documents, budget=128, n_groups=args.cpus),
            "count",
        ),
        "dsir_sample": (
            lambda: dsir_sample(
                documents, target_filter=F.col("lang") == "en",
                k=min(ndocs // 10, 1000),
            ),
            "count",
        ),
    }

    # lazy (eager_cleanup=False) twins used ONLY for plan capture: the
    # timed factories localCheckpoint, which truncates .explain to a
    # bare ExistingRDD scan
    plan_ops: dict = {
        "semdedup_kept": lambda: semdedup_kept(
            embeddings, n_cells=16, threshold=0.3, eager_cleanup=False
        ),
        "jaccard_pairs": lambda: jaccard_pairs(
            documents, n=3, threshold=0.05, eager_cleanup=False
        ),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(
            documents, bands=4, rows_per_band=2, n=3, threshold=0.05,
            eager_cleanup=False,
        ),
        "lsh_embedding_dups": lambda: lsh_embedding_duplicate_pairs(
            embeddings, threshold=0.3, bands=2, planes_per_band=4, dim=64,
            eager_cleanup=False,
        ),
    }

    wanted = [o for o in args.ops.split(",") if o] or list(ops)
    results: dict[str, float] = {}
    for name in wanted:
        factory, terminal = ops[name]
        if args.plans:
            factory_for_plan = plan_ops.get(name, factory)
            os.makedirs(args.plans, exist_ok=True)
            plan = factory_for_plan()._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
        best = float("inf")
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = factory()
            if terminal == "count":
                df.count()
            elif terminal == "collect":
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 4)
        print(f"# {name}: {results[name]}s", file=sys.stderr)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
