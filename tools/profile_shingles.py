"""Scratch profiler: stage-by-stage cost of the shingle pipeline at a
given SF dir (guide §1.4 noop-sink isolation). NOT part of the bench.

Usage: python tools/profile_shingles.py --sf /root/repo/.bigsf/sf1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from letarette_spark.session import get_spark
    from letarette_spark.functions.simple_text import token_array
    from letarette_spark.functions.dedup import (
        _shingle_array_expr,
        _sig_cols,
        shingle_arrays,
    )

    spark = get_spark(app_name="profile_shingles",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(args.sf, "documents.parquet"))
        .repartition(args.cpus).cache()
    )
    n = docs.count()
    print(f"ndocs={n}")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn):
        best = float("inf")
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best:.3f}s")
        return best

    arr = token_array("text")
    timed("0_scan_only", lambda: noop(docs.select("doc_id")))
    timed("1_tokens", lambda: noop(docs.select("doc_id", arr.alias("t"))))
    timed("1b_ntokens", lambda: noop(docs.select("doc_id", F.size(arr).alias("s"))))
    # shingles without distinct
    idx = F.when(F.size(arr) >= 3, F.sequence(F.lit(0), F.size(arr) - 3)).otherwise(
        F.array().cast("array<int>")
    )
    sh_nd = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(3)]
        ),
    )
    timed("2_shingles_nodistinct", lambda: noop(docs.select("doc_id", sh_nd.alias("sh"))))
    timed("3_shingles_distinct", lambda: noop(
        docs.select("doc_id", _shingle_array_expr("text", 3).alias("sh"))))
    sh_arr = shingle_arrays(docs, 3)
    timed("4_sigs_k8", lambda: noop(
        sh_arr.filter(F.size("_sh") > 0).select("doc_id", *_sig_cols(F.col("_sh"), 8))))
    # exploded volume
    timed("5_explode_count", lambda: sh_arr.select(
        F.explode("_sh")).count())
    # hash the shingles (candidate-join key narrowing)
    timed("6_explode_hash", lambda: noop(
        sh_arr.select(F.col("doc_id"), F.explode("_sh").alias("s"))
        .select("doc_id", F.xxhash64("s").alias("h"))))
    spark.stop()


if __name__ == "__main__":
    main()
