"""Deterministic sf1.0-equivalent dataset: the driver ships sf0.001/0.01/0.1
only, so plan behaviors that only appear at larger n (broadcast-threshold
flips, skew, partition-count effects) would go untested. This derives a
10x corpus from the read-only /root/testdata/sf0.1 tables — no external
data, no RNG: every derived row is a pure column expression of the source
row and its copy index, so the output row set is identical across runs
and parallelism levels (file layout may differ; results don't).

Key scheme: key' = key + copy * 10^9 keeps all FK relationships intact
per copy (orders.o_custkey lines up with customer.c_custkey, lineitem
with orders/part/supplier, events.user_id sessions stay user-disjoint
across copies).

Text/embedding perturbation (copy > 0 only): documents gain one synthetic
trailing token `c{copy}doc{doc_id%97}` so the 10 copies are near- but not
exact-duplicates (vocabulary grows, dedup operators see realistic
near-dup structure); embeddings get a deterministic sin()-noise nudge and
are re-normalized, so ANN neighborhoods are perturbed clones rather than
10-way cosine ties.

Usage: python tools/gen_big_sf.py [--src /root/testdata/sf0.1]
           [--out /root/repo/.bigsf/sf1] [--copies 10]

Output tables are Spark parquet DIRECTORIES named <table>.parquet (so
readers that accept either a file or a dir keep working; DuckDB readers
glob <dir>/*.parquet — tools/check_oracles.py handles both).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OFF = 10**9

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# key columns shifted by copy*OFF per table (FK-consistent across tables)
KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# tiny dims replicated as-is (single copy)
SINGLETONS = {"region", "nation"}


def scaled(df: DataFrame, table: str, copies: int) -> DataFrame:
    if table in SINGLETONS:
        return df
    spark = df.sparkSession
    cp = spark.range(copies).select(F.col("id").cast("int").alias("copy"))
    out = df.crossJoin(F.broadcast(cp))
    for k in KEY_SHIFTS.get(table, []):
        out = out.withColumn(k, F.col(k) + F.col("copy").cast("long") * OFF)
    if table == "documents":
        out = out.withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.concat(
                    F.col("text"), F.lit(" c"), F.col("copy").cast("string"),
                    F.lit("doc"), F.pmod(F.col("doc_id"), F.lit(97)).cast("string"),
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    if table == "embeddings":
        noisy = F.transform(
            F.col("embedding"),
            lambda x, i: x + F.lit(0.01) * F.sin(
                F.pmod(F.col("vec_id"), F.lit(997)).cast("double")
                + 7.0 * i.cast("double")
                + 13.0 * F.col("copy").cast("double")
            ),
        )
        norm = F.sqrt(
            F.aggregate(noisy, F.lit(0.0), lambda acc, x: acc + x * x)
        )
        renorm = F.transform(noisy, lambda x: (x / norm).cast("float"))
        out = out.withColumn(
            "embedding",
            F.when(F.col("copy") == 0, F.col("embedding")).otherwise(renorm),
        )
    return out.drop("copy").select(*df.columns)


DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bigsf", "sf1")


def generate(spark: SparkSession, src: str, out: str, copies: int = 10,
             quiet: bool = False) -> None:
    """Write the derived corpus under *out* (idempotent overwrite)."""
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        df = spark.read.parquet(sp)
        n_files = 1 if t in SINGLETONS else 16
        scaled(df, t, copies).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(dst)
        if not quiet:
            n = spark.read.parquet(dst).count()
            print(f"{t}: {n} rows -> {dst}")


def ensure(spark: SparkSession, src: str = "/root/testdata/sf0.1",
           out: str = DEFAULT_OUT, copies: int = 10) -> str:
    """Generate once, reuse across runs: .bigsf/ is gitignored scratch;
    a _COMPLETE stamp (copies+src) guards against half-written output."""
    stamp = os.path.join(out, "_COMPLETE")
    want = f"{os.path.abspath(src)}|copies={copies}|v1"
    if os.path.exists(stamp):
        with open(stamp) as f:
            if f.read() == want:
                return out
    generate(spark, src, out, copies, quiet=True)
    with open(stamp, "w") as f:
        f.write(want)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    from letarette_spark.session import get_spark

    spark: SparkSession = get_spark(
        app_name="gen_big_sf", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, args.src, args.out, args.copies)
    spark.stop()


if __name__ == "__main__":
    main()
