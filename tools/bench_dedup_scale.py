"""Dedup scale crossover: LSH (linear) vs exhaustive (quadratic) forms.

Times minhash_lsh_pairs vs jaccard_pairs (text) and
lsh_embedding_duplicate_pairs vs embedding_duplicate_pairs (vectors) on
synthetic corpora at two sizes (n and 4n), and reports the growth factor
of each. Linear paths should grow ~size-ratio; exhaustive forms grow
~quadratically (all-pairs cosine) or superlinearly (shingle self-join over
a zipfian vocabulary).

Corpora are synthesized DISTRIBUTED (spark.range + hash exprs — nothing
driver-side): zipfian word draws so shingles collide like real text, ~10%
near-dup clones (same base text + one extra token; identical vectors).

Run: python tools/bench_dedup_scale.py [--text-sizes 10000,40000]
     [--embed-sizes 5000,20000] [--cpus 32] [--rounds 2]
Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 80          # small + zipfian -> shingles genuinely collide
WORDS_PER_DOC = 60
DIM = 16
DUP_EVERY = 10      # every 10th doc is a near-dup clone of its predecessor


def synth_docs(spark: SparkSession, n: int) -> DataFrame:
    base = spark.range(n).withColumn(
        "base_id",
        F.when(F.col("id") % DUP_EVERY == 1, F.col("id") - 1).otherwise(F.col("id")),
    )
    # zipf-ish draw: square a uniform in [0,1) so low word-ids dominate
    # (head word ~11% of all tokens — heavy-tailed like real text, without
    # a single shingle degenerating to df ~ n/2)
    u = lambda j: (F.abs(F.xxhash64(F.col("base_id"), j)) % 100000) / 100000.0
    word = lambda j: F.concat(
        F.lit("w"), F.floor(u(j) * u(j) * VOCAB).cast("string")
    )
    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)), word), " "
    )
    text = F.when(
        F.col("id") % DUP_EVERY == 1,
        F.concat(text, F.lit(" uniq"), F.col("id").cast("string")),
    ).otherwise(text)
    return base.select(F.col("id").alias("doc_id"), text.alias("text"))


def synth_embeddings(spark: SparkSession, n: int) -> DataFrame:
    base = spark.range(n).withColumn(
        "base_id",
        F.when(F.col("id") % DUP_EVERY == 1, F.col("id") - 1).otherwise(F.col("id")),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            (F.abs(F.xxhash64(F.col("base_id"), j)) % 1000).cast("double") / 500.0
            - 1.0
        ),
    )
    return base.select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def timed(label: str, fn, rounds: int) -> tuple[float, int]:
    best, rows = float("inf"), -1
    for _ in range(rounds):
        t0 = time.monotonic()
        rows = fn().count()
        best = min(best, time.monotonic() - t0)
        print(f"  {label}: {best:.2f}s ({rows} rows)", file=sys.stderr)
    return round(best, 3), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--text-sizes", default="10000,40000")
    ap.add_argument("--embed-sizes", default="5000,20000")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    from letarette_spark.functions.dedup import (
        embedding_duplicate_pairs,
        jaccard_pairs,
        lsh_embedding_duplicate_pairs,
        minhash_lsh_pairs,
    )
    from letarette_spark.session import get_spark

    spark = get_spark(
        app_name="dedup_scale",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"cpus": args.cpus, "rounds": args.rounds, "text": {}, "embed": {}}

    # warm Python workers + codegen before timing (CLAUDE.md: cold-start
    # ~1s/worker would otherwise land entirely on the first measurement)
    w = synth_docs(spark, 200).persist()
    minhash_lsh_pairs(w, threshold=0.5).count()
    jaccard_pairs(w, threshold=0.5).count()
    w.unpersist()

    for n in [int(x) for x in args.text_sizes.split(",")]:
        docs = synth_docs(spark, n).persist()
        docs.count()  # timing excludes synthesis
        lsh_t, lsh_rows = timed(
            f"text n={n} minhash_lsh",
            lambda: minhash_lsh_pairs(docs, threshold=0.5), args.rounds
        )
        exh_t, exh_rows = timed(
            f"text n={n} jaccard_exhaustive",
            lambda: jaccard_pairs(docs, threshold=0.5), args.rounds
        )
        out["text"][n] = {
            "minhash_lsh_pairs_sec": lsh_t, "lsh_rows": lsh_rows,
            "jaccard_pairs_sec": exh_t, "exhaustive_rows": exh_rows,
        }
        docs.unpersist()

    for n in [int(x) for x in args.embed_sizes.split(",")]:
        emb = synth_embeddings(spark, n).persist()
        emb.count()
        lsh_t, lsh_rows = timed(
            f"embed n={n} lsh",
            lambda: lsh_embedding_duplicate_pairs(emb, threshold=0.95, dim=DIM),
            args.rounds,
        )
        exh_t, exh_rows = timed(
            f"embed n={n} exhaustive",
            lambda: embedding_duplicate_pairs(emb, threshold=0.95), args.rounds
        )
        out["embed"][n] = {
            "lsh_embedding_dups_sec": lsh_t, "lsh_rows": lsh_rows,
            "embedding_dups_sec": exh_t, "exhaustive_rows": exh_rows,
        }
        emb.unpersist()

    def growth(d: dict, key: str) -> float | None:
        ns = sorted(d)
        if len(ns) < 2 or d[ns[0]][key] == 0:
            return None
        return round(d[ns[1]][key] / d[ns[0]][key], 2)

    out["growth"] = {
        "size_ratio_text": max(out["text"]) / min(out["text"]) if out["text"] else None,
        "minhash_lsh": growth(out["text"], "minhash_lsh_pairs_sec"),
        "jaccard_exhaustive": growth(out["text"], "jaccard_pairs_sec"),
        "size_ratio_embed": max(out["embed"]) / min(out["embed"]) if out["embed"] else None,
        "embedding_lsh": growth(out["embed"], "lsh_embedding_dups_sec"),
        "embedding_exhaustive": growth(out["embed"], "embedding_dups_sec"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
