"""Wildcard-latency micro-bench: prefix aggregates vs dictionary expansion.

Evidence for the round-4 'close the last unpruned scan' task: wildcard
latency through the build-time prefix aggregates must stay FLAT as the
vocabulary grows, while the expansion fallback (an index built with
prefix_lengths=()) grows with it — and above MAX_PREFIX_EXPANSION (4096)
distinct completions the fallback degrades to a postings-wide scan, which
the aggregates never do.

The synthetic corpus pins document count and tokens/doc while scaling the
number of DISTINCT terms, with first-2-char skew (16 two-char stems) so a
2-char prefix's completion count crosses 4096 between the two sizes.

Usage: python tools/bench_prefix.py [--vocabs 60000,240000] [--docs 12000]
       [--cpus 8] [--reps 3]

Writes nothing; prints a markdown table to merge into SCALING.md.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEMS = [a + b for a, b in zip("abcdefghijklmnop", "bacadaeafagahaiaj")][:16]


def make_vocab(v: int, rng: random.Random) -> list[str]:
    vocab: set[str] = set()
    while len(vocab) < v:
        stem = rng.choice(STEMS)
        tail = "".join(rng.choices(string.ascii_lowercase, k=rng.randint(4, 7)))
        vocab.add(stem + tail)
    return sorted(vocab)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocabs", default="60000,240000")
    ap.add_argument("--docs", type=int, default=12000)
    ap.add_argument("--tokens-per-doc", type=int, default=50)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    vocab_sizes = [int(x) for x in args.vocabs.split(",")]

    from pyspark.sql import functions as F

    from letarette_spark.analysis.tokenizer import AnalyzerConfig
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import MAX_PREFIX_EXPANSION, Searcher
    from letarette_spark.session import get_spark

    spark = get_spark(
        app_name="bench_prefix", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = AnalyzerConfig(mode="simple")
    query_prefix = STEMS[0]  # 2-char covered-length wildcard

    print(f"| vocab | expansion({query_prefix}*) | prefix-agg s (min of {args.reps}) "
          f"| expansion-path s (min of {args.reps}) | over cap? |")
    print("|---|---|---|---|---|")
    for v in vocab_sizes:
        rng = random.Random(42)
        vocab = make_vocab(v, rng)
        rows = [
            (
                f"d{i}",
                "main",
                "",
                " ".join(rng.choice(vocab) for _ in range(args.tokens_per_doc)),
                True,
            )
            for i in range(args.docs)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id string, space string, title string, body string, alive boolean"
        ).repartition(args.cpus).cache()
        docs.count()

        roots, searchers = [], {}
        for kind, plens in (("agg", (2, 3, 4)), ("plain", ())):
            root = tempfile.mkdtemp(prefix=f"pfxbench_{kind}_")
            roots.append(root)
            build_index(
                spark, docs, root, config=cfg,
                n_build_partitions=args.cpus, chunk_size=args.cpus,
                prefix_lengths=plens,
            )
            searchers[kind] = Searcher(Index.open(spark, root, cfg))

        expansion = (
            searchers["agg"].index.term_stats()
            .filter(F.col("term").startswith(query_prefix))
            .count()
        )

        timings = {}
        for kind in ("agg", "plain"):
            s = searchers[kind]
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                df, total, _ = s.search_df(query_prefix + "*", limit=10)
                df.collect()
                best = min(best, time.perf_counter() - t0)
            timings[kind] = best

        print(
            f"| {v} | {expansion} | {timings['agg']:.3f} | {timings['plain']:.3f} "
            f"| {'YES' if expansion > MAX_PREFIX_EXPANSION else 'no'} |"
        )
        docs.unpersist()
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
