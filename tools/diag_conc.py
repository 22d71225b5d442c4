"""Diagnose the concurrent-Spark-worker slowdown on this host.

Round-5 finding: a single worker runs the query suite at ~1 s/query,
but 4 concurrent workers (own processes, own — even pinned — CPU sets)
each degrade 3.5-6x. Pure-CPU multiprocessing scales 3.3-4x on the same
box, so the collision is inside the Spark/JVM/IO stack, not the cores.
This harness isolates the layer:

  stage jvm:   each worker runs CPU-only spark.range aggregations
               (no file IO at all) -> tests Spark-JVM concurrency
  stage io:    each worker runs the engine query suite against its OWN
               COPY of the index -> removes same-inode sharing
  stage share: workers run against the SAME index dir (the replq shape)

Usage: python tools/diag_conc.py --ndocs 60000 [--workers 4] [--cpus 4]
Prints per-stage 1-worker vs N-worker wall (each worker same work).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker_jvm(cpus: int, reps: int) -> dict:
    from letarette_spark.session import get_spark

    spark = get_spark(app_name="diag_jvm", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    spark.range(0, 10**7, 1, cpus).selectExpr("sum(id * 2 + 1)").collect()
    t0 = time.perf_counter()
    for _ in range(reps):
        spark.range(0, 10**8, 1, cpus).selectExpr(
            "sum(id * 2 + 1) s", "avg(pmod(id, 97)) a").collect()
    wall = time.perf_counter() - t0
    spark.stop()
    return {"wall": round(wall, 3)}


def worker_query(cpus: int, index_dir: str, passes: int) -> dict:
    from letarette_spark.index.builder import Index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.session import get_spark

    suite = ["zephyr", "value", "key value", "table -key",
             '"error handler"', "val*"]
    spark = get_spark(app_name="diag_q", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    searcher = Searcher(Index.open(spark, index_dir))

    def run(q):
        df, _t, _c = searcher.search_df(q, limit=10)
        if df is not None:
            df.collect()

    for q in suite:
        run(q)
    t0 = time.perf_counter()
    for _ in range(passes):
        for q in suite:
            run(q)
    wall = time.perf_counter() - t0
    spark.stop()
    return {"wall": round(wall, 3)}


def spawn(stage: str, cpus: int, slot: int, extra: list[str]):
    cmd = ["taskset", "-c", f"{slot * cpus}-{(slot + 1) * cpus - 1}",
           sys.executable, os.path.abspath(__file__),
           "--run-worker", stage, "--cpus", str(cpus)] + extra
    return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def collect(procs):
    out = []
    for p in procs:
        o, e = p.communicate(timeout=3600)
        lines = [l for l in o.splitlines() if l.startswith("RESULT ")]
        if not lines:
            print(o[-800:], e[-800:], file=sys.stderr)
            raise RuntimeError("worker failed")
        out.append(json.loads(lines[-1][len("RESULT "):]))
    return [r["wall"] for r in out]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-worker")
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--index")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--ndocs", type=int, default=60000)
    args = ap.parse_args()

    if args.run_worker == "jvm":
        print("RESULT " + json.dumps(worker_jvm(args.cpus, args.reps)))
        return
    if args.run_worker == "query":
        print("RESULT " + json.dumps(
            worker_query(args.cpus, args.index, args.passes)))
        return

    from letarette_spark.analysis.tokenizer import AnalyzerConfig
    from letarette_spark.index.builder import build_index
    from letarette_spark.session import get_spark
    from letarette_spark.sources.corpus import docs_from_corpus, generate_corpus

    work = tempfile.mkdtemp(prefix="diag_conc_")
    idx = os.path.join(work, "idx0")
    spark = get_spark(app_name="diag_gen", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = generate_corpus(spark, args.ndocs, seed=42, partitions=64)
    build_index(spark, docs_from_corpus(corpus), idx,
                config=AnalyzerConfig(mode="porter"),
                n_build_partitions=16, chunk_size=16, files_per_chunk=16)
    spark.stop()
    copies = [idx]
    for i in range(1, args.workers):
        dst = os.path.join(work, f"idx{i}")
        shutil.copytree(idx, dst)
        copies.append(dst)

    res = {}
    try:
        for stage, extra_of in (
            ("jvm", lambda i: ["--reps", str(args.reps)]),
            ("io", lambda i: ["--index", copies[i], "--passes", str(args.passes)]),
            ("share", lambda i: ["--index", idx, "--passes", str(args.passes)]),
        ):
            st = "query" if stage in ("io", "share") else stage
            one = collect([spawn(st, args.cpus, 0, extra_of(0))])[0]
            many = max(collect([
                spawn(st, args.cpus, i, extra_of(i))
                for i in range(args.workers)
            ]))
            res[stage] = {
                "wall_1worker": one,
                "wall_concurrent_max": many,
                "degradation": round(many / one, 2),
                "loadavg": round(os.getloadavg()[0], 1),
            }
            print(stage, json.dumps(res[stage]), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"metric": "diag_conc", **res}))


if __name__ == "__main__":
    main()
