"""Duplicate clustering: connected components over near-dup pairs.

Verified against a driver-side union-find on crafted + seeded random
graphs (path graphs force the pointer-doubling acceleration to do real
work; random graphs sweep cluster shapes)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from letarette_spark.functions.dedup import (
    connected_components,
    drop_duplicates_by_pairs,
    duplicate_clusters,
)


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member per component
    comp_min: dict = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in parent}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "a: long, b: long")
    out = connected_components(df)
    return {r["id"]: r["component"] for r in out.collect()}


def test_components_crafted(spark):
    # two triangles bridged + an isolated pair + a 12-node path (worst
    # case for naive propagation: diameter >> 1)
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)]
    edges += [(100 + i, 101 + i) for i in range(11)]
    got = _spark_components(spark, edges)
    assert got == _union_find(edges)


def test_components_random(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _spark_components(spark, edges)
    assert got == _union_find(edges)


def test_near_dedup_end_to_end(spark):
    from pyspark.sql import Row

    from letarette_spark.functions.dedup import minhash_lsh_pairs, near_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        Row(doc_id=i, text=f"unique document {i} " + base + f" tail {i}")
        for i in range(10)
    ]
    # clones of doc 0 and of doc 3 (near-identical text -> LSH pairs)
    rows += [Row(doc_id=100, text=rows[0].text + " x"),
             Row(doc_id=101, text=rows[0].text + " y"),
             Row(doc_id=103, text=rows[3].text + " z")]
    docs = spark.createDataFrame(rows)
    kept = {r["doc_id"] for r in near_dedup(docs, threshold=0.5).collect()}
    # canonical (min id) survives each cluster; uniques pass through
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    losers = set()
    comp = _union_find([(r["a"], r["b"]) for r in pairs.collect()])
    losers = {x for x, c in comp.items() if x != c}
    assert losers  # the clones were actually paired
    assert kept == {r.doc_id for r in rows} - losers
    assert 100 not in kept and 101 not in kept and 103 not in kept


def test_mega_cluster_bounded_roster(spark):
    """A 50k-member cluster must not concentrate into one unbounded row:
    members is capped (smallest ids kept), size stays exact."""
    pairs = spark.range(1, 50001).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    out = duplicate_clusters(pairs, max_members=100).collect()
    assert len(out) == 1
    r = out[0]
    assert r["component"] == 0
    assert r["size"] == 50001
    members = r["members"].split(",")
    assert len(members) == 100
    assert set(members) == {str(i) for i in range(100)}  # the 100 smallest


def test_components_nonconvergence_raises(spark):
    """Exhausting max_iter without a fixpoint must fail loudly — silently
    returning unconverged labels would keep non-canonical duplicates."""
    import pytest

    edges = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_duplicate_clusters_and_drop(spark):
    edges = [(5, 9), (9, 2), (30, 31)]
    pairs = spark.createDataFrame(edges, "a: long, b: long")
    clusters = {
        r["component"]: (r["size"], r["members"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert clusters == {2: (3, "2,5,9"), 30: (2, "30,31")}

    docs = spark.range(0, 40).select(F.col("id").alias("doc_id"), F.lit("x").alias("text"))
    kept = drop_duplicates_by_pairs(docs, pairs)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # losers 5, 9, 31 dropped; canonical 2 and 30 kept; untouched docs kept
    assert kept_ids == set(range(40)) - {5, 9, 31}
