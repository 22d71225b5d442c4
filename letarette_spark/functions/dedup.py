"""Deduplication operators for large-scale training-data pipelines.

All operators are DataFrame-native; hashing is md5/sha2 (identical builtin
in Spark and ANSI-SQL engines, so every deterministic step is oracle-
checkable). Scale notes per operator inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content hash: (text_hash, n, members).

    Scale: a single groupBy on the hash — map-side partial agg, AQE handles
    the (rare) giant duplicate-cluster key."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col(id_col).cast("string")))
            ).alias("members"),
        )
        .filter(F.col("n") > 1)
    )


def shingles(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, shingle) — distinct n-gram token shingles per document, built
    with JVM array intrinsics (transform over a token array), no UDF."""
    arr = token_array(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) for document pairs with n-gram Jaccard >= threshold.

    Scale: the shingle self-join explodes on high-frequency shingles
    (quadratic per shingle); *max_shingle_df* drops shingles appearing in
    more than that many docs before pairing — standard df-cut used by
    near-dup pipelines. At web scale prefer minhash_lsh_pairs (candidate
    generation is linear in docs) and use this only to verify candidates."""
    sh = shingles(df, n, id_col, text_col)
    if max_shingle_df is not None:
        w = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
        sh = sh.join(F.broadcast(w.filter(F.col("sdf") <= max_shingle_df)), "shingle").drop("sdf")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("double").alias("i"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (F.col("i") / (F.col("sa") + F.col("sb") - F.col("i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) — k-permutation MinHash where permutation i is
    min over shingles of md5(shingle || '#' || i). md5-as-permutation keeps
    the signature bit-identical across engines (oracle-checkable) and
    deterministic across cluster sizes.

    Scale: one groupBy(id) with k mins — partial-aggregable, no skew."""
    sh = shingles(df, n, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat_ws("#", F.col("shingle"), F.lit(str(i))))).alias(f"sig_{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash banding: docs sharing any band bucket are
    candidates; candidates are verified with the true n-gram Jaccard.

    Scale: candidate generation is groupBy(band_hash) — linear in corpus
    size; only bucket-colliding pairs pay the verification join. This is
    the 100TB-path for near-dup; jaccard_pairs is the exhaustive oracle."""
    k = bands * rows_per_band
    sigs = minhash_signatures(df, k, n, id_col, text_col)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(bnd)),
                *[F.col(f"sig_{bnd * rows_per_band + r}") for r in range(rows_per_band)],
            )
        ).alias(f"band_{bnd}")
        for bnd in range(bands)
    ]
    banded = sigs.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band_{bnd}") for bnd in range(bands)])).alias("bucket"),
    )
    l = stacked.select(F.col(id_col).alias("a"), "bucket")
    r = stacked.select(F.col(id_col).alias("b"), "bucket")
    cand = l.join(r, "bucket").filter(F.col("a") < F.col("b")).select("a", "b").distinct()

    verified = jaccard_pairs(df, n, threshold, id_col, text_col)
    return cand.join(verified, ["a", "b"], "inner")


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash) 64-bit SimHash over term frequencies.

    Bits come from xxhash64(term); each bit position accumulates +tf/-tf and
    the sign forms the fingerprint. Pure JVM bit arithmetic: explode terms,
    aggregate per (id, bit)."""
    toks = df.select(
        F.col(id_col), F.explode(token_array(text_col)).alias("term")
    ).groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    toks = toks.withColumn("h", F.xxhash64("term"))
    bits = toks.select(
        F.col(id_col),
        F.col("tf"),
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        "h",
    ).withColumn(
        "contrib",
        F.when(F.expr("(h & shiftleft(1L, bit)) != 0"), F.col("tf")).otherwise(
            -F.col("tf")
        ),
    )
    per_bit = bits.groupBy(id_col, "bit").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("simhash")
    )


def embedding_duplicate_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) embedding near-dup pairs by cosine >= threshold.

    Exhaustive O(n^2) — correct but only for modest n; the scale path
    buckets by LSH first (similarity.lsh_cosine_candidates)."""
    from letarette_spark.functions.similarity import cosine_expr

    a = emb.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"))
    b = emb.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", cosine_expr("va", "vb").alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
