"""Corpus analytics: per-document TF-IDF keywords and PMI collocations.

Beyond-reference operators a corpus workflow runs next to the index:
keyword extraction feeds related-terms / more-like-this features and
corpus summaries; PMI collocations are the classic phrase-mining pass
(Church & Hanks 1990) used to seed tokenizer merge lists and
multi-word-expression dictionaries.

Scale shape:
- ``tfidf_keywords``: one corpus scan -> (doc, term, tf) partial-agg
  shuffle -> term df table (second partial agg, vocab-sized) -> hash
  join back (AQE handles skewed terms) -> per-doc top-k window keyed by
  doc (skew-free: a doc has ~doc_len distinct terms). The doc count is
  a broadcast 1-row frame, never a driver constant baked per-row.
- ``pmi_collocations``: adjacent-bigram events (zero-shuffle per-row
  zip_with) -> bigram partial-agg shuffle -> two vocab-sized joins to
  unigram counts -> global top-k. Everything after the first shuffle
  operates on vocab-sized tables.

Both use the simple analyzer (simple_text.token_array) so DuckDB twins
are exact: same tokens, same doubles (ln + round 6), same tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term, tf, score, rank) — top-k distinctive terms per doc by
    tf * ln(N/df), ties broken by term ascending. Smooth-less idf keeps
    the DuckDB twin trivially exact; terms present in every doc get
    idf 0 and fall out naturally."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(token_array(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.select(
        F.countDistinct(id_col).alias("n_docs")
    )  # 1-row broadcast frame
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    F.col("n_docs").cast("double")
                    / F.col("df").cast("double")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 30,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, n_ab, pmi) — top-k adjacent-token collocations by
    pointwise mutual information ln(p(a,b) / (p(a) p(b))), unigram
    probabilities over token events and bigram probability over bigram
    events, bigrams below *min_count* dropped (PMI is degenerate for
    rare pairs). Ties: pmi desc, a asc, b asc."""
    arr = token_array(text_col)
    n = F.greatest(F.size(arr) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(arr, 1, n),
        F.slice(arr, 2, n),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    uni = (
        df.select(F.explode(arr).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot_t = uni.select(F.sum("c").cast("double").alias("T"))
    bi_all = (
        df.select(F.explode(bigrams).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    # p(a,b) normalizes over ALL bigram events (Church & Hanks): summing
    # only the min_count survivors would inflate every pmi by
    # ln(B_all/B_frequent) and make scores depend on the cutoff
    tot_b = bi_all.select(F.sum("n_ab").cast("double").alias("B"))
    bi = bi_all.filter(F.col("n_ab") >= min_count)
    ua = uni.select(F.col("t").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("t").alias("b"), F.col("c").alias("c_b"))
    # tot_t/tot_b share lineage with uni/bi (self-join): qualify every
    # reference through explicit DataFrame aliases
    j = (
        bi.alias("bi")
        .join(ua.alias("ua"), F.col("bi.a") == F.col("ua.a"))
        .join(ub.alias("ub"), F.col("bi.b") == F.col("ub.b"))
        .crossJoin(F.broadcast(tot_t.alias("tt")))
        .crossJoin(F.broadcast(tot_b.alias("tb")))
    )
    return (
        j.select(
            F.col("bi.a").alias("a"),
            F.col("bi.b").alias("b"),
            F.col("bi.n_ab").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("bi.n_ab") / F.col("tb.B"))
                    / (
                        (F.col("ua.c_a") / F.col("tt.T"))
                        * (F.col("ub.c_b") / F.col("tt.T"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(k)
    )


__all__ = ["tfidf_keywords", "pmi_collocations"]
