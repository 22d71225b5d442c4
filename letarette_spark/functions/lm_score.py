"""Corpus-trained n-gram language-model scoring — the CCNet-style quality
signal of a training-data pipeline (Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data": rank documents by LM
perplexity; low-perplexity ≈ fluent text, high ≈ boilerplate/garble).

CCNet uses a pretrained KenLM; this sandbox has no model artifacts, so the
model is trained ON THE CORPUS ITSELF (self-perplexity): an add-k-smoothed
word-bigram LM over simple-analyzer tokens. That keeps the operator fully
deterministic (an exact DuckDB twin gates it) while preserving the shape a
production deployment would have — swap the `model` DataFrame for one
loaded from a pretrained table and the scoring join is unchanged.

Scale shape (the part that must survive 100 TB):
- training = one explode + one partial-agg shuffle keyed by bigram (the
  context table derives from the bigram table, no second corpus scan);
- scoring = hash joins keyed by (w1,w2) then w1 — linear, AQE-skew-safe
  (the head of the bigram distribution is exactly the skewed-join case
  AQE splits), followed by one per-doc aggregation;
- no Python anywhere: token split, bigram zip, log2 arithmetic are all
  whole-stage-codegen column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array

DEFAULT_ADD_K = 0.5


def bigram_events(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, document order.
    Documents with fewer than two tokens emit nothing (they get NULL
    perplexity downstream — nothing to score, not "perfect score")."""
    arr = token_array(text_col)
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def train_bigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Corpus bigram model: (bigram counts, context counts, vocab size).

    Context counts come from the bigram table itself (count of w1 as a
    context), so P(.|w1) normalizes exactly over observed continuations;
    V counts every distinct token (including document-final tokens that
    never open a bigram) — the smoothing denominator must cover every
    possible continuation."""
    ev = bigram_events(df, id_col, text_col)
    m2 = ev.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    m1 = m2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        df.select(F.explode(token_array(text_col)).alias("t"))
        .agg(F.countDistinct("t"))
        .collect()[0][0]
    )
    return m2, m1, int(vocab or 0)


def lm_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = DEFAULT_ADD_K,
    round_to: int | None = 6,
    persist_events: bool = False,
) -> DataFrame:
    """(id, n_bigrams, entropy, perplexity) per document.

    entropy = -(1/m) * sum log2 P(w2|w1) over the document's m bigrams
    with P = (c2 + k) / (c1 + k*V); perplexity = 2^entropy. Documents
    with < 2 tokens carry NULLs. ``round_to`` stabilizes the float tail
    for cross-engine value hashing (same convention as bm25_topk).

    The bigram-event lineage feeds both model training and scoring.
    ``persist_events`` caches the exploded events between the two (and
    the vocab count rides the token scan either way): worth it when the
    corpus re-scan (tokenize + explode) costs more than storing ~one row
    per token — usually true up to memory scale, NOT at 100 TB, where
    recomputing the narrow explode beats spilling it; hence opt-in."""
    ev = bigram_events(df, id_col, text_col)
    if persist_events:
        ev = ev.persist()
    try:
        m2 = ev.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
        m1 = m2.groupBy("w1").agg(F.sum("c2").alias("c1"))
        vocab = int(
            df.select(F.explode(token_array(text_col)).alias("t"))
            .agg(F.countDistinct("t"))
            .collect()[0][0]
            or 0
        )
        logp = F.log2(
            (F.col("c2") + F.lit(add_k))
            / (F.col("c1") + F.lit(add_k) * F.lit(float(vocab)))
        )
        scored = (
            ev.join(m2, ["w1", "w2"])  # inner: every event is in the model
            .join(m1, ["w1"])
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                (-F.avg(logp)).alias("entropy"),
            )
            .withColumn("perplexity", F.pow(F.lit(2.0), F.col("entropy")))
        )
        out = df.select(id_col).join(scored, [id_col], "left").select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "entropy",
            "perplexity",
        )
        if round_to is not None:
            out = out.select(
                id_col,
                "n_bigrams",
                F.round("entropy", round_to).alias("entropy"),
                F.round("perplexity", round_to).alias("perplexity"),
            )
        if persist_events:
            return out.localCheckpoint()  # narrow per-doc frame
        return out
    finally:
        if persist_events:
            ev.unpersist()
