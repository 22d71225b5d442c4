"""Cross-document sequence packing — concatenate-and-cut batch prep for
LM pretraining (the standard "document packing" step: stream documents
back to back, emit fixed-budget token sequences; GPT-style pipelines pack
this way so no compute is wasted on padding).

Complements functions/chunking.py: chunking windows WITHIN one long
document; packing concatenates ACROSS short documents so every emitted
sequence (except each group's last) is exactly ``budget`` tokens.

Scale shape: documents are hash-assigned to ``n_groups`` independent pack
groups (each group is a self-contained serial token stream — the unit of
parallelism, so 4N executors pack 4x the groups); within a group, token
positions come from one window cumulative sum ordered by a deterministic
doc key, sequences from integer division of the global position. One
explode + one window shuffle + one groupBy shuffle, all JVM expressions —
no Python, no driver state. Deterministic and partition-independent:
group and order depend only on doc ids, never on input layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from letarette_spark.functions.simple_text import token_array


def pack_sequences(
    df: DataFrame,
    budget: int = 128,
    n_groups: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, seq_idx, n_tokens, n_docs, seq) — fixed-budget packed
    sequences.

    Within a pack group, documents are concatenated in ascending
    md5-key order (a stable shuffle of the corpus, so adjacent input docs
    don't systematically share a sequence; md5 rather than xxhash64 so
    the DuckDB oracle twin computes the identical key) and the token
    stream is cut every ``budget`` tokens. A document can straddle two
    sequences — that is packing's defining trade against chunking.
    n_docs counts the distinct documents contributing to the sequence.
    Zero-token documents contribute nothing."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1, got {n_groups}")

    # 32-bit md5 prefix (same identity as sampling.unit_hash * 2^32);
    # key collisions are tie-broken by the id itself in the order below
    key = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    toks = df.select(
        key.alias("__k"),
        F.col(id_col).alias("__id"),
        token_array(text_col).alias("__toks"),
    ).filter(F.size("__toks") > 0)
    toks = toks.select(
        F.pmod(F.col("__k"), F.lit(n_groups)).cast("int").alias("group"),
        "__k",
        "__id",
        "__toks",
        F.size("__toks").alias("__dl"),
    )
    # global token position of each doc's first token within its group:
    # exclusive prefix sum over the deterministic doc order. ROWS frame,
    # not the default RANGE: RANGE treats order-key ties (duplicate ids)
    # as frame peers and would hand both copies the same start position,
    # overfilling bins. With ROWS, duplicate-id rows order arbitrarily
    # between themselves but every row gets a distinct token range.
    w = (
        Window.partitionBy("group")
        .orderBy("__k", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = toks.withColumn(
        "__start", F.coalesce(F.sum("__dl").over(w) - F.col("__dl"), F.lit(0))
    )
    ev = toks.select(
        "group",
        "__id",
        F.posexplode("__toks").alias("__i", "tok"),
        "__start",
    ).select(
        "group",
        "__id",
        "tok",
        (F.col("__start") + F.col("__i")).alias("pos"),
    )
    ev = ev.withColumn("seq_idx", (F.col("pos") / budget).cast("long"))
    return (
        ev.groupBy("group", "seq_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct("__id").cast("long").alias("n_docs"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("seq"),
        )
        .select("group", "seq_idx", "n_tokens", "n_docs", "seq")
    )
