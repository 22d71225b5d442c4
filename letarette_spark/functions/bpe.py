"""Distributed BPE tokenizer training — learning subword merges from the
corpus itself (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units", the byte-pair-encoding scheme used by GPT-2
and most modern pretraining tokenizers).

Beyond-reference operator: the reference engine counts tokens but never
*learns* a tokenizer; a training-data pipeline at 100 TB does — merges are
trained once over the corpus and then applied to every document.

Scale shape (what must survive 100 TB):

- ``word_counts`` is ONE corpus scan + ONE partial-agg shuffle keyed by
  word. Everything after operates on the *word-frequency table* — vocab-
  sized (~1e8 rows for a web corpus), orders of magnitude smaller than the
  corpus. The corpus itself is never touched again during training; this
  is the same two-level structure every production BPE trainer uses.
- each training round is one narrow projection + one pair-keyed partial
  aggregation over the word table, then a driver-side collect of only the
  top candidate pairs (``O(batch)`` rows). With ``batch=M`` symbol-disjoint
  merges per round (see below), ``n_merges`` merges cost
  ``n_merges / M`` such rounds — not ``n_merges`` corpus scans.
- merge application is a pure JVM ``aggregate`` fold over each word's
  symbol array (whole-stage codegen, no Python); the word table is
  re-materialized per round via ``localCheckpoint`` so the plan does not
  grow with the number of rounds. On a real cluster swap localCheckpoint
  for a reliable checkpoint dir; the call site is one line.
- ``bpe_encode`` (applying a trained merge table to the corpus) is the
  only Python step, and it is Arrow-batched ``mapInArrow`` with per-batch
  word memoization — one corpus scan, zero shuffles, the decode cost is
  paid per *distinct* word per batch, not per occurrence.

Semantics:

- ``batch=1`` (default) is *exactly* the classic algorithm: recount all
  adjacent symbol pairs, take the single most frequent (ties broken by
  lexicographic pair order — deterministic), merge all its occurrences,
  repeat. Property-tested against an independent pure-Python
  implementation (tests/test_bpe.py).
- ``batch=M`` picks the top M pairs of a round under a *symbol-disjoint*
  rule: a candidate is skipped if it shares a symbol (or its merged
  symbol collides) with a pair already chosen this round. Merging a pair
  only perturbs counts of pairs that touch its symbols, so every chosen
  pair's count is exact at application time and the round's result is
  order-independent — the standard compatible-set batching of parallel
  BPE trainers. The batched schedule is still deterministic (and the
  pure-Python twin implements the identical rule).

Pre-tokenization matches the simple analyzer (``simple_text.token_array``:
lowercase, ``[a-z0-9]+`` runs, length ≥ 2) so the word-count stage has an
exact DuckDB twin (driver gate ``bpe_word_counts`` / ``bpe_top_pairs``).
The iterative merge loop is not SQL-expressible; ``bpe_merges`` gates
rows-only and is pinned exactly by the pure-Python oracle in pytest.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from letarette_spark.functions.simple_text import token_array

MERGE_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("left", T.StringType(), False),
        T.StructField("right", T.StringType(), False),
        T.StructField("merged", T.StringType(), False),
    ]
)

_PRETOKEN_RE = re.compile(r"[a-z0-9]+")


def pretokenize(text: str) -> list[str]:
    """Python twin of simple_text.token_array (used by the Arrow encoder):
    lowercase, keep [a-z0-9]+ runs of length >= 2, document order."""
    return [t for t in _PRETOKEN_RE.findall(text.lower()) if len(t) >= 2]


def word_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, cnt) — corpus word frequencies over simple-analyzer tokens.
    One scan + one partial-agg shuffle; the training working set."""
    return (
        df.select(F.explode(token_array(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _sym_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words — same guard shape as lm_score.bigram_events)."""
    n = F.greatest(F.size(syms) - 1, F.lit(0))
    return F.zip_with(
        F.slice(syms, 1, n),
        F.slice(syms, 2, n),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def pair_counts(words: DataFrame, syms_col: str = "syms") -> DataFrame:
    """(a, b, cnt) — adjacent symbol-pair frequencies weighted by word
    count, over a symbolized word table. Vocab-sized input, one partial-agg
    shuffle keyed by pair."""
    return (
        words.select(F.explode(_sym_pairs(F.col(syms_col))).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def top_pairs(
    df: DataFrame, k: int = 30, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Top-k character-level adjacent pairs before any merge — the round-0
    candidate list, exposed as a hash-green driver gate (its DuckDB twin
    builds the same pairs with substr over the word-count table)."""
    words = word_counts(df, id_col, text_col).select(
        F.split("word", "").alias("syms"), "cnt"
    )
    return (
        pair_counts(words)
        .orderBy(F.desc("cnt"), "a", "b")
        .limit(k)
    )


def merge_fold_expr(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    a+b, as a pure-JVM aggregate fold: state (out, pend) carries the last
    unmerged symbol; "aaa" under (a,a) folds to ["aa", "a"]."""
    merged = a + b
    empty = F.array().cast("array<string>")
    nul = F.lit(None).cast("string")
    return F.aggregate(
        syms,
        F.struct(empty.alias("out"), nul.alias("pend")),
        lambda st, s: F.when(
            st["pend"].isNull(),
            F.struct(st["out"].alias("out"), s.alias("pend")),
        )
        .when(
            (st["pend"] == F.lit(a)) & (s == F.lit(b)),
            F.struct(
                F.concat(st["out"], F.array(F.lit(merged))).alias("out"),
                nul.alias("pend"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st["out"], F.array(st["pend"])).alias("out"),
                s.alias("pend"),
            )
        ),
        lambda st: F.when(st["pend"].isNull(), st["out"]).otherwise(
            F.concat(st["out"], F.array(st["pend"]))
        ),
    )


def apply_merges_expr(syms: Column, merges: Iterable[tuple[str, str]]) -> Column:
    """Chain merge folds in rank order. Rank order is sufficient for exact
    BPE encoding: a merge learned at rank r can only involve symbols that
    existed after ranks < r, so applying earlier merges fully can never be
    undone or re-enabled by later ones. JVM-only — use for merge lists up
    to a few dozen (codegen depth); bpe_encode handles full vocabularies."""
    out = syms
    for a, b in merges:
        out = merge_fold_expr(out, a, b)
    return out


def _choose_disjoint(
    ranked: list[tuple[str, str, int]], take: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Greedy symbol-disjoint prefix of a ranked candidate list (shared
    helper of the Spark trainer and the pure-Python twin)."""
    chosen: list[tuple[str, str]] = []
    used: set[str] = set()
    for a, b, cnt in ranked:
        if len(chosen) >= take:
            break
        if cnt < min_pair_count:
            break
        if a in used or b in used or (a + b) in used:
            continue
        chosen.append((a, b))
        used.update((a, b, a + b))
    return chosen


# pending lazy merge folds before the working table is re-checkpointed:
# bounds nested-HOF plan depth and the per-round recompute of the chain
_CKPT_DEPTH = 8


def bpe_train(
    df: DataFrame,
    n_merges: int = 64,
    batch: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pair_count: int = 2,
    _word_counts: DataFrame | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list [(left, right), ...]. ``batch`` > 1 trades classic
    one-at-a-time recounting for symbol-disjoint rounds (see module doc);
    training stops early when no pair reaches ``min_pair_count``."""
    wc = _word_counts if _word_counts is not None else word_counts(
        df, id_col, text_col
    )
    words = wc.select(F.split("word", "").alias("syms"), "cnt")
    # eager localCheckpoint: materializes the vocab table once and keeps
    # each round's plan flat (swap for a reliable checkpoint on a cluster)
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    # Rounds chain their merge folds LAZILY onto the last checkpoint —
    # each round then costs ONE job (the candidate collect) instead of
    # two, and the final round's fold is never evaluated at all (only
    # the merge list leaves this function). The chain re-evaluates prior
    # pending folds on the vocab-sized table (cheap); a checkpoint every
    # _CKPT_DEPTH pending merges bounds both that recompute and the
    # nested-fold plan depth for long (batch=1, n_merges=500) trainings.
    pending = 0
    while len(merges) < n_merges:
        if pending >= _CKPT_DEPTH:
            words = words.localCheckpoint(eager=True)
            pending = 0
        take = min(batch, n_merges - len(merges))
        # over-collect so the disjointness filter can skip conflicts; the
        # collect is O(batch) rows, never the table. If the batch doesn't
        # fill because every collected candidate conflicted, escalate the
        # pool — the twin scans the FULL ranking and the exact-equality
        # contract requires the same here. Escalation stops once the
        # ranking is exhausted (short collect) or the tail fell below
        # min_pair_count (ranking is cnt-desc, so nothing below the last
        # collected row is eligible either).
        pool = take * 8 + 8
        while True:
            rows = (
                pair_counts(words)
                .orderBy(F.desc("cnt"), "a", "b")
                .limit(pool)
                .collect()
            )
            ranked = [(r["a"], r["b"], r["cnt"]) for r in rows]
            chosen = _choose_disjoint(ranked, take, min_pair_count)
            if (
                len(chosen) >= take
                or len(rows) < pool
                or (ranked and ranked[-1][2] < min_pair_count)
            ):
                break
            pool *= 4
        if not chosen:
            break
        merges.extend(chosen)
        words = words.select(
            apply_merges_expr(F.col("syms"), chosen).alias("syms"), "cnt"
        )
        pending += len(chosen)
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list as a (rank, left, right, merged) DataFrame — the
    persistable tokenizer artifact (write it next to the index manifest)."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def encode_word(
    word: str, ranks: dict[tuple[str, str], int], cache: dict[str, tuple[str, ...]]
) -> tuple[str, ...]:
    """Classic BPE encode of one word: repeatedly merge all occurrences of
    the present pair with the lowest rank. Memoized per distinct word."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    enc = tuple(syms)
    cache[word] = enc
    return enc


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — apply a trained merge table
    to every document. Arrow-batched mapInArrow (native ListArray output,
    same pattern as the index tokenizer — CLAUDE.md: pandas list columns
    cost 3-4x), merge ranks broadcast once, per-batch word memoization."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    ranks = {pair: i for i, pair in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    b_ranks = sc.broadcast(ranks)

    src = df.select(F.col(id_col), F.col(text_col).cast("string").alias("_t"))
    out_schema = T.StructType(
        [
            src.schema[id_col],
            T.StructField("tokens", T.ArrayType(T.StringType(), False), False),
            T.StructField("n_tokens", T.IntegerType(), False),
        ]
    )

    def encode_batches(
        batches: "Iterator[pa.RecordBatch]",
    ) -> "Iterator[pa.RecordBatch]":
        import pyarrow as pa

        rk = b_ranks.value
        cache: dict[str, tuple[str, ...]] = {}
        for rb in batches:
            ids = rb.column(0)
            texts = rb.column(1).to_pylist()
            toks: list[list[str]] = []
            counts: list[int] = []
            for text in texts:
                doc: list[str] = []
                for w in pretokenize(text or ""):
                    doc.extend(encode_word(w, rk, cache))
                toks.append(doc)
                counts.append(len(doc))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(toks, type=pa.list_(pa.string())),
                    pa.array(counts, type=pa.int32()),
                ],
                names=[id_col, "tokens", "n_tokens"],
            )

    return src.mapInArrow(encode_batches, out_schema)


# ---------------------------------------------------------------------------
# Pure-Python twin (the pytest oracle): same algorithm, no Spark.
# ---------------------------------------------------------------------------


def py_bpe_train(
    word_cnt: dict[str, int],
    n_merges: int,
    batch: int = 1,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Independent driver-side implementation of the identical training
    rule, for exact-equality tests on small corpora."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_cnt.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        take = min(batch, n_merges - len(merges))
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        ranked = sorted(
            ((a, b, c) for (a, b), c in pairs.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        chosen = _choose_disjoint(ranked, take, min_pair_count)
        if not chosen:
            break
        merges.extend(chosen)
        for a, b in chosen:
            new_vocab: dict[tuple[str, ...], int] = {}
            for syms, c in vocab.items():
                out: list[str] = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                key = tuple(out)
                new_vocab[key] = new_vocab.get(key, 0) + c
            vocab = new_vocab
    return merges
