"""BPE tokenizer training/encoding (functions/bpe.py).

The Spark trainer is pinned *exactly* against an independent pure-Python
implementation of the same rule (classic batch=1 = Sennrich et al. 2016;
batched = symbol-disjoint rounds), and the Arrow encoder against the
pure-JVM fold-chain encoder — two genuinely different implementations
that must agree token-for-token.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from letarette_spark.functions import bpe
from letarette_spark.functions.simple_text import token_array

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def corpus_wc(spark, docs):
    return {r["word"]: r["cnt"] for r in bpe.word_counts(docs).collect()}


def _wc_df(spark, word_cnt: dict[str, int]):
    rows = [(w, " ".join([w] * c)) for w, c in word_cnt.items()]
    # one doc per word repeated cnt times -> word_counts(df) == word_cnt
    return spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id int, text string"
    )


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------


def test_classic_train_matches_python_twin(spark, docs, corpus_wc):
    m_spark = bpe.bpe_train(docs, n_merges=16, batch=1)
    m_py = bpe.py_bpe_train(corpus_wc, 16, batch=1)
    assert m_spark == m_py
    assert len(m_spark) == 16


def test_batched_train_matches_python_twin(spark, docs, corpus_wc):
    m_spark = bpe.bpe_train(docs, n_merges=16, batch=4)
    m_py = bpe.py_bpe_train(corpus_wc, 16, batch=4)
    assert m_spark == m_py


def test_batched_round_head_agrees_with_classic(docs, corpus_wc):
    """The first merge of every round uses exact counts, so the batched
    schedule's head must equal the classic choice."""
    m1 = bpe.py_bpe_train(corpus_wc, 1, batch=1)
    m4 = bpe.py_bpe_train(corpus_wc, 8, batch=8)
    assert m4[:1] == m1


def test_tie_break_is_lexicographic(spark):
    df = _wc_df(spark, {"ab": 3, "cd": 3})
    assert bpe.bpe_train(df, n_merges=2, batch=1) == [("a", "b"), ("c", "d")]


def test_min_pair_count_stops_training(spark):
    # every adjacent pair occurs exactly once -> below min_pair_count=2
    df = _wc_df(spark, {"ab": 1, "cd": 1})
    assert bpe.bpe_train(df, n_merges=4, batch=1) == []
    assert bpe.bpe_train(df, n_merges=4, batch=1, min_pair_count=1) != []


def test_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id int, text string")
    assert bpe.bpe_train(df, n_merges=4) == []
    assert bpe.bpe_encode(df, [("a", "b")]).count() == 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    wc=st.dictionaries(
        st.text(alphabet="abcd0", min_size=2, max_size=8).filter(
            lambda w: len(w) >= 2
        ),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    ),
    batch=st.sampled_from([1, 3]),
)
def test_train_property_random_vocab(spark, wc, batch):
    df = _wc_df(spark, wc)
    got = bpe.bpe_train(df, n_merges=6, batch=batch, min_pair_count=1)
    want = bpe.py_bpe_train(wc, 6, batch=batch, min_pair_count=1)
    assert got == want


def test_training_rounds_do_not_rescan_corpus(spark, docs):
    """Scale shape: after word_counts the corpus is out of the loop — the
    per-round pair aggregation plans over the checkpointed vocab table,
    never the parquet source."""
    wc = bpe.word_counts(docs)
    words = wc.select(F.split("word", "").alias("syms"), "cnt").localCheckpoint(
        eager=True
    )
    plan = (
        bpe.pair_counts(words)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan parquet" not in plan


# ---------------------------------------------------------------------------
# merge application / encoding
# ---------------------------------------------------------------------------


def _fold_apply(spark, word: str, merges):
    df = spark.createDataFrame([(word,)], "w string")
    return df.select(
        bpe.apply_merges_expr(F.split("w", ""), merges).alias("s")
    ).collect()[0]["s"]


def test_fold_greedy_left_to_right(spark):
    assert _fold_apply(spark, "aaa", [("a", "a")]) == ["aa", "a"]
    assert _fold_apply(spark, "aaaa", [("a", "a")]) == ["aa", "aa"]
    assert _fold_apply(spark, "abab", [("a", "b")]) == ["ab", "ab"]
    assert _fold_apply(spark, "xaby", [("a", "b")]) == ["x", "ab", "y"]
    assert _fold_apply(spark, "ab", [("a", "b"), ("ab", "c")]) == ["ab"]
    assert _fold_apply(spark, "abc", [("a", "b"), ("ab", "c")]) == ["abc"]


def test_encode_word_lowest_rank_first():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
    assert bpe.encode_word("abc", ranks, {}) == ("abc",)
    # (b,c) never fires: (a,b) has the lower rank and consumes the b
    assert bpe.encode_word("babc", ranks, {}) == ("b", "abc")
    cache: dict = {}
    bpe.encode_word("abc", ranks, cache)
    assert cache["abc"] == ("abc",)


def test_arrow_encode_matches_jvm_fold_chain(spark, docs):
    merges = bpe.bpe_train(docs, n_merges=12, batch=1)
    arrow = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    jvm = {
        r["doc_id"]: r["tokens"]
        for r in docs.select(
            "doc_id",
            F.flatten(
                F.transform(
                    token_array("text"),
                    lambda w: bpe.apply_merges_expr(F.split(w, ""), merges),
                )
            ).alias("tokens"),
        ).collect()
    }
    assert set(arrow) == set(jvm)
    for doc_id, (toks, n) in arrow.items():
        assert toks == jvm[doc_id]
        assert n == len(toks)


def test_encode_accepts_merges_dataframe(spark, docs):
    merges = bpe.bpe_train(docs, n_merges=4, batch=1)
    mdf = bpe.merges_df(spark, merges)
    assert [tuple(r) for r in mdf.select("left", "right").orderBy("rank").collect()] == merges
    via_df = bpe.bpe_encode(docs.limit(20), mdf).orderBy("doc_id").collect()
    via_list = bpe.bpe_encode(docs.limit(20), merges).orderBy("doc_id").collect()
    assert [r.asDict() for r in via_df] == [r.asDict() for r in via_list]


def test_encode_blank_and_short_tokens(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a b c"), (3, None), (4, "Hello HELLO hello")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe.bpe_encode(df, [("l", "l")]).collect()
    }
    assert out[1] == ([], 0)
    assert out[2] == ([], 0)  # 1-char tokens dropped by the pre-tokenizer
    assert out[3] == ([], 0)
    # casefolding matches token_array; (l,l) merges inside each 'hello'
    assert out[4][0] == ["h", "e", "ll", "o"] * 3
    assert out[4][1] == 12


def test_top_pairs_weighted_by_count(spark):
    df = _wc_df(spark, {"ab": 5, "bc": 2})
    rows = [
        (r["a"], r["b"], r["cnt"])
        for r in bpe.top_pairs(df, k=10, id_col="doc_id").collect()
    ]
    assert rows == [("a", "b", 5), ("b", "c", 2)]


def test_batched_pool_escalation_matches_python_twin(spark):
    """A round whose collected candidate pool (take*8+8 rows) is ALL
    conflicts after the first chosen pair must keep scanning the ranking
    — the pure-Python twin scans it in full, and the exact-equality
    contract holds only if the Spark trainer escalates its collect until
    the batch fills or the ranking is exhausted. 24 pairs sharing 'a'
    outrank the first disjoint pair 'xy', pushing it past the initial
    pool of 24 at batch=2."""
    import string

    wc = {"ab": 100}
    others = [c for c in string.ascii_lowercase if c not in "abxy"]
    for i, c in enumerate(others[:23]):
        wc["a" + c] = 99 - i
    wc["xy"] = 10
    m_py = bpe.py_bpe_train(wc, 2, batch=2)
    assert m_py == [("a", "b"), ("x", "y")]  # the twin sees past rank 24
    m_spark = bpe.bpe_train(_wc_df(spark, wc), n_merges=2, batch=2)
    assert m_spark == m_py
