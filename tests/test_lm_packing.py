"""Unit tests: bigram-LM perplexity (functions/lm_score.py) and
cross-document sequence packing (functions/packing.py) against
brute-force Python oracles."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from letarette_spark.functions.lm_score import lm_perplexity
from letarette_spark.functions.packing import pack_sequences

DOCS = [
    ("a1", "the quick brown fox jumps over the lazy dog"),
    ("a2", "the quick brown cat sleeps near the warm dog"),
    ("a3", "pack my box with five dozen liquor jugs"),
    ("a4", "xx"),               # single token: nothing to score
    ("a5", ""),                 # zero tokens
    ("a6", "the the the the"),  # degenerate repetition
    ("a7", "sphinx of black quartz judge my vow"),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) >= 2]


def _df(spark):
    return spark.createDataFrame(
        [{"doc_id": d, "text": t} for d, t in DOCS]
    )


def _py_lm(docs, k=0.5):
    ev = {}
    vocab = set()
    for d, text in docs:
        ts = _toks(text)
        vocab.update(ts)
        ev[d] = list(zip(ts, ts[1:]))
    c2, c1 = {}, {}
    for pairs in ev.values():
        for p in pairs:
            c2[p] = c2.get(p, 0) + 1
            c1[p[0]] = c1.get(p[0], 0) + 1
    V = len(vocab)
    out = {}
    for d, pairs in ev.items():
        if not pairs:
            out[d] = (0, None, None)
            continue
        lp = [
            math.log2((c2[p] + k) / (c1[p[0]] + k * V)) for p in pairs
        ]
        ent = -sum(lp) / len(lp)
        out[d] = (len(pairs), ent, 2.0**ent)
    return out


def test_lm_perplexity_matches_bruteforce(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["entropy"], r["perplexity"])
        for r in lm_perplexity(_df(spark), round_to=None).collect()
    }
    exp = _py_lm(DOCS)
    assert got.keys() == exp.keys()
    for d in exp:
        assert got[d][0] == exp[d][0], d
        for g, e in zip(got[d][1:], exp[d][1:]):
            if e is None:
                assert g is None, d
            else:
                assert math.isclose(g, e, rel_tol=1e-12), (d, g, e)


def test_lm_repetition_scores_low(spark):
    """'the the the the' is maximally predictable under the corpus model —
    lowest perplexity of any scored doc."""
    rows = {r["doc_id"]: r["perplexity"]
            for r in lm_perplexity(_df(spark)).collect()
            if r["perplexity"] is not None}
    assert min(rows, key=rows.get) == "a6"


def _py_pack(docs, budget, n_groups):
    rows = []
    for d, text in docs:
        ts = _toks(text)
        if not ts:
            continue
        key = int(hashlib.md5(d.encode()).hexdigest()[:8], 16)
        rows.append((key % n_groups, key, d, ts))
    out = {}
    for grp in sorted({r[0] for r in rows}):
        stream = []
        for _, _, d, ts in sorted(
            [r for r in rows if r[0] == grp], key=lambda r: (r[1], r[2])
        ):
            stream.extend((d, t) for t in ts)
        for i in range(0, len(stream), budget):
            seq = stream[i : i + budget]
            out[(grp, i // budget)] = (
                len(seq),
                len({d for d, _ in seq}),
                " ".join(t for _, t in seq),
            )
    return out


@pytest.mark.parametrize("budget,n_groups", [(8, 2), (5, 1), (100, 3)])
def test_pack_sequences_matches_bruteforce(spark, budget, n_groups):
    got = {
        (r["group"], r["seq_idx"]): (r["n_tokens"], r["n_docs"], r["seq"])
        for r in pack_sequences(_df(spark), budget=budget, n_groups=n_groups).collect()
    }
    assert got == _py_pack(DOCS, budget, n_groups)


def test_pack_sequences_full_bins(spark):
    """Every sequence except each group's last is exactly budget tokens."""
    rows = pack_sequences(_df(spark), budget=7, n_groups=2).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group"], []).append(r)
    for grp, rs in by_group.items():
        rs.sort(key=lambda r: r["seq_idx"])
        for r in rs[:-1]:
            assert r["n_tokens"] == 7, (grp, r)
        assert 1 <= rs[-1]["n_tokens"] <= 7


def test_pack_sequences_duplicate_ids_fill_bins_exactly(spark):
    """Duplicate-id rows must each get their own token range (ROWS window
    frame; the default RANGE frame would make ties frame-peers, hand both
    copies the same start, and overfill bins). With identical texts the
    packed output is deterministic either way ties order."""
    rows = [{"doc_id": "dup", "text": "alpha beta gamma delta"}] * 3 + [
        {"doc_id": "other", "text": "one two three four five six"}
    ]
    df = spark.createDataFrame(rows)
    out = pack_sequences(df, budget=5, n_groups=1).collect()
    total = sum(r["n_tokens"] for r in out)
    assert total == 3 * 4 + 6
    out.sort(key=lambda r: r["seq_idx"])
    for r in out[:-1]:
        assert r["n_tokens"] == 5, r
    assert 1 <= out[-1]["n_tokens"] <= 5


def test_pack_sequences_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        pack_sequences(_df(spark), budget=0)
    with pytest.raises(ValueError):
        pack_sequences(_df(spark), n_groups=0)


def test_lm_perplexity_plan_is_pure_jvm(spark):
    """No Python evaluation anywhere — token split, bigram zip, log2
    arithmetic and the model joins are all codegen'd column expressions."""
    plan = (
        lm_perplexity(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_plan_shape(spark):
    """One window (the per-group prefix sum) and no Python/cartesian —
    the packing cost is the window shuffle plus the final groupBy."""
    plan = (
        pack_sequences(_df(spark), budget=8, n_groups=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Window") >= 1
