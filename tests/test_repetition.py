"""Gopher repetition signals (textstats.repetition_scores) vs a
brute-force Python oracle, including the deterministic argmax tie-break."""

from __future__ import annotations

import re
from collections import Counter

from letarette_spark.functions.textstats import repetition_scores

DOCS = [
    ("r1", "the cat sat on the mat and the cat sat on the hat"),
    ("r2", "alpha beta gamma delta epsilon zeta"),       # no repeats
    ("r3", "go go go go go go"),                          # degenerate
    ("r4", "xx"),                                         # 1 token
    ("r5", ""),                                           # empty
    ("r6", "aa bb aa bb cc dd cc dd"),                    # tie-break case
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) >= 2]


def _py_scores(text, ns=(2, 3, 4)):
    ts = _toks(text)
    chars = sum(len(t) for t in ts)
    out = {}
    for n in ns:
        ngs = [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]
        dup = (1.0 - len(set(ngs)) / len(ngs)) if ngs else 0.0
        out[f"dup_{n}gram_frac"] = round(dup, 6)
        if ngs and chars > 0:
            cnt = Counter(ngs)
            # count desc, char length desc, text desc — the exact twin rule
            best = max(
                cnt.items(),
                key=lambda kv: (kv[1], len(kv[0].replace(" ", "")), kv[0]),
            )
            out[f"top_{n}gram_char_frac"] = round(
                best[1] * len(best[0].replace(" ", "")) / chars, 6
            )
        else:
            out[f"top_{n}gram_char_frac"] = 0.0
    return out


def test_repetition_scores_match_bruteforce(spark):
    df = spark.createDataFrame([{"doc_id": d, "text": t} for d, t in DOCS])
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    assert set(got) == {d for d, _ in DOCS}
    for d, text in DOCS:
        exp = _py_scores(text)
        for k, v in exp.items():
            assert abs(got[d][k] - v) < 1e-9, (d, k, got[d][k], v)


def test_degenerate_doc_is_maximally_repetitive(spark):
    df = spark.createDataFrame([{"doc_id": d, "text": t} for d, t in DOCS])
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    # 'go go go go go go': five 2-grams, one distinct -> dup = 0.8; the
    # top 2-gram 'go go' covers 5*4=20 of 12 token chars -> capped? no —
    # overlapping occurrences legitimately exceed 1.0 char coverage
    assert got["r3"]["dup_2gram_frac"] == 0.8
    assert got["r3"]["top_2gram_char_frac"] > 1.0
    assert got["r2"]["dup_2gram_frac"] == 0.0
