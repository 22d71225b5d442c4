"""Exact-substring span dedup (functions/spandedup.py) vs a brute-force
Python oracle."""

from __future__ import annotations

import hashlib
import re

import pytest

from letarette_spark.functions.spandedup import repeated_spans, strip_repeated_spans

BOILER = "all rights reserved contact us for more information about licensing"
DOCS = [
    ("d1", f"unique opening sentence one {BOILER} unique closing one"),
    ("d2", f"another different opening {BOILER} another different closing"),
    ("d3", "totally original text with no repeats anywhere in the corpus"),
    ("d4", f"{BOILER}"),                                  # pure boilerplate
    ("d5", "self repeat self repeat self repeat self repeat tail marker"),
    ("d6", ""),                                           # empty
    ("d7", "short doc"),                                  # shorter than L
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) >= 2]


def _df(spark):
    return spark.createDataFrame([{"doc_id": d, "text": t} for d, t in DOCS])


def _py_windows(docs, L):
    out = []
    for d, text in docs:
        ts = _toks(text)
        for s in range(0, len(ts) - L + 1):
            h = hashlib.md5(" ".join(ts[s : s + L]).encode()).hexdigest()
            out.append((d, s, h))
    return out


def _py_repeated(docs, L, min_count=2):
    from collections import Counter, defaultdict

    wins = _py_windows(docs, L)
    cnt = Counter(h for _, _, h in wins)
    docs_per = defaultdict(set)
    for d, _, h in wins:
        docs_per[h].add(d)
    return {
        h: (c, len(docs_per[h])) for h, c in cnt.items() if c >= min_count
    }


def _py_strip(docs, L, min_count=2):
    rep = _py_repeated(docs, L, min_count)
    wins = _py_windows(docs, L)
    out = {}
    for d, text in docs:
        ts = _toks(text)
        covered = set()
        for dd, s, h in wins:
            if dd == d and h in rep:
                covered.update(range(s, s + L))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


@pytest.mark.parametrize("L", [4, 8])
def test_repeated_spans_matches_bruteforce(spark, L):
    got = {
        r["whash"]: (r["n_occurrences"], r["n_docs"])
        for r in repeated_spans(_df(spark), span_tokens=L).collect()
    }
    assert got == _py_repeated(DOCS, L)


@pytest.mark.parametrize("L", [4, 8])
def test_strip_matches_bruteforce(spark, L):
    got = {
        r["doc_id"]: (r["clean"], r["n_tokens"], r["n_removed"])
        for r in strip_repeated_spans(_df(spark), span_tokens=L).collect()
    }
    assert got == _py_strip(DOCS, L)


def test_strip_preserves_unique_between_repeats(spark):
    """The unique text before/after a shared boilerplate span survives;
    the boilerplate itself is removed from every document that has it."""
    got = {
        r["doc_id"]: r["clean"]
        for r in strip_repeated_spans(_df(spark), span_tokens=4).collect()
    }
    assert got["d1"].startswith("unique opening sentence one")
    assert got["d1"].endswith("unique closing one")
    assert "rights" not in got["d1"] and "rights" not in got["d2"]
    assert got["d4"] == ""                       # all-boilerplate doc
    assert got["d3"] == " ".join(_toks(DOCS[2][1]))  # untouched
    assert got["d6"] == ""


def test_self_repeat_counts(spark):
    """A span repeating WITHIN one document is a repeat (the second
    occurrence is memorization fuel just the same)."""
    got = {
        r["doc_id"]: (r["clean"], r["n_removed"])
        for r in strip_repeated_spans(_df(spark), span_tokens=2).collect()
    }
    clean, n_removed = got["d5"]
    assert "self" not in clean and "repeat" not in clean
    assert n_removed >= 8


def test_plan_no_python_no_cartesian(spark):
    plan = (
        strip_repeated_spans(_df(spark), span_tokens=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "CartesianProduct" not in plan


def test_param_validation(spark):
    with pytest.raises(ValueError):
        repeated_spans(_df(spark), span_tokens=0)
    with pytest.raises(ValueError):
        repeated_spans(_df(spark), min_count=1)
