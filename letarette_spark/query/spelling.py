"""Spelling correction: phonetic candidate clustering + class-weighted edit
distance, behaviorally modeled on SQLite's spellfix1 as the reference uses
it (internal/letarette/db_spelling.go:25-96; spellfix cost model
spellfix.c:194-341). Reimplemented from the observed semantics, not the
code: sound-class grouping, silent-letter discounts, repeat collapsing,
cheap vowel edits, and a final-insert discount.

The dictionary ("speling" table analog, migrations/2_spelling.up.sql) is a
parquet table (term, hash, df) derived from term_stats during index
housekeeping (indextools.go:365-421 rebuilds it from fts5vocab with a
minimum occurrence count).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Sound classes (Soundex-style grouping): vowels, labials, sibilants,
# dentals, l, r, nasals, y; h/w/' are "silent".
_CLASSES = {
    "vowel": "aeiou",
    "b": "bfpv",
    "c": "cgjkqsxz",
    "d": "dt",
    "l": "l",
    "r": "r",
    "m": "mn",
    "y": "y",
    "silent": "hw'",
}
_CHAR_CLASS: dict[str, str] = {}
for cls, chars in _CLASSES.items():
    for ch in chars:
        _CHAR_CLASS[ch] = cls


def _cclass(c: str, first: bool) -> str:
    # word-initial h/w are audible; y is vowel-ish when not word-initial
    cls = _CHAR_CLASS.get(c, "digit" if c.isdigit() else "other")
    if first and cls == "silent":
        return "b" if c == "w" else "h"
    return cls


@lru_cache(maxsize=65536)
def phonetic_hash(word: str) -> str:
    """Cluster key for candidate lookup: drop silent letters, strip vowels
    adjacent to l/r, collapse repeats, map to class representatives."""
    w = word.lower()
    if len(w) > 2 and w[0] in "gk" and w[1] == "n":
        w = w[1:]
    out: list[str] = []
    prev_cls = ""
    i = 0
    while i < len(w):
        c = w[i]
        nxt = w[i + 1] if i + 1 < len(w) else ""
        if c == "w" and nxt == "r":
            i += 1
            continue
        if c == "d" and nxt in "jg":
            i += 1
            continue
        if c == "t" and w[i + 1 : i + 3] == "ch":
            i += 1
            continue
        cls = _cclass(c, first=(not out and not prev_cls))
        i += 1
        if cls in ("other", "silent"):
            prev_cls = cls if cls == "silent" else prev_cls
            continue
        if cls == "vowel" and prev_cls in ("l", "r"):
            continue  # no vowels beside l or r
        if cls in ("l", "r") and prev_cls == "vowel" and out:
            out.pop()
        rep = "a" if cls == "vowel" else "0" if cls == "digit" else cls[0]
        if not out or out[-1] != rep:
            out.append(rep)
        prev_cls = cls
    return "".join(out)


def _insdel_cost(prev: str, c: str, nxt: str, at_end: bool) -> int:
    cls = _cclass(c, first=(prev == ""))
    if cls == "silent":
        cost = 1
    elif prev == c:
        cost = 10  # repeated character / missed repeat
    elif cls == "vowel" and (prev == "r" or nxt == "r"):
        cost = 20
    elif prev and cls == _cclass(prev, first=False):
        cost = 15 if cls == "vowel" else 50
    else:
        cost = 100
    if at_end:
        cost = max(1, cost // 4)  # appending at the end is cheap
    return cost


def _sub_cost(prev: str, a: str, b: str) -> int:
    if a == b:
        return 0
    ca = _cclass(a, first=(prev == ""))
    cb = _cclass(b, first=(prev == ""))
    if ca == cb:
        return 40
    if ca not in ("vowel", "other", "digit", "silent") and cb not in (
        "vowel", "other", "digit", "silent",
    ):
        return 75
    return 100


@lru_cache(maxsize=65536)
def edit_distance(a: str, b: str) -> int:
    """Wagner-Fischer with the class-weighted cost model above.
    Lower = closer; 0 = identical (after lowercasing)."""
    a, b = a.lower(), b.lower()
    n, m = len(a), len(b)
    # dp[j]: cost of transforming a[:i] -> b[:j]
    dp = [0] * (m + 1)
    for j in range(1, m + 1):
        prev_b = b[j - 2] if j >= 2 else ""
        dp[j] = dp[j - 1] + _insdel_cost(prev_b, b[j - 1], "", at_end=(n == 0))
    for i in range(1, n + 1):
        prev_a = a[i - 2] if i >= 2 else ""
        diag = dp[0]
        dp[0] = dp[0] + _insdel_cost(prev_a, a[i - 1], a[i] if i < n else "", at_end=False)
        for j in range(1, m + 1):
            prev_b = b[j - 2] if j >= 2 else ""
            del_cost = dp[j] + _insdel_cost(prev_a, a[i - 1], a[i] if i < n else "", at_end=(j == m))
            ins_cost = dp[j - 1] + _insdel_cost(prev_b, b[j - 1], "", at_end=(i == n))
            sub = diag + _sub_cost(prev_b, a[i - 1], b[j - 1])
            diag = dp[j]
            dp[j] = min(del_cost, ins_cost, sub)
    return dp[m]


SPELING_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("hash", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
    ]
)


def build_speling_table(index, min_count: int = 4, min_len: int = 4) -> str:
    """Derive the spelling dictionary from term_stats (reference: terms of
    length > 3 with cnt >= minCount, indextools.go:317-421). Returns the
    written path."""
    @F.pandas_udf(T.StringType())
    def hash_udf(terms: pd.Series) -> pd.Series:
        return terms.map(phonetic_hash)

    out = os.path.join(index.root, "speling")
    (
        index.term_stats()
        .filter((F.length("term") >= min_len) & (F.col("cnt") >= min_count))
        .select("term", hash_udf(F.col("term")).alias("hash"), "df", "cnt")
        .repartition(4, "hash")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def respell_term(index, term: str, max_distance: int = 300) -> tuple[str, int] | None:
    """Best-scoring correction for *term* from the speling table, or None.
    Candidates = same phonetic hash (plus same first letter as fallback);
    ranked by (edit distance, -cnt, term)."""
    path = os.path.join(index.root, "speling")
    if not os.path.exists(path):
        return None
    h = phonetic_hash(term)
    cand = (
        index.spark.read.parquet(path)
        .filter((F.col("hash") == h) | (F.col("term").startswith(term[:2])))
        .select("term", "cnt")
        .collect()
    )
    best: tuple[int, int, str] | None = None
    for r in cand:
        d = edit_distance(r["term"], term)
        if d == 0:
            continue
        key = (d, -int(r["cnt"]), r["term"])
        if best is None or key < best:
            best = key
    if best is None or best[0] > max_distance:
        return None
    return best[2], best[0]
