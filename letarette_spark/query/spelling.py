"""Spelling correction with spellfix1-exact semantics.

The reference respells zero-hit terms through SQLite's spellfix1 virtual
table (internal/letarette/db_spelling.go:25-96, vendored public-domain
spellfix.c). This module reimplements the OBSERVED semantics in original
Python, pinned to the same constants and rules:

- character classes: silent / vowel / {B C D L R M Y} consonant groups /
  digit / space / other, with a word-initial table that differs from the
  mid-word table only for 'y' (own class, not vowel) and the apostrophe
  (other, not silent)  [spellfix.c midClass/initClass tables]
- phonetic hash: drop gn/kn leading n, wr->r, dj/dg->j/g, tch->ch,
  silent letters vanish, vowels next to l/r vanish, consecutive
  duplicate classes collapse; emitted over the alphabet
  A B C D H L R M Y 9 ? (className)  [spellfix.c phoneticHash]
- editdist1: common-prefix skip, Wagner DP where the "previous character"
  context comes from the chosen-path character array (cx), costs:
  silent ins/del 1, repeat 10, vowel-beside-r 20, same-class vowel 15 /
  consonant 50, other ins/del 100; substitution same-class 40,
  consonant-to-consonant 75, other 100; insertions at the very end of
  the pattern cost 1/4 (integer division)  [spellfix.c editdist1,
  insertOrDeleteCost, substituteCost, FINAL_INS_COST_DIV]
- ranking: candidates = dictionary words whose phonetic hash shares the
  query hash's first min(3, ...) characters (scope rule); each scored
  score = distance + 32 - bit_length(rank) with rank = term occurrence
  count; the best (lowest) score wins and its raw DISTANCE is reported
  [spellfix.c spellfix1Score/RunQuery; speling rank = cnt,
  indextools.go:400-409]

Non-ASCII inputs are not respelled (editdist1 returns an error for
non-ASCII; the unicode61 remove_diacritics analyzer already folds latin
terms to ASCII, so this matches the reference's observable behavior).

The dictionary ("speling" table analog, with rank=cnt) is a parquet
table (term, hash, df, cnt) derived from term_stats during index
housekeeping (indextools.go:365-421: terms of length > 3 with
cnt >= minCount).
"""

from __future__ import annotations

import os
from functools import lru_cache
from functools import reduce as _reduce

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# character class ids (order matters: consonant groups span B..Y)
_SILENT, _VOWEL, _B, _C, _D, _H, _L, _R, _M, _Y, _DIGIT, _SPACE, _OTHER = range(13)
_CLASS_REP = ".ABCDHLRMY9 ?"  # class id -> phonetic-hash symbol

_MID = {}
for _chars, _cls in [
    ("aeiouy", _VOWEL), ("bfpvw", _B), ("cgjkqsxz", _C), ("dt", _D),
    ("h'", _SILENT), ("l", _L), ("r", _R), ("mn", _M),
    ("0123456789", _DIGIT), (" \t\n\r\f", _SPACE),
]:
    for _c in _chars:
        _MID[_c] = _cls


def _mid_class(c: str) -> int:
    return _MID.get(c, _OTHER)


def _init_class(c: str) -> int:
    # word-initial: y is its own class, apostrophe is not silent
    if c == "y":
        return _Y
    if c == "'":
        return _OTHER
    return _MID.get(c, _OTHER)


def _char_class(prev: str, c: str) -> int:
    """Class of *c* given the previous character (initial table when at
    the word start, i.e. prev == '')."""
    return _init_class(c) if prev == "" else _mid_class(c)


@lru_cache(maxsize=65536)
def phonetic_hash(word: str) -> str:
    """Cluster key over the A B C D H L R M Y 9 ? alphabet."""
    w = word.lower()
    if len(w) > 2 and w[0] in "gk" and w[1] == "n":
        w = w[1:]
    out: list[str] = []
    cprev = 99   # sentinel matching no class
    cprevx = 99
    initial = True
    for i, ch in enumerate(w):
        if i + 1 < len(w):
            if ch == "w" and w[i + 1] == "r":
                continue
            if ch == "d" and w[i + 1] in "jg":
                continue
            if i + 2 < len(w) and ch == "t" and w[i + 1] == "c" and w[i + 2] == "h":
                continue
        c = _init_class(ch) if initial else _mid_class(ch)
        if c == _SPACE:
            continue
        if c == _OTHER and cprev != _DIGIT:
            continue
        initial = False
        if c == _VOWEL and cprevx in (_R, _L):
            continue  # no vowels beside l or r
        if c in (_R, _L) and cprevx == _VOWEL and out:
            out.pop()  # no vowels beside l or r
        cprev = c
        if c == _SILENT:
            continue
        cprevx = c
        rep = _CLASS_REP[c]
        if not out or out[-1] != rep:
            out.append(rep)
    return "".join(out)


def _insdel_cost(prev: str, c: str, nxt: str) -> int:
    """Cost of inserting/deleting *c* right after *prev* (spellfix1's
    insertOrDeleteCost)."""
    cls = _char_class(prev, c)
    if cls == _SILENT:
        return 1
    if prev == c:
        return 10  # repeated character, or missed repeat
    if cls == _VOWEL and (prev == "r" or nxt == "r"):
        return 20  # vowel before/after r
    cls_prev = _mid_class(prev) if prev else _OTHER
    if cls == cls_prev:
        return 15 if cls == _VOWEL else 50
    return 100


def _sub_cost(prev: str, cfrom: str, cto: str) -> int:
    if cfrom == cto:
        return 0
    cf = _char_class(prev, cfrom)
    ct = _char_class(prev, cto)
    if cf == ct:
        return 40
    if _B <= cf <= _Y and _B <= ct <= _Y:
        return 75
    return 100


@lru_cache(maxsize=65536)
def edit_distance(a: str, b: str) -> int:
    """editdist1 semantics: cost of transforming *a* (the query pattern)
    into *b* (the dictionary word). Asymmetric: appending at the end of
    the pattern is discounted 4x. Returns -2 for non-ASCII input (the
    reference skips such candidates)."""
    a, b = a.lower(), b.lower()
    if any(ord(ch) > 127 for ch in a) or any(ord(ch) > 127 for ch in b):
        return -2
    # skip the common prefix, remembering the last shared character as
    # the cost context
    dc = ""
    i = 0
    while i < min(len(a), len(b)) and a[i] == b[i]:
        dc = a[i]
        i += 1
    A, B = a[i:], b[i:]
    if not A and not B:
        return 0
    if not A:  # pure appends at the end of the pattern
        prev, res = dc, 0
        for j, c in enumerate(B):
            nxt = B[j + 1] if j + 1 < len(B) else ""
            res += _insdel_cost(prev, c, nxt) // 4
            prev = c
        return res
    if not B:  # pure deletions
        prev, res = dc, 0
        for j, c in enumerate(A):
            nxt = A[j + 1] if j + 1 < len(A) else ""
            res += _insdel_cost(prev, c, nxt)
            prev = c
        return res

    nA, nB = len(A), len(B)
    m = [0] * (nB + 1)
    cx = [""] * (nB + 1)  # character chosen along the best path
    cx[0] = dc
    prev_b = dc
    for xB in range(1, nB + 1):
        cB = B[xB - 1]
        cx[xB] = cB
        m[xB] = m[xB - 1] + _insdel_cost(prev_b, cB, B[xB] if xB < nB else "")
        prev_b = cB
    ca_prev = dc
    for xA in range(1, nA + 1):
        last_a = xA == nA
        cA = A[xA - 1]
        ca_next = A[xA] if xA < nA else ""
        d = m[0]
        m[0] = d + _insdel_cost(ca_prev, cA, ca_next)
        for xB in range(1, nB + 1):
            cB = B[xB - 1]
            cb_next = B[xB] if xB < nB else ""
            ins = _insdel_cost(cx[xB - 1], cB, cb_next)
            if last_a:
                ins //= 4  # FINAL_INS_COST_DIV: appends at pattern end
            dele = _insdel_cost(cx[xB], cA, cb_next)
            sub = _sub_cost(cx[xB - 1], cA, cB)
            total = ins + m[xB - 1]
            ncx = cB
            if dele + m[xB] < total:
                total = dele + m[xB]
                ncx = cA
            if sub + d < total:
                total = sub + d
                # (ncx intentionally keeps the ins/del choice — the
                # substituted cell holds cB already; mirrors the C)
            d = m[xB]
            m[xB] = total
            cx[xB] = ncx
        ca_prev = cA
    return m[nB]


def spelling_score(distance: int, rank: int) -> int:
    """spellfix1Score: distance + 32 - bit_length(rank) — frequent words
    win ties against rare ones."""
    return distance + 32 - int(rank).bit_length()


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
    length > 3 with cnt >= minCount, rank = cnt; indextools.go:365-421).
    Returns the written path."""

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
    index.__dict__.pop("_speling_df", None)  # rewrite invalidates the handle
    return out


def _hash_prefix(term: str, scope: int) -> str | None:
    """spellfix1 candidate scope: the first *scope* chars of the phonetic
    hash, shrinking for short hashes exactly as the vtab does; non-ASCII
    terms have no candidates (editdist1 rejects them)."""
    if any(ord(ch) > 127 for ch in term):
        return None
    h = phonetic_hash(term)
    n = len(h)
    if n <= scope:
        scope = n - 1 if n > 2 else n
    return h[:scope]


def respell_terms(
    index, terms: list[str], scope: int = 3, max_distance: int | None = None
) -> dict[str, tuple[str, int] | None]:
    """Best correction per term in ONE speling-table scan (a query with k
    misspelled words costs one Spark job, not k).

    spellfix1 candidate rule per term: dictionary words whose phonetic
    hash shares the term's hash prefix; rank by
    score = editdist1(term, word) + 32 - bit_length(cnt), return the
    winner's word and raw distance (db_spelling.go:42-43 selects
    word + distance of the top-1 by score)."""
    out: dict[str, tuple[str, int] | None] = {t: None for t in terms}
    path = os.path.join(index.root, "speling")
    if not terms or not os.path.exists(path):
        return out
    prefixes = {
        t: p for t in out if (p := _hash_prefix(t, scope)) is not None
    }
    if not prefixes:
        return out
    uniq = sorted(set(prefixes.values()))
    cond = _reduce(
        lambda a, b: a | b, [F.col("hash").startswith(p) for p in uniq]
    )
    # candidates for ALL query terms in one scan; the speling table is
    # hash-partitioned so the prefix disjunction prunes row groups. The
    # handle is cached per Index (known schema: no inference job, no
    # re-listing across queries); Index.invalidate() drops it.
    df = index.__dict__.get("_speling_df")
    if df is None:
        df = index.spark.read.schema(SPELING_SCHEMA).parquet(path)
        index.__dict__["_speling_df"] = df
    rows = df.filter(cond).select("term", "hash", "cnt").collect()
    for t, prefix in prefixes.items():
        best: tuple[int, int, str] | None = None  # (score, distance, word)
        for r in rows:
            if not r["hash"].startswith(prefix) or r["term"] == t:
                continue
            d = edit_distance(t, r["term"])
            if d < 0:
                continue
            key = (spelling_score(d, int(r["cnt"])), d, r["term"])
            if best is None or key < best:
                best = key
        if best is not None and (max_distance is None or best[1] <= max_distance):
            out[t] = (best[2], best[1])
    return out


def respell_term(
    index, term: str, scope: int = 3, max_distance: int | None = None
) -> tuple[str, int] | None:
    """Single-term convenience wrapper over respell_terms."""
    return respell_terms(index, [term], scope, max_distance)[term]
