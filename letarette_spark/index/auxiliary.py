"""Index housekeeping artifacts: auto-derived stopwords and synonym groups.

Reference behavior:
- stopwords: terms whose occurrence count exceeds cutoff * total, top 15,
  auto-refreshed during idle housekeeping plus user-supplied words
  (sql/stopwords.sql:15-21; migrations/4_stopwords.up.sql; config.go:66
  cutoff default 1%); query-time-only effect (snowball.c:248-262).
- synonyms: groups loaded from JSON streams of [description, [words]]
  (cmd/lrcli/synonyms.go:63-84; migrations/5_synonyms.up.sql), applied at
  query time as colocated tokens on the unstemmed surface word
  (snowball.c:123-162).

Both are tiny dimension artifacts stored as JSON next to the index and
broadcast at query time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from letarette_spark.index.manifest import _atomic_write_json


def derive_stopwords(index, cutoff: float = 0.01, top_n: int = 15) -> list[str]:
    """Auto-stopwords from term_stats: cnt > cutoff * total(cnt), top_n by
    cnt (stopwords.sql:15-21). Stemmed index terms, by construction."""
    ts = index.term_stats()
    total = ts.agg(F.sum("cnt")).collect()[0][0] or 0
    rows = (
        ts.filter(F.col("cnt") > float(total) * cutoff)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(top_n)
        .collect()
    )
    return [r["term"] for r in rows]


def update_stopwords(
    index, cutoff: float = 0.01, top_n: int = 15, user_words: list[str] | None = None
) -> list[str]:
    words = sorted(set(derive_stopwords(index, cutoff, top_n)) | set(user_words or []))
    _atomic_write_json(os.path.join(index.root, "stopwords.json"), {"words": words})
    return words


def load_stopwords(index) -> frozenset[str]:
    p = os.path.join(index.root, "stopwords.json")
    if not os.path.exists(p):
        return frozenset()
    with open(p) as f:
        return frozenset(json.load(f)["words"])


def update_synonyms(index, groups: list[tuple[str, list[str]]]) -> None:
    """Store synonym groups: [(description, [word, ...]), ...] — the lrcli
    JSON stream format."""
    _atomic_write_json(
        os.path.join(index.root, "synonyms.json"),
        {"groups": [[d, sorted(set(w.lower() for w in ws))] for d, ws in groups]},
    )


def load_synonyms(index) -> dict[str, list[str]]:
    """surface word -> co-words in its groups (excluding itself), the
    lookup shape the query analyzer broadcasts (snowball.c:129-132)."""
    p = os.path.join(index.root, "synonyms.json")
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        groups = json.load(f)["groups"]
    out: dict[str, set[str]] = {}
    for _desc, words in groups:
        for w in words:
            out.setdefault(w, set()).update(x for x in words if x != w)
    return {w: sorted(s) for w, s in out.items()}
