"""Snippet assembly for search hits.

Reproduces the reference's strategy-1 snippet construction
(sql/search_1.sql:36-47 + aux functions auxiliary.c:37-174):

- (matchColumn, matchOffset) = column/token-offset of the FIRST phrase
  instance of the match (firstmatch);
- snippet = the substring of the original column text spanning 10 tokens
  starting at max(matchOffset-1, 0) (gettokens), newlines -> spaces;
- '…' prefix when matchOffset > 1; '…' suffix when the matched column has
  more than 10 tokens (tokens(fts, col)).

Strategy 3 (search_3.sql) simply returns the title.

Runs driver-side over the final top-k rows only (k <= 500 — the page
clamp), using the exact same analyzer/NEAR machinery as the engine, so the
reported first-match agrees with the participant-filtered instance lists
FTS5 exposes to aux functions.
"""

from __future__ import annotations

from dataclasses import dataclass

from letarette_spark.analysis.tokenizer import Analyzer
from letarette_spark.query.executor import NEAR_RANGE, _near_participants


@dataclass
class SnippetBuilder:
    analyzer: Analyzer
    window: int = 10
    near: int = NEAR_RANGE

    def _phrase_instances(
        self, tokens: list, phrase_alts: list[list[str]]
    ) -> list[int]:
        """Start positions of a phrase (list of per-position alternatives)
        in an analyzed token list."""
        terms = [t.term for t in tokens]
        n = len(phrase_alts)
        out = []
        for i in range(len(terms) - n + 1):
            if all(terms[i + j] in phrase_alts[j] for j in range(n)):
                out.append(i)
        return out

    def first_match(
        self, title: str, body: str, phrases: list[list[list[str]]]
    ) -> tuple[int, int] | None:
        """(column, offset) of the first participating phrase instance, or
        None. *phrases* is per-include-phrase alternatives-per-position."""
        cols = [self.analyzer.tokens(title or ""), self.analyzer.tokens(body or "")]
        lens = [len(p) for p in phrases]
        per_col_lists = [
            [self._phrase_instances(cols[c], p) for p in phrases] for c in (0, 1)
        ]
        best = None
        for c in (0, 1):
            lists = per_col_lists[c]
            if len(phrases) > 1:
                counts = _near_participants(lists, lens, self.near)
                if counts is None:
                    continue
                # keep only participating instances for first-match parity
                lists = [
                    [
                        y
                        for y in lists[i]
                        if _near_participants(
                            [l if j != i else [y] for j, l in enumerate(lists)],
                            lens,
                            self.near,
                        )
                    ]
                    for i in range(len(lists))
                ]
            firsts = [l[0] for l in lists if l]
            if not firsts:
                continue
            cand = (c, min(firsts))
            if best is None or cand < best:
                best = cand
                break  # columns scanned in order; first column with a match wins
        return best

    def snippet(
        self, title: str, body: str, phrases: list[list[list[str]]]
    ) -> str:
        fm = self.first_match(title, body, phrases)
        if fm is None:
            return ""
        col, offset = fm
        text = title if col == 0 else (body or "")
        toks = self.analyzer.tokens(text)
        if not toks:
            return ""
        start = max(offset - 1, 0)
        end = min(start + self.window, len(toks))
        raw = text[toks[start].start : toks[end - 1].end]
        raw = raw.replace("\n", " ")
        prefix = "…" if offset > 1 else ""
        suffix = "…" if len(toks) > self.window else ""
        return prefix + raw + suffix
