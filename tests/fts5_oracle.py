"""Live SQLite FTS5 oracle used by the test suite.

Python's sqlite3 ships FTS5 with the ``unicode61`` and ``porter`` tokenizers
and the real ``bm25()`` ranking function — the same engine family the
reference builds on (Letarette = FTS5 + a custom tokenizer). Tests build
small FTS5 indexes here and assert that letarette_spark reproduces token
streams, match sets and BM25 scores exactly.
"""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass


def fts5_tokenize(text: str, tokenizer: str = "unicode61 remove_diacritics 2") -> list[tuple[str, int]]:
    """Return [(term, position), ...] as the given FTS5 tokenizer emits them,
    recovered via the fts5vocab 'instance' virtual table."""
    con = sqlite3.connect(":memory:")
    con.execute(f"CREATE VIRTUAL TABLE t USING fts5(c, tokenize='{tokenizer}')")
    con.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    con.execute("INSERT INTO t VALUES (?)", (text,))
    rows = con.execute("SELECT term, offset FROM v ORDER BY offset").fetchall()
    con.close()
    return [(t, o) for t, o in rows]


@dataclass
class Fts5Index:
    """A (title, body) FTS5 index mirroring the reference's fts(title, txt)
    table (migrations/1_init.up.sql:93-97), with Letarette's ranking config
    bm25(5.0, 1.0) (internal/letarette/db.go:357-361)."""

    con: sqlite3.Connection

    @classmethod
    def build(
        cls,
        docs: list[tuple[int, str, str]],          # (rowid, title, body)
        tokenizer: str = "porter unicode61 remove_diacritics 2",
        prefix: str = "2 3 4",
    ) -> "Fts5Index":
        con = sqlite3.connect(":memory:")
        con.execute(
            f"CREATE VIRTUAL TABLE fts USING fts5(title, txt, "
            f"tokenize='{tokenizer}', prefix='{prefix}')"
        )
        con.executemany(
            "INSERT INTO fts(rowid, title, txt) VALUES (?, ?, ?)", docs
        )
        return cls(con)

    def search(
        self,
        match: str,
        limit: int = 10,
        w_title: float = 5.0,
        w_body: float = 1.0,
    ) -> list[tuple[int, float]]:
        """Top-k (rowid, bm25_score) — score is FTS5-negative, ascending =
        best first; ties resolve by rowid (FTS5 visits rowids in order)."""
        rows = self.con.execute(
            "SELECT rowid, bm25(fts, ?, ?) AS r FROM fts WHERE fts MATCH ? "
            "ORDER BY r, rowid LIMIT ?",
            (w_title, w_body, match, limit),
        ).fetchall()
        return [(rid, score) for rid, score in rows]

    def match_rowids(self, match: str) -> list[int]:
        return [
            r
            for (r,) in self.con.execute(
                "SELECT rowid FROM fts WHERE fts MATCH ? ORDER BY rowid", (match,)
            )
        ]
