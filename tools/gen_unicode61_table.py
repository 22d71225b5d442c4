"""Probe the live SQLite FTS5 unicode61 tokenizer (remove_diacritics 2)
over EVERY Unicode codepoint and pin its per-character behavior as a
generated exceptions table (letarette_spark/analysis/u61data.py).

SQLite's unicode61 ships its own category + case-fold + diacritic
tables (built from an old Unicode version), so Python's
unicodedata-based heuristic diverges on three fronts:

- most combining marks (Mn/Me) are SEPARATORS to FTS5 — only the
  codepoints in its remove-diacritics table continue a token (e.g.
  U+0300-U+0304 yes, Arabic harakat U+064B-U+0652 no);
- characters assigned after SQLite's table was generated fall into
  whatever class the old table gives the range (some newer Mn marks
  are full token chars, some newer letters are separators);
- the case-fold/diacritic-strip result can differ from
  NFD-strip-lower.

For each codepoint we tokenize "a<ch>b" through the real FTS5
(tests/fts5_oracle.fts5_tokenize semantics, batched via fts5vocab):

  ['ab']        -> class 'd'  (continues the token, folds to '')
  ['a','b']     -> class 's'  (separator)
  ['a<F>b']     -> class 't'  (token char, folds to F)

and emit only the DIFFERENCES against the heuristic
(Mn/Me -> 'd'; isalnum -> 't' with NFD-strip-lower fold; else 's')
as compact ranges, so unicode61.py stays heuristic-fast with an
exact exception overlay.  A verification pass re-probes a sample in
digit context and after separators to confirm the class is
context-free.

Run: python tools/gen_unicode61_table.py
"""

from __future__ import annotations

import os
import sqlite3
import sys
import unicodedata

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from letarette_spark.analysis import unicode61  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "letarette_spark", "analysis",
    "u61data.py",
)

TOKENIZER = "unicode61 remove_diacritics 2"


def probe_batch(cps: list[int]) -> dict[int, tuple[str, str]]:
    """Tokenize 'a<ch>b' for each codepoint in one fts5 table.

    Returns {cp: (cls, fold)} with cls in {'d','s','t'} ('?' for
    shapes that fit none — none observed)."""
    con = sqlite3.connect(":memory:")
    con.execute(
        f"CREATE VIRTUAL TABLE t USING fts5(c, tokenize='{TOKENIZER}')"
    )
    con.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    con.executemany(
        "INSERT INTO t(rowid, c) VALUES (?, ?)",
        [(i, f"a{chr(cp)}b") for i, cp in enumerate(cps)],
    )
    rows = con.execute(
        "SELECT doc, term FROM v ORDER BY doc, offset"
    ).fetchall()
    con.close()
    toks: dict[int, list[str]] = {}
    for doc, term in rows:
        toks.setdefault(doc, []).append(term)
    out: dict[int, tuple[str, str]] = {}
    for i, cp in enumerate(cps):
        ts = toks.get(i, [])
        if ts == ["ab"]:
            out[cp] = ("d", "")
        elif ts == ["a", "b"]:
            out[cp] = ("s", "")
        elif (
            len(ts) == 1
            and ts[0].startswith("a")
            and ts[0].endswith("b")
            and len(ts[0]) >= 2
        ):
            out[cp] = ("t", ts[0][1:-1])
        else:
            out[cp] = ("?", repr(ts))
    return out


def heuristic(cp: int) -> tuple[str, str]:
    ch = chr(cp)
    if unicodedata.category(ch) in ("Mn", "Me"):
        return ("d", "")
    if ch.isalnum():
        return ("t", unicode61.fold(ch))
    return ("s", "")


def main() -> None:
    probed: dict[int, tuple[str, str]] = {}
    cps = [
        cp for cp in range(1, 0x110000) if not 0xD800 <= cp <= 0xDFFF
    ]
    for i in range(0, len(cps), 8192):
        batch = cps[i : i + 8192]
        probed.update(probe_batch(batch))
        if i % (8192 * 16) == 0:
            print(f"probed {i}/{len(cps)}", file=sys.stderr)

    weird = {cp: v for cp, v in probed.items() if v[0] == "?"}
    if weird:
        print(f"UNEXPECTED shapes: {len(weird)}", file=sys.stderr)
        for cp, v in list(weird.items())[:20]:
            print(f"  U+{cp:04X}: {v[1]}", file=sys.stderr)
        raise SystemExit(1)

    # class exceptions vs heuristic, as merged ranges
    cls_exc: list[tuple[int, int, str]] = []
    fold_exc: dict[int, str] = {}
    for cp in cps:
        pc, pf = probed[cp]
        hc, hf = heuristic(cp)
        if pc != hc:
            if cls_exc and cls_exc[-1][1] == cp - 1 and cls_exc[-1][2] == pc:
                cls_exc[-1] = (cls_exc[-1][0], cp, pc)
            else:
                cls_exc.append((cp, cp, pc))
        if pc == "t" and (hc != "t" or pf != hf):
            fold_exc[cp] = pf

    # fold exceptions where the probe's fold == the char itself are the
    # common case for newly-assigned letters; store those as ranges too
    ident = sorted(cp for cp, f in fold_exc.items() if f == chr(cp))
    ident_ranges: list[tuple[int, int]] = []
    for cp in ident:
        if ident_ranges and ident_ranges[-1][1] == cp - 1:
            ident_ranges[-1] = (ident_ranges[-1][0], cp)
        else:
            ident_ranges.append((cp, cp))
    nonident = {cp: f for cp, f in fold_exc.items() if f != chr(cp)}

    # context-freeness spot check: class-d and class-s exceptions in
    # digit context and after a separator
    sample = [r[0] for r in cls_exc[:: max(1, len(cls_exc) // 200)]]
    con = sqlite3.connect(":memory:")
    con.execute(
        f"CREATE VIRTUAL TABLE t USING fts5(c, tokenize='{TOKENIZER}')"
    )
    con.execute("CREATE VIRTUAL TABLE v USING fts5vocab(t, 'instance')")
    bad_ctx = 0
    for cp in sample:
        cls = probed[cp][0]
        con.execute("DELETE FROM t")
        con.execute("INSERT INTO t(rowid, c) VALUES (1, ?)",
                    (f"0{chr(cp)}0",))
        ts = [r[0] for r in con.execute(
            "SELECT term FROM v ORDER BY offset").fetchall()]
        want = {
            "d": ["00"], "s": ["0", "0"],
        }.get(cls, [f"0{probed[cp][1]}0"])
        if ts != want:
            bad_ctx += 1
            print(f"CONTEXT-DEPENDENT U+{cp:04X}: cls={cls} digit-ctx={ts}",
                  file=sys.stderr)
    con.close()
    if bad_ctx:
        raise SystemExit(f"{bad_ctx} context-dependent codepoints")

    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            '"""GENERATED by tools/gen_unicode61_table.py — per-codepoint\n'
            "exceptions where the live SQLite FTS5 unicode61\n"
            "(remove_diacritics 2) tokenizer differs from the\n"
            "unicodedata heuristic in unicode61.py.  Do not edit.\n\n"
            "CLS_RANGES: sorted (start, end, cls) — cls 'd' continues a\n"
            "token and folds to '', 's' separates, 't' is a token char.\n"
            "FOLD_IDENT_RANGES: token chars whose FTS5 fold is the char\n"
            "itself (where the heuristic would alter it).\n"
            'FOLD_EXC: remaining fold overrides."""\n\n'
        )
        f.write("CLS_RANGES = (\n")
        for a, b, c in cls_exc:
            f.write(f"    ({a}, {b}, {c!r}),\n")
        f.write(")\n\nFOLD_IDENT_RANGES = (\n")
        for a, b in ident_ranges:
            f.write(f"    ({a}, {b}),\n")
        f.write(")\n\nFOLD_EXC = {\n")
        for cp in sorted(nonident):
            f.write(f"    {cp}: {nonident[cp]!r},\n")
        f.write("}\n")
    n_cls = sum(b - a + 1 for a, b, _ in cls_exc)
    print(
        f"wrote {os.path.normpath(OUT)}: {len(cls_exc)} class ranges "
        f"({n_cls} cps), {len(ident_ranges)} ident-fold ranges "
        f"({len(ident)} cps), {len(nonident)} fold overrides"
    )


if __name__ == "__main__":
    main()
