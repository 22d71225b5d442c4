"""Snowball Irish stemmer — pure Python, bit-exact to the compiled
libstemmer 'irish' UTF-8 stemmer the reference links against
(reference internal/snowball fetches libstemmer_c; snowball.c:210-220
runs the configured stemmer chain over folded tokens).

Disassembly-verified shape (stem fn at .so 0x4a150):

1. initial_morph — FORWARD prefix among: eclipsis/lenition markers
   either deleted (h- n- t- b' d' m') or rewritten to the radical
   consonant (bhf/fh/d'fh -> f, mb/bh -> b, gc/ch -> c, nd/dh -> d,
   ng/gh -> g, bp/ph -> p, dt/th -> t, mh -> m, sh/ts -> s);
2. mark_regions on the rewritten word (v = aeiouáéíóú; pV/R1/R2);
3. backwards, each a match-then-check (no windows, no fallback on a
   failed check): noun_sfx (branch 1: R1 delete, branch 2: R2
   delete), deriv (branch 1: R2 delete; branches 2-6 rewrite to
   arc/gin/graf/paite/óid unconditionally), verb_sfx (branch 1: pV
   delete, branch 2: R1 delete).

Tables and fail-links recovered from the compiled library's ELF data
(tools/extract_among.py); matching via the faithful find_among /
find_among_b ports (_among.py).

Pinned by tests/test_irish_goldens.py against vectors captured from
the compiled library (tools/gen_snowball_goldens.py --lang irish).
"""

from __future__ import annotations

from letarette_spark.analysis._among import (
    find_among,
    find_among_b,
    make_amongs,
)

_VOWELS = frozenset("aeiouáéíóú")

_VERB_SFX = make_amongs((
    ("imid", -1, 1), ("aimid", 0, 1), ("ímid", -1, 1), ("aímid", 2, 1),
    ("adh", -1, 2), ("eadh", 4, 2), ("faidh", -1, 1), ("fidh", -1, 1),
    ("áil", -1, 2), ("ain", -1, 2), ("tear", -1, 2), ("tar", -1, 2),
))

_DERIV = make_amongs((
    ("óideacha", -1, 6), ("patacha", -1, 5), ("achta", -1, 1),
    ("arcachta", 2, 2), ("eachta", 2, 1), ("grafaíochta", -1, 4),
    ("paite", -1, 5), ("ach", -1, 1), ("each", 7, 1), ("óideach", 8, 6),
    ("gineach", 8, 3), ("patach", 7, 5), ("grafaíoch", -1, 4),
    ("pataigh", -1, 5), ("óidigh", -1, 6), ("achtúil", -1, 1),
    ("eachtúil", 15, 1), ("gineas", -1, 3), ("ginis", -1, 3),
    ("acht", -1, 1), ("arcacht", 19, 2), ("eacht", 19, 1),
    ("grafaíocht", -1, 4), ("arcachtaí", -1, 2), ("grafaíochtaí", -1, 4),
))

_NOUN_SFX = make_amongs((
    ("íochta", -1, 1), ("aíochta", 0, 1), ("ire", -1, 2), ("aire", 2, 2),
    ("abh", -1, 1), ("eabh", 4, 1), ("ibh", -1, 1), ("aibh", 6, 1),
    ("amh", -1, 1), ("eamh", 8, 1), ("imh", -1, 1), ("aimh", 10, 1),
    ("íocht", -1, 1), ("aíocht", 12, 1), ("irí", -1, 2), ("airí", 14, 2),
))

_INITIAL = make_amongs((
    ("b'", -1, 1), ("bh", -1, 4), ("bhf", 1, 2), ("bp", -1, 8),
    ("ch", -1, 5), ("d'", -1, 1), ("d'fh", 5, 2), ("dh", -1, 6),
    ("dt", -1, 9), ("fh", -1, 2), ("gc", -1, 5), ("gh", -1, 7),
    ("h-", -1, 1), ("m'", -1, 1), ("mb", -1, 4), ("mh", -1, 10),
    ("n-", -1, 1), ("nd", -1, 6), ("ng", -1, 7), ("ph", -1, 8),
    ("sh", -1, 3), ("t-", -1, 1), ("th", -1, 9), ("ts", -1, 3),
))

_INITIAL_REPL = {
    2: b"f", 3: b"s", 4: b"b", 5: b"c", 6: b"d",
    7: b"g", 8: b"p", 9: b"t", 10: b"m",
}
_DERIV_REPL = {2: b"arc", 3: b"gin", 4: b"graf", 5: b"paite",
               6: b"\xc3\xb3id"}


def _regions_b(word: str) -> tuple[int, int, int]:
    """(pV, R1, R2) as byte offsets."""
    positions = []
    bpos = 0
    for ch in word:
        positions.append((bpos, ch in _VOWELS))
        bpos += len(ch.encode("utf-8"))
    n = bpos
    pv = n
    for i, (bp, isv) in enumerate(positions):
        if isv:
            pv = positions[i + 1][0] if i + 1 < len(positions) else n
            break

    def after_vc(start_idx: int) -> tuple[int, int]:
        i = start_idx
        while i < len(positions) and not positions[i][1]:
            i += 1
        while i < len(positions) and positions[i][1]:
            i += 1
        if i < len(positions):
            nxt = i + 1
            return (positions[nxt][0] if nxt < len(positions) else n), nxt
        return n, len(positions)

    r1, idx = after_vc(0)
    r2, _ = after_vc(idx)
    return pv, r1, r2


def stem(word: str) -> str:
    wb = word.encode("utf-8")
    res, nc = find_among(wb, 0, len(wb), _INITIAL)
    if res == 1:
        wb = wb[nc:]
    elif res in _INITIAL_REPL:
        wb = _INITIAL_REPL[res] + wb[nc:]
    pv, r1, r2 = _regions_b(wb.decode("utf-8"))

    res, nc = find_among_b(wb, len(wb), 0, _NOUN_SFX)
    if (res == 1 and nc >= r1) or (res == 2 and nc >= r2):
        wb = wb[:nc]

    res, nc = find_among_b(wb, len(wb), 0, _DERIV)
    if res == 1 and nc >= r2:
        wb = wb[:nc]
    elif res in _DERIV_REPL:
        wb = wb[:nc] + _DERIV_REPL[res]

    res, nc = find_among_b(wb, len(wb), 0, _VERB_SFX)
    if (res == 1 and nc >= pv) or (res == 2 and nc >= r1):
        wb = wb[:nc]
    return wb.decode("utf-8")
