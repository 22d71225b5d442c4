"""Snowball Yiddish stemmer — pure Python, bit-exact to the compiled
libstemmer 'yiddish' UTF-8 stemmer the reference links against
(reference internal/snowball fetches libstemmer_c; snowball.c:210-220
runs the configured stemmer chain over folded tokens).

Assaf Urieli's algorithm, decoded from the disassembled stem function
(.so ~0x55140) and the ELF among data:

- prelude: digraphs fold to ligatures (וו -> װ, וי -> ױ, יי -> ײ,
  niqqud-gated), final letters unfold (ך ם ן ף ץ), then all niqqud
  points are dropped;
- the גע- prefix (except געלט/געבנ-class words) and the separable
  prefixes rewrite to the ASCII markers GE/TSU so suffix matching
  never crosses them; R1 is the standard vowel/non-vowel mark with a
  3-codepoint minimum past the marker, or directly past an initial
  consonant cluster;
- backwards inside the R1 window: the verb among (deletes plus 31
  irregular-stem rewrites like געגאנגען -> גײ, שריבנ -> שרײב,
  ות -> ה), the ונג/שאפט/הײט/קײט family, the diminutive ל after a
  vowel, the יג/יק/דיק family (בליק/גליק protected), then the
  GE/TSU markers are deleted wherever they ended up.

Matching runs through the faithful find_among_b port (_among.py)
with tables and fail-links recovered from the compiled library
(tools/extract_among.py); every condition pinned by differential
probing (tools/probe_stemmer.py).

Pinned by tests/test_yiddish_goldens.py against vectors captured
from the compiled library (tools/gen_snowball_goldens.py --lang
yiddish).
"""

from __future__ import annotations

from letarette_spark.analysis._among import find_among_b, find_among, make_amongs

_VOWELS = frozenset("אויעױװײ") - {"װ"}  # א ו י ע ױ ײ (NOT the vov ligature)
_CONS = frozenset("בגדהזחטךכלםמןנסףפץצקרשתװ")
_NIQQUD = frozenset(chr(c) for c in range(0x05B0, 0x05C3))

_IQ = make_amongs((
    ("יג", -1, 1), ("יק", -1, 1), ("דיק", 1, 1), ("נדיק", 2, 1),
    ("ענדיק", 3, 1), ("בליק", 1, -1), ("גליק", 1, -1), ("ניק", 1, 1),
    ("יש", -1, 1),
))

_UNG = make_amongs((
    ("ונג", -1, 1), ("שאפט", -1, 1), ("הײט", -1, 1), ("קײט", -1, 1),
    ("יקײט", 3, 1), ("ל", -1, 2),
))

_VERB = make_amongs((
    ("ונג", -1, 1), ("סטו", -1, 1), ("ט", -1, 1), ("בראכט", 2, 31),
    ("סט", 2, 1), ("יסט", 4, 33), ("עט", 2, 1), ("שאפט", 2, 1),
    ("הײט", 2, 1), ("קײט", 2, 1), ("יקײט", 9, 1), ("לעכ", -1, 1),
    ("עלעכ", 11, 1), ("יזמ", -1, 1), ("ימ", -1, 1), ("עמ", -1, 1),
    ("ענעמ", 15, 3), ("טענעמ", 16, 4), ("נ", -1, 1), ("קליבנ", 18, 14),
    ("ריבנ", 18, 15), ("טריבנ", 20, 12), ("שריבנ", 20, 7),
    ("הױבנ", 18, 27), ("שװיגנ", 18, 17), ("זונגנ", 18, 22),
    ("שלונגנ", 18, 25), ("צװונגנ", 18, 24), ("בױגנ", 18, 26),
    ("בונדנ", 18, 20), ("װיזנ", 18, 11), ("טנ", 18, 4), ("GEביטנ", 31, 9),
    ("GEליטנ", 31, 13), ("GEמיטנ", 31, 8), ("שניטנ", 31, 19),
    ("סטנ", 31, 1), ("יסטנ", 36, 1), ("עטנ", 31, 1), ("GEביסנ", 18, 10),
    ("שמיסנ", 18, 18), ("GEריסנ", 18, 16), ("ענ", 18, 1),
    ("גאנגענ", 42, 5), ("עלענ", 42, 1), ("נומענ", 42, 6), ("יזמענ", 42, 1),
    ("שטאנענ", 42, 29), ("טרונקנ", 18, 23), ("פארלױרנ", 18, 28),
    ("שװױרנ", 18, 30), ("װוטשנ", 18, 21), ("גײנ", 18, 5), ("ס", -1, 1),
    ("טס", 53, 4), ("עטס", 54, 1), ("נס", 53, 1), ("טנס", 56, 4),
    ("ענס", 56, 3), ("עס", 53, 1), ("יעס", 59, 2), ("עלעס", 59, 1),
    ("ערס", 53, 1), ("ענערס", 62, 1), ("ע", -1, 1), ("טע", 64, 4),
    ("סטע", 65, 1), ("עטע", 65, 1), ("יע", 64, -1), ("עלע", 64, 1),
    ("ענע", 64, 3), ("טענע", 70, 4), ("ער", -1, 1), ("טער", 72, 4),
    ("סטער", 73, 1), ("עטער", 73, 1), ("ענער", 72, 3), ("טענער", 76, 4),
    ("ות", -1, 32),
))

_STEMS = make_amongs((
    ("קליב", -1, 9), ("ריב", -1, 10), ("טריב", 1, 7), ("שריב", 1, 15),
    ("הױב", -1, 23), ("שװיג", -1, 12), ("גאנג", -1, 1), ("זונג", -1, 18),
    ("שלונג", -1, 21), ("צװונג", -1, 20), ("בױג", -1, 22),
    ("בונד", -1, 16), ("װיז", -1, 6), ("ביט", -1, 4), ("ליט", -1, 8),
    ("מיט", -1, 3), ("שניט", -1, 14), ("נומ", -1, 2), ("שטאנ", -1, 25),
    ("ביס", -1, 5), ("שמיס", -1, 13), ("ריס", -1, 11), ("טרונק", -1, 19),
    ("פארלױר", -1, 24), ("שװױר", -1, 26), ("װוטש", -1, 17),
))

_PREF = make_amongs((
    ("אדורכ", -1, 1), ("אהינ", -1, 1), ("אהער", -1, 1), ("אהײמ", -1, 1),
    ("אומ", -1, 1), ("אונטער", -1, 1), ("איבער", -1, 1), ("אנ", -1, 1),
    ("אנט", 7, 1), ("אנטקעגנ", 8, 1), ("אנידער", 7, 1), ("אפ", -1, 1),
    ("אפיר", 11, 1), ("אקעגנ", -1, 1), ("אראפ", -1, 1), ("ארומ", -1, 1),
    ("ארונטער", -1, 1), ("אריבער", -1, 1), ("ארױס", -1, 1),
    ("ארױפ", -1, 1), ("ארײנ", -1, 1), ("אװעק", -1, 1), ("אױס", -1, 1),
    ("אױפ", -1, 1), ("אײנ", -1, 1), ("בא", -1, 1), ("בײ", -1, 1),
    ("דורכ", -1, 1), ("דער", -1, 1), ("מיט", -1, 1), ("נאכ", -1, 1),
    ("פאר", -1, 1), ("פארבײ", 31, 1), ("פארױס", 31, 1),
    ("פונאנדער", -1, 1), ("צו", -1, 1), ("צוזאמענ", 35, 1),
    ("צונױפ", 35, 1), ("צוריק", 35, 1), ("צע", -1, 1),
))


_FINAL_MAP = {"ך": "כ", "ם": "מ", "ן": "נ", "ף": "פ", "ץ": "צ"}
# each digraph folds to its ligature unless the blocking niqqud
# follows: dagesh for double-vav, hiriq for the yud digraphs
_DIGRAPHS = (("וו", "װ", "\u05bc"), ("וי", "ױ", "\u05b4"),
             ("יי", "ײ", "\u05b4"))

_VERB_ACTIONS = {
    1: ("del", None), 2: ("ies", None), 3: ("del", None), 4: ("del_t", None),
    5: ("repl", "גײ"), 6: ("repl", "נעמ"), 7: ("repl", "שרײב"),
    8: ("repl", "מײד"), 9: ("repl", "בײט"), 10: ("repl", "בײס"),
    11: ("repl", "װײז"), 12: ("repl", "טרײב"), 13: ("repl", "לײט"),
    14: ("repl", "קלײב"), 15: ("repl", "רײב"), 16: ("repl", "רײס"),
    17: ("repl", "שװײג"), 18: ("repl", "שמײס"), 19: ("repl", "שנײד"),
    20: ("repl", "בינד"), 21: ("repl", "װיטש"), 22: ("repl", "זינג"),
    23: ("repl", "טרינק"), 24: ("repl", "צװינג"), 25: ("repl", "שלינג"),
    26: ("repl", "בײג"), 27: ("repl", "הײב"), 28: ("repl", "פארליר"),
    29: ("repl", "שטײ"), 30: ("repl", "שװער"), 31: ("repl", "ברענג"),
    32: ("repl", "ה"), 33: ("ist", None),
}
_STEM_ACTIONS = {
    1: "גײ", 2: "נעמ", 3: "מײד", 4: "בײט", 5: "בײס", 6: "װײז",
    7: "טרײב", 8: "לײט", 9: "קלײב", 10: "רײב", 11: "רײס",
    12: "שװײג", 13: "שמײס", 14: "שנײד", 15: "שרײב", 16: "בינד",
    17: "װיטש", 18: "זינג", 19: "טרינק", 20: "צװינג", 21: "שלינג",
    22: "בײג", 23: "הײב", 24: "פארליר", 25: "שטײ", 26: "שװער",
}


def _prelude(w: str) -> str:
    out = []
    i = 0
    n = len(w)
    while i < n:
        ch = w[i]
        two = w[i:i + 2]
        rep = None
        for dg, lig, block in _DIGRAPHS:
            if two == dg:
                nxt = w[i + 2] if i + 2 < n else ""
                if nxt != block:
                    rep = lig
                break
        if rep is not None:
            out.append(rep)
            i += 2
            continue
        out.append(_FINAL_MAP.get(ch, ch))
        i += 1
    return "".join(c for c in out if c not in _NIQQUD)


_GE = "GE"
_TSU = "TSU"


def _mark_prefix(w: str) -> tuple[str, int]:
    """Returns (marked word, char index where region scanning starts
    — i.e. past any prefix and marker)."""
    if w.startswith("גע"):
        rest = w[2:]
        if not (rest.startswith("לט") or rest.startswith("בנ")):
            return _GE + rest, 2
        return w, 0
    wb = w.encode("utf-8")
    res, nc = find_among(wb, 0, len(wb), _PREF)
    if res > 0:
        pref = wb[:nc].decode("utf-8")
        rest = wb[nc:].decode("utf-8")
        # a גע/צו AFTER a separable prefix becomes the marker; the
        # prefix letters themselves stay
        if rest.startswith("גע") and not rest.startswith("געבנ"):
            return pref + _GE + rest[2:], len(pref) + 2
        if rest.startswith("צו"):
            return pref + _TSU + rest[2:], len(pref) + 3
    return w, 0


_CLUSTERS = ("דזש", "שטר", "שטש", "שפר")


def _r1_b(w: str, start: int) -> int:
    """R1 as a byte offset (decoded from mark_regions at .so 0x553f0):
    hop 3 codepoints past the marker (hop failure leaves R1 at the
    limit); a consonant cluster (דזש/שטר/שטש/שפר) then three
    consonants anchor R1 right after them; otherwise R1 = max(position
    AT the first non-vowel following the first vowel run, the hop
    mark); no vowel also leaves it at the limit."""
    chars = list(w)
    bpos = [0]
    for ch in chars:
        bpos.append(bpos[-1] + len(ch.encode("utf-8")))
    n = len(chars)
    limit = bpos[n] + 1  # "past the limit": every R-gated action fails
    if n - start < 3:
        return limit
    hop = start + 3
    c = start
    if "".join(chars[c:c + 3]) in _CLUSTERS:
        c += 3
    if n - c >= 3 and all(ch in _CONS for ch in chars[c:c + 3]):
        return bpos[c + 3]
    i = start
    while i < n and chars[i] not in _VOWELS:
        i += 1
    if i >= n:
        return limit
    while i < n and chars[i] in _VOWELS:
        i += 1
    if i >= n:
        return limit
    return bpos[max(i, hop)] if max(i, hop) <= n else limit


def stem(word: str) -> str:
    w = _prelude(word)
    w, start = _mark_prefix(w)
    wb = w.encode("utf-8")
    r1 = _r1_b(w, start)
    lb = 0  # matching is not windowed; the branches carry the R gate

    # verb suffixes
    res, nc = find_among_b(wb, len(wb), lb, _VERB)
    if res > 0:
        kind, rep = _VERB_ACTIONS.get(res, (None, None))
        if kind == "ies":
            if nc >= r1:
                wb = wb[:nc] + "יע".encode("utf-8")
        elif kind == "del":
            if nc >= r1:
                wb = wb[:nc]
        elif kind == "del_t":
            if nc >= r1:
                # 'ט': delete, then the irregular-stem among applies
                wb = wb[:nc]
                res2, nc2 = find_among_b(wb, len(wb), lb, _STEMS)
                if res2 > 0:
                    wb = wb[:nc2] + _STEM_ACTIONS[res2].encode("utf-8")
            else:
                # R-check failed: the matched ט-family suffix is
                # rewritten to a bare ט (asm 0x55c3e)
                wb = wb[:nc] + "ט".encode("utf-8")
        elif kind == "repl":
            if res == 32:
                if nc >= r1:
                    wb = wb[:nc] + rep.encode("utf-8")
            else:
                wb = wb[:nc] + rep.encode("utf-8")
        elif kind == "ist":
            # 'יסט': after ג or ש the ט alone drops (-> יס); anywhere
            # else the whole suffix is deleted (both R-gated)
            if nc >= r1:
                ch, _i = _prev_char(wb, nc)
                if ch in ("ג", "ש"):
                    wb = wb[:nc] + "יס".encode("utf-8")
                else:
                    wb = wb[:nc]

    # ונג/שאפט/הײט/קײט family + diminutive ל
    res, nc = find_among_b(wb, len(wb), min(lb, len(wb)), _UNG)
    if res == 1 and nc >= r1:
        wb = wb[:nc]
    elif res == 2:
        # diminutive ל deleted after a CONSONANT (bitmap 0x6c13c)
        ch, _i = _prev_char(wb, nc)
        if ch in _CONS and nc >= r1:
            wb = wb[:nc]

    # iq family (בליק/גליק protected via result -1)
    res, nc = find_among_b(wb, len(wb), min(lb, len(wb)), _IQ)
    if res == 1 and nc >= r1:
        wb = wb[:nc]

    # drop the prefix markers wherever they ended up
    s = wb.decode("utf-8")
    s = s.replace(_GE, "").replace(_TSU, "")
    return s


def _prev_char(wb: bytes, c: int):
    if c <= 0:
        return "", c
    i = c - 1
    while i > 0 and (wb[i] & 0xC0) == 0x80:
        i -= 1
    return wb[i:c].decode("utf-8"), i
