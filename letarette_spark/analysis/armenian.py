"""Snowball Armenian stemmer — pure Python, bit-exact to the compiled
libstemmer 'armenian' UTF-8 stemmer the reference links against
(reference internal/snowball fetches libstemmer_c; snowball.c:210-220
runs the configured stemmer chain over folded tokens).

Four delete-only suffix amongs applied in sequence — case endings
(inside an R2 setlimit window), then verb, adjective, and noun
suffixes (each inside an RV window, RV = after the first vowel).
Vowel grouping: ա ե է ը ի ո ւ օ (NOT և).  Entry order and
substring_i fail-links recovered from the compiled library's data
(tools/extract_among.py); matching runs through the faithful
find_among_b port (_among.py) because the setlimit windows make
naive longest-match diverge ('բությանն' falls back from 'ությանն'
to 'ն' inside the window; 'մեծությանն' does not).  Sequencing pinned
by probing: 'մեծակել' -> 'մեծ' (verb then noun), 'գրերենակ' ->
'գրերեն' (adjective precedes noun).

Pinned by tests/test_armenian_goldens.py against vectors captured
from the compiled library (tools/gen_snowball_goldens.py --lang
armenian).
"""

from __future__ import annotations

from letarette_spark.analysis._among import find_among_b, make_amongs

_VOWELS = frozenset("աեէըիուօ".encode("utf-8")[1::2])
_VOWEL_CHARS = frozenset("աեէըիուօ")

_ENDING = make_amongs((
    ("եր", -1, 1), ("ներ", 0, 1), ("ց", -1, 1), ("ուց", 2, 1),
    ("ից", 2, 1), ("երից", 4, 1), ("ներից", 5, 1), ("ցից", 4, 1),
    ("վանից", 4, 1), ("ոջից", 4, 1), ("վից", 4, 1), ("ոց", 2, 1),
    ("սա", -1, 1), ("վա", -1, 1), ("ամբ", -1, 1), ("դ", -1, 1),
    ("երդ", 15, 1), ("ներդ", 16, 1), ("ուդ", 15, 1), ("անդ", 15, 1),
    ("ությանդ", 19, 1), ("վանդ", 19, 1), ("ոջդ", 15, 1), ("ը", -1, 1),
    ("երը", 23, 1), ("ները", 24, 1), ("անը", 23, 1), ("ությանը", 26, 1),
    ("վանը", 26, 1), ("ոջը", 23, 1), ("ի", -1, 1), ("երի", 30, 1),
    ("ների", 31, 1), ("վի", 30, 1), ("երում", -1, 1), ("ներում", 34, 1),
    ("անում", -1, 1), ("ն", -1, 1), ("երն", 37, 1), ("ներն", 38, 1),
    ("ուն", 37, 1), ("ան", 37, 1), ("ության", 41, 1), ("վան", 41, 1),
    ("ին", 37, 1), ("երին", 44, 1), ("ներին", 45, 1), ("ությանն", 37, 1),
    ("ոջ", -1, 1), ("ությանս", -1, 1), ("վանս", -1, 1), ("ոջս", -1, 1),
    ("ով", -1, 1), ("երով", 52, 1), ("ներով", 53, 1), ("անով", 52, 1),
    ("վով", 52, 1),
))

_NOUN = make_amongs((
    ("գար", -1, 1), ("վոր", -1, 1), ("ավոր", 1, 1), ("անօց", -1, 1),
    ("ոց", -1, 1), ("ու", -1, 1), ("ք", -1, 1), ("արք", 6, 1),
    ("չեք", 6, 1), ("իք", 6, 1), ("ալիք", 9, 1), ("անիք", 9, 1),
    ("վածք", 6, 1), ("ույք", 6, 1), ("ունք", 6, 1), ("մունք", 14, 1),
    ("ենք", 6, 1), ("ոնք", 6, 1), ("իչք", 6, 1), ("որդ", -1, 1),
    ("ույթ", -1, 1), ("ցի", -1, 1), ("ուհի", -1, 1), ("իլ", -1, 1),
    ("ուկ", -1, 1), ("ակ", -1, 1), ("յակ", 25, 1), ("անակ", 25, 1),
    ("իկ", -1, 1), ("յուն", -1, 1), ("ություն", 29, 1), ("ան", -1, 1),
    ("արան", 31, 1), ("պան", 31, 1), ("ստան", 31, 1), ("եղէն", -1, 1),
    ("ածո", -1, 1), ("իչ", -1, 1), ("ուս", -1, 1), ("ուստ", -1, 1),
))

_VERB = make_amongs((
    ("ար", -1, 1), ("ացար", 0, 1), ("եցար", 0, 1), ("ացրիր", -1, 1),
    ("ացիր", -1, 1), ("եցիր", -1, 1), ("վեցիր", 5, 1), ("ալուց", -1, 1),
    ("ելուց", -1, 1), ("աց", -1, 1), ("եց", -1, 1), ("ացրեց", 10, 1),
    ("ալու", -1, 1), ("ելու", -1, 1), ("աք", -1, 1), ("ցաք", 14, 1),
    ("ացաք", 15, 1), ("ացրիք", -1, 1), ("ացիք", -1, 1), ("եցիք", -1, 1),
    ("վեցիք", 19, 1), ("անք", -1, 1), ("ցանք", 21, 1), ("ացանք", 22, 1),
    ("ացրինք", -1, 1), ("ացինք", -1, 1), ("եցինք", -1, 1),
    ("վեցինք", 26, 1), ("ա", -1, 1), ("ացա", 28, 1), ("եցա", 28, 1),
    ("վե", -1, 1), ("ացրի", -1, 1), ("ացի", -1, 1), ("եցի", -1, 1),
    ("վեցի", 34, 1), ("ալ", -1, 1), ("ըալ", 36, 1), ("ացնալ", 36, 1),
    ("անալ", 36, 1), ("ենալ", 36, 1), ("ել", -1, 1), ("ըել", 41, 1),
    ("նել", 41, 1), ("ցնել", 43, 1), ("եցնել", 44, 1), ("չել", 41, 1),
    ("վել", 41, 1), ("ացվել", 47, 1), ("եցվել", 47, 1), ("տել", 41, 1),
    ("ատել", 50, 1), ("ոտել", 50, 1), ("կոտել", 52, 1), ("ված", -1, 1),
    ("ում", -1, 1), ("վում", 55, 1), ("ան", -1, 1), ("ցան", 57, 1),
    ("ացան", 58, 1), ("ացրին", -1, 1), ("ացին", -1, 1), ("եցին", -1, 1),
    ("վեցին", 62, 1), ("ալիս", -1, 1), ("ելիս", -1, 1), ("ավ", -1, 1),
    ("ացավ", 66, 1), ("եցավ", 66, 1), ("ալով", -1, 1), ("ելով", -1, 1),
))

_ADJECTIVE = make_amongs((
    ("բար", -1, 1), ("րորդ", -1, 1), ("երորդ", 1, 1), ("ալի", -1, 1),
    ("ակի", -1, 1), ("որակ", -1, 1), ("եղ", -1, 1), ("վուն", -1, 1),
    ("արան", -1, 1), ("ական", -1, 1), ("են", -1, 1), ("երեն", 10, 1),
    ("եկեն", 10, 1), ("որէն", -1, 1), ("ին", -1, 1), ("գին", 14, 1),
    ("ովին", 14, 1), ("լայն", -1, 1), ("պես", -1, 1), ("իվ", -1, 1),
    ("ատ", -1, 1), ("ավետ", -1, 1), ("կոտ", -1, 1),
))

def _regions_b(word: str) -> tuple[int, int]:
    """(pV, R2) as BYTE offsets into the UTF-8 encoding."""
    positions = []  # (byte_pos, is_vowel)
    bpos = 0
    for ch in word:
        positions.append((bpos, ch in _VOWEL_CHARS))
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
    return pv, r2


def stem(word: str) -> str:
    """Disassembly-verified shape (stem fn at .so 0x42670): the whole
    backwards block runs under `setlimit tomark pV` — lb = pV windows
    the MATCHING of all four amongs — then: ending deletes only when
    the cut is >= p2 (a successful match with a failed check deletes
    nothing and does NOT fall back), verb/adjective/noun delete
    unconditionally on any windowed match."""
    pv, p2 = _regions_b(word)
    wb = word.encode("utf-8")
    res, nc = find_among_b(wb, len(wb), pv, _ENDING)
    if res > 0 and nc >= p2:
        wb = wb[:nc]
    for tbl in (_VERB, _ADJECTIVE, _NOUN):
        lb = min(pv, len(wb))
        res, nc = find_among_b(wb, len(wb), lb, tbl)
        if res > 0:
            wb = wb[:nc]
    return wb.decode("utf-8")
