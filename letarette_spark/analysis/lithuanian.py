"""Snowball Lithuanian stemmer — pure Python, bit-exact to the
compiled libstemmer 'lithuanian' UTF-8 stemmer the reference links
against (reference internal/snowball fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens).

Disassembly-verified shape (stem fn at .so ~0x4b060):

  mark R1 over v = a e i o u y ą ė ę į ū ų, starting the scan one
  character in when the word begins with 'a' and is longer than 6
  codepoints;
  backwards:
    do fix_conflicts  — rewrite aite/aitės->aitė, uote/uotės->uotė,
                        ėjime->ėjimas, esiu->esys, asius->asys,
                        avime->avimas, ojime->ojimas,
                        okate/okatės->okatė;
    do step1          — big ending among matched INSIDE an R1
                        setlimit window, delete;
    do fix_chdz       — č -> t, dž -> d;
    repeat step2      — second ending among, R1-windowed, delete;
    do fix_chdz
    do fix_gd         — trailing 'gd' -> 'g'.

Tables and fail-links recovered from the compiled library's ELF data
(tools/extract_among.py); matching via the faithful find_among_b
port (_among.py) — the R1 windows make naive longest-match diverge.

Pinned by tests/test_lithuanian_goldens.py against vectors captured
from the compiled library (tools/gen_snowball_goldens.py --lang
lithuanian).
"""

from __future__ import annotations

from letarette_spark.analysis._among import find_among_b, make_amongs

_VOWELS = frozenset("aeiouyąėęįūų")

_GD = make_amongs((
    ("gd", -1, 1),
))

_CHDZ = make_amongs((
    ("č", -1, 1), ("dž", -1, 2),
))

_CONFLICTS = make_amongs((
    ("ojime", -1, 7), ("ėjime", -1, 3), ("avime", -1, 6), ("okate", -1, 8),
    ("aite", -1, 1), ("uote", -1, 2), ("asius", -1, 5), ("okatės", -1, 8),
    ("aitės", -1, 1), ("uotės", -1, 2), ("esiu", -1, 4),
))

_STEP2 = make_amongs((
    ("ing", -1, -1), ("aj", -1, -1), ("iaj", 1, -1), ("iej", -1, -1),
    ("oj", -1, -1), ("ioj", 4, -1), ("uoj", 4, -1), ("iuoj", 6, -1),
    ("auj", -1, -1), ("ąj", -1, -1), ("iąj", 9, -1), ("ėj", -1, -1),
    ("ųj", -1, -1), ("iųj", 12, -1), ("ok", -1, -1), ("iok", 14, -1),
    ("iuk", -1, -1), ("uliuk", 16, -1), ("učiuk", 16, -1), ("išk", -1, -1),
    ("iul", -1, -1), ("yl", -1, -1), ("ėl", -1, -1), ("am", -1, -1),
    ("dam", 23, -1), ("jam", 23, -1), ("zgan", -1, -1), ("ain", -1, -1),
    ("esn", -1, -1), ("op", -1, -1), ("iop", 29, -1), ("ias", -1, -1),
    ("ies", -1, -1), ("ais", -1, -1), ("iais", 33, -1), ("os", -1, -1),
    ("ios", 35, -1), ("uos", 35, -1), ("iuos", 37, -1), ("aus", -1, -1),
    ("iaus", 39, -1), ("ąs", -1, -1), ("iąs", 41, -1), ("ęs", -1, -1),
    ("utėait", -1, -1), ("ant", -1, -1), ("iant", 45, -1),
    ("siant", 46, -1), ("int", -1, -1), ("ot", -1, -1), ("uot", 49, -1),
    ("iuot", 50, -1), ("yt", -1, -1), ("ėt", -1, -1), ("ykšt", -1, -1),
    ("iau", -1, -1), ("dav", -1, -1), ("sv", -1, -1), ("šv", -1, -1),
    ("ykšč", -1, -1), ("ę", -1, -1), ("ėję", 60, -1),
))

_STEP1 = make_amongs((
    ("a", -1, -1), ("ia", 0, -1), ("eria", 1, -1), ("osna", 0, -1),
    ("iosna", 3, -1), ("uosna", 3, -1), ("iuosna", 5, -1), ("ysna", 0, -1),
    ("ėsna", 0, -1), ("e", -1, -1), ("ie", 9, -1), ("enie", 10, -1),
    ("erie", 10, -1), ("oje", 9, -1), ("ioje", 13, -1), ("uje", 9, -1),
    ("iuje", 15, -1), ("yje", 9, -1), ("enyje", 17, -1), ("eryje", 17, -1),
    ("ėje", 9, -1), ("ame", 9, -1), ("iame", 21, -1), ("sime", 9, -1),
    ("ome", 9, -1), ("ėme", 9, -1), ("tumėme", 25, -1), ("ose", 9, -1),
    ("iose", 27, -1), ("uose", 27, -1), ("iuose", 29, -1), ("yse", 9, -1),
    ("enyse", 31, -1), ("eryse", 31, -1), ("ėse", 9, -1), ("ate", 9, -1),
    ("iate", 35, -1), ("ite", 9, -1), ("kite", 37, -1), ("site", 37, -1),
    ("ote", 9, -1), ("tute", 9, -1), ("ėte", 9, -1), ("tumėte", 42, -1),
    ("i", -1, -1), ("ai", 44, -1), ("iai", 45, -1), ("eriai", 46, -1),
    ("ei", 44, -1), ("tumei", 48, -1), ("ki", 44, -1), ("imi", 44, -1),
    ("erimi", 51, -1), ("umi", 44, -1), ("iumi", 53, -1), ("si", 44, -1),
    ("asi", 55, -1), ("iasi", 56, -1), ("esi", 55, -1), ("iesi", 58, -1),
    ("siesi", 59, -1), ("isi", 55, -1), ("aisi", 61, -1), ("eisi", 61, -1),
    ("tumeisi", 63, -1), ("uisi", 61, -1), ("osi", 55, -1),
    ("ėjosi", 66, -1), ("uosi", 66, -1), ("iuosi", 68, -1),
    ("siuosi", 69, -1), ("usi", 55, -1), ("ausi", 71, -1),
    ("čiausi", 72, -1), ("ąsi", 55, -1), ("ėsi", 55, -1), ("ųsi", 55, -1),
    ("tųsi", 76, -1), ("ti", 44, -1), ("enti", 78, -1), ("inti", 78, -1),
    ("oti", 78, -1), ("ioti", 81, -1), ("uoti", 81, -1), ("iuoti", 83, -1),
    ("auti", 78, -1), ("iauti", 85, -1), ("yti", 78, -1), ("ėti", 78, -1),
    ("telėti", 88, -1), ("inėti", 88, -1), ("terėti", 88, -1),
    ("ui", 44, -1), ("iui", 92, -1), ("eniui", 93, -1), ("oj", -1, -1),
    ("ėj", -1, -1), ("k", -1, -1), ("am", -1, -1), ("iam", 98, -1),
    ("iem", -1, -1), ("im", -1, -1), ("sim", 101, -1), ("om", -1, -1),
    ("tum", -1, -1), ("ėm", -1, -1), ("tumėm", 105, -1), ("an", -1, -1),
    ("on", -1, -1), ("ion", 108, -1), ("un", -1, -1), ("iun", 110, -1),
    ("ėn", -1, -1), ("o", -1, -1), ("io", 113, -1), ("enio", 114, -1),
    ("ėjo", 113, -1), ("uo", 113, -1), ("s", -1, -1), ("as", 118, -1),
    ("ias", 119, -1), ("es", 118, -1), ("ies", 121, -1), ("is", 118, -1),
    ("ais", 123, -1), ("iais", 124, -1), ("tumeis", 123, -1),
    ("imis", 123, -1), ("enimis", 127, -1), ("omis", 123, -1),
    ("iomis", 129, -1), ("umis", 123, -1), ("ėmis", 123, -1),
    ("enis", 123, -1), ("asis", 123, -1), ("ysis", 123, -1),
    ("ams", 118, -1), ("iams", 136, -1), ("iems", 118, -1),
    ("ims", 118, -1), ("enims", 139, -1), ("erims", 139, -1),
    ("oms", 118, -1), ("ioms", 142, -1), ("ums", 118, -1),
    ("ėms", 118, -1), ("ens", 118, -1), ("os", 118, -1), ("ios", 147, -1),
    ("uos", 147, -1), ("iuos", 149, -1), ("ers", 118, -1), ("us", 118, -1),
    ("aus", 152, -1), ("iaus", 153, -1), ("ius", 152, -1), ("ys", 118, -1),
    ("enys", 156, -1), ("erys", 156, -1), ("ąs", 118, -1),
    ("iąs", 159, -1), ("ės", 118, -1), ("amės", 161, -1),
    ("iamės", 162, -1), ("imės", 161, -1), ("kimės", 164, -1),
    ("simės", 164, -1), ("omės", 161, -1), ("ėmės", 161, -1),
    ("tumėmės", 168, -1), ("atės", 161, -1), ("iatės", 170, -1),
    ("sitės", 161, -1), ("otės", 161, -1), ("ėtės", 161, -1),
    ("tumėtės", 174, -1), ("ūs", 118, -1), ("įs", 118, -1),
    ("tųs", 118, -1), ("at", -1, -1), ("iat", 179, -1), ("it", -1, -1),
    ("sit", 181, -1), ("ot", -1, -1), ("ėt", -1, -1), ("tumėt", 184, -1),
    ("u", -1, -1), ("au", 186, -1), ("iau", 187, -1), ("čiau", 188, -1),
    ("iu", 186, -1), ("eniu", 190, -1), ("siu", 190, -1), ("y", -1, -1),
    ("ą", -1, -1), ("ią", 194, -1), ("ė", -1, -1), ("ę", -1, -1),
    ("į", -1, -1), ("enį", 198, -1), ("erį", 198, -1), ("ų", -1, -1),
    ("ių", 201, -1), ("erų", 201, -1),
))

_CONFLICT_REPL = {
    1: "aitė", 2: "uotė", 3: "ėjimas", 4: "esys", 5: "asys",
    6: "avimas", 7: "ojimas", 8: "okatė",
}


def _r1_b(word: str) -> int:
    chars = list(word)
    start = 1 if (chars and chars[0] == "a" and len(chars) > 6) else 0
    bpos = [0]
    for ch in chars:
        bpos.append(bpos[-1] + len(ch.encode("utf-8")))
    n = bpos[-1]
    i = start
    while i < len(chars) and chars[i] not in _VOWELS:
        i += 1
    while i < len(chars) and chars[i] in _VOWELS:
        i += 1
    return bpos[i + 1] if i < len(chars) else n


def _fix_chdz(wb: bytes) -> bytes:
    res, nc = find_among_b(wb, len(wb), 0, _CHDZ)
    if res == 1:
        return wb[:nc] + b"t"
    if res == 2:
        return wb[:nc] + b"d"
    return wb


def stem(word: str) -> str:
    r1 = _r1_b(word)
    wb = word.encode("utf-8")

    res, nc = find_among_b(wb, len(wb), 0, _CONFLICTS)
    if res > 0:
        wb = wb[:nc] + _CONFLICT_REPL[res].encode("utf-8")

    if len(wb) >= r1:
        res, nc = find_among_b(wb, len(wb), r1, _STEP1)
        if res != 0 and nc >= r1:
            wb = wb[:nc]

    wb = _fix_chdz(wb)

    while len(wb) >= r1:
        res, nc = find_among_b(wb, len(wb), r1, _STEP2)
        if res == 0:
            break
        wb = wb[:nc]

    wb = _fix_chdz(wb)

    res, nc = find_among_b(wb, len(wb), 0, _GD)
    if res != 0:
        wb = wb[:nc] + b"g"
    return wb.decode("utf-8")
