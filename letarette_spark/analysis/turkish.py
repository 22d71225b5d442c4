"""Snowball Turkish stemmer — pure Python, bit-exact to the compiled
libstemmer 'turkish' UTF-8 stemmer the reference links against
(reference internal/snowball fetches libstemmer_c; snowball.c:210-220
runs the configured stemmer chain over folded tokens).

The published algorithm (Evren Kapusuz Cilden's contributed stemmer),
with every behavioral detail pinned against the compiled library
(tools/probe_stemmer.py + the disassembled dispatcher):

- vowel harmony: the word's final vowel keys a compatible-set scan of
  earlier vowels (a:aıou e:eiöü ı:aı i:ei o:ou ö:öü u:ou ü:öü);
- optional-consonant pattern for y/n/s buffers: the buffer consonant
  must be preceded by a vowel, and a suffix WITHOUT the buffer must
  attach directly to a non-vowel — a failed buffer test does not fall
  back ('evsi' keeps its i because the s is there but not after a
  vowel);
- possessive optional-U: U must follow a non-vowel, and a bare m/n/z
  suffix attaches only to a NON-U vowel ('odam' strips, 'odaım' and
  'telm' do not); no harmony gate on possessives ('kitapüm' strips);
- nominal-verb chain, noun chain, and the recursive ki-chain, then
  append-U-to-d/g stems and final consonant devoicing (b/c/d/ğ ->
  p/ç/t/k).

Tables and fail-links recovered from the compiled library's ELF data
(tools/extract_among.py); matching via the faithful find_among_b port
(_among.py).  Words with fewer than two vowels are left untouched.

Pinned by tests/test_turkish_goldens.py against vectors captured from
the compiled library (tools/gen_snowball_goldens.py --lang turkish).
"""

from __future__ import annotations

from letarette_spark.analysis._among import find_among_b, make_amongs

_VOWELS = frozenset("aeıioöuü")
_U = frozenset("ıiuü")
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"), "ı": frozenset("aı"),
    "i": frozenset("ei"), "o": frozenset("ou"), "ö": frozenset("öü"),
    "u": frozenset("ou"), "ü": frozenset("öü"),
}

_POST = make_amongs((
    ("b", -1, 1), ("c", -1, 2), ("d", -1, 3), ("ğ", -1, 4),
))

_YMUS = make_amongs((
    ("miş", -1, -1), ("muş", -1, -1), ("mış", -1, -1), ("müş", -1, -1),
))

_YSA = make_amongs((
    ("sa", -1, -1), ("se", -1, -1), ("sak", -1, -1), ("sek", -1, -1),
    ("sam", -1, -1), ("sem", -1, -1), ("san", -1, -1), ("sen", -1, -1),
))

_YDU = make_amongs((
    ("di", -1, -1), ("ti", -1, -1), ("dik", -1, -1), ("tik", -1, -1),
    ("duk", -1, -1), ("tuk", -1, -1), ("dık", -1, -1), ("tık", -1, -1),
    ("dük", -1, -1), ("tük", -1, -1), ("dim", -1, -1), ("tim", -1, -1),
    ("dum", -1, -1), ("tum", -1, -1), ("dım", -1, -1), ("tım", -1, -1),
    ("düm", -1, -1), ("tüm", -1, -1), ("din", -1, -1), ("tin", -1, -1),
    ("dun", -1, -1), ("tun", -1, -1), ("dın", -1, -1), ("tın", -1, -1),
    ("dün", -1, -1), ("tün", -1, -1), ("du", -1, -1), ("tu", -1, -1),
    ("dı", -1, -1), ("tı", -1, -1), ("dü", -1, -1), ("tü", -1, -1),
))

_CASINA = make_amongs((
    ("casına", -1, -1), ("cesine", -1, -1),
))

_DUR = make_amongs((
    ("dir", -1, -1), ("tir", -1, -1), ("dur", -1, -1), ("tur", -1, -1),
    ("dır", -1, -1), ("tır", -1, -1), ("dür", -1, -1), ("tür", -1, -1),
))

_NUZ = make_amongs((
    ("niz", -1, -1), ("nuz", -1, -1), ("nız", -1, -1), ("nüz", -1, -1),
))

_LAR = make_amongs((
    ("lar", -1, -1), ("ler", -1, -1),
))

_SUNUZ = make_amongs((
    ("siniz", -1, -1), ("sunuz", -1, -1), ("sınız", -1, -1),
    ("sünüz", -1, -1),
))

_YUZ = make_amongs((
    ("iz", -1, -1), ("uz", -1, -1), ("ız", -1, -1), ("üz", -1, -1),
))

_SUN = make_amongs((
    ("sin", -1, -1), ("sun", -1, -1), ("sın", -1, -1), ("sün", -1, -1),
))

_YUM = make_amongs((
    ("im", -1, -1), ("um", -1, -1), ("ım", -1, -1), ("üm", -1, -1),
))

_NCA = make_amongs((
    ("ca", -1, -1), ("ce", -1, -1),
))

_YLA = make_amongs((
    ("la", -1, -1), ("le", -1, -1),
))

_NDAN = make_amongs((
    ("ndan", -1, -1), ("nden", -1, -1),
))

_DAN = make_amongs((
    ("dan", -1, -1), ("tan", -1, -1), ("den", -1, -1), ("ten", -1, -1),
))

_NDA = make_amongs((
    ("nda", -1, -1), ("nde", -1, -1),
))

_DA = make_amongs((
    ("da", -1, -1), ("ta", -1, -1), ("de", -1, -1), ("te", -1, -1),
))

_NA = make_amongs((
    ("na", -1, -1), ("ne", -1, -1),
))

_YA = make_amongs((
    ("a", -1, -1), ("e", -1, -1),
))

_NUN = make_amongs((
    ("in", -1, -1), ("un", -1, -1), ("ın", -1, -1), ("ün", -1, -1),
))

_NU = make_amongs((
    ("ni", -1, -1), ("nu", -1, -1), ("nı", -1, -1), ("nü", -1, -1),
))

_LARI = make_amongs((
    ("leri", -1, -1), ("ları", -1, -1),
))

_POSS = make_amongs((
    ("m", -1, -1), ("n", -1, -1), ("miz", -1, -1), ("niz", -1, -1),
    ("muz", -1, -1), ("nuz", -1, -1), ("mız", -1, -1), ("nız", -1, -1),
    ("müz", -1, -1), ("nüz", -1, -1),
))

def _prev(wb: bytes, c: int) -> tuple[str, int]:
    """Char ending at byte offset c (returns ('', c) at the limit)."""
    if c <= 0:
        return "", c
    i = c - 1
    while i > 0 and (wb[i] & 0xC0) == 0x80:
        i -= 1
    return wb[i:c].decode("utf-8"), i


def _harmony(wb: bytes, c: int) -> bool:
    ch, i = _prev(wb, c)
    while ch and ch not in _VOWELS:
        ch, i = _prev(wb, i)
    if not ch:
        return False
    allowed = _HARMONY[ch]
    ch, i = _prev(wb, i)
    while ch:
        if ch in allowed:
            return True
        ch, i = _prev(wb, i)
    return False


def _opt_c(wb: bytes, c: int, letter: str):
    """Optional buffer consonant (decoded from the compiled helper at
    .so 0x532b0): if the char at the cursor IS the buffer letter,
    consume it and require a vowel before it; otherwise hop over one
    char unchecked and require a vowel before THAT (so the suffix
    attaches through exactly one consonant: 'katı' strips its ı,
    'aklı' with the kl cluster does not).  No fallback from a failed
    letter branch.  Returns the new cursor or None."""
    ch, i = _prev(wb, c)
    if ch == letter:
        ch2, _ = _prev(wb, i)
        return i if ch2 in _VOWELS else None
    if not ch:
        return None
    ch2, _ = _prev(wb, i)
    return c if ch2 in _VOWELS else None


def _mark_among(tbl, with_harmony=True, opt=None):
    def mark(wb: bytes, c: int):
        if with_harmony and not _harmony(wb, c):
            return None
        res, nc = find_among_b(wb, c, 0, tbl)
        if res == 0:
            return None
        if opt is not None:
            return _opt_c(wb, nc, opt)
        return nc
    return mark


def _make_marks():
    g = globals()
    g["_mark_ymUs"] = _mark_among(_YMUS, True, "y")
    g["_mark_ysA"] = _mark_among(_YSA, False, "y")
    g["_mark_yDU"] = _mark_among(_YDU, True, "y")
    g["_mark_cAsInA"] = _mark_among(_CASINA, True, None)
    g["_mark_DUr"] = _mark_among(_DUR, True, None)
    g["_mark_nUz"] = _mark_among(_NUZ, True, None)
    g["_mark_lAr"] = _mark_among(_LAR, True, None)
    g["_mark_sUnUz"] = _mark_among(_SUNUZ, False, None)
    g["_mark_yUz"] = _mark_among(_YUZ, True, "y")
    g["_mark_sUn"] = _mark_among(_SUN, True, None)
    g["_mark_yUm"] = _mark_among(_YUM, True, "y")
    g["_mark_ncA"] = _mark_among(_NCA, True, "n")
    g["_mark_ylA"] = _mark_among(_YLA, True, "y")
    g["_mark_ndAn"] = _mark_among(_NDAN, True, None)
    g["_mark_DAn"] = _mark_among(_DAN, True, None)
    g["_mark_ndA"] = _mark_among(_NDA, True, None)
    g["_mark_DA"] = _mark_among(_DA, True, None)
    g["_mark_nA"] = _mark_among(_NA, True, None)
    g["_mark_yA"] = _mark_among(_YA, True, "y")
    g["_mark_nUn"] = _mark_among(_NUN, True, "n")
    g["_mark_nU"] = _mark_among(_NU, True, None)
    g["_mark_lArI"] = _mark_among(_LARI, False, None)


_make_marks()


def _mark_yken(wb: bytes, c: int):
    # no harmony gate ('çocukken' strips despite o/u before the e)
    if wb[:c].endswith("ken".encode("utf-8")):
        return _opt_c(wb, c - 3, "y")
    return None


def _mark_ki(wb: bytes, c: int):
    if wb[:c].endswith(b"ki"):
        return c - 2
    return None


def _mark_possessives(wb: bytes, c: int):
    res, nc = find_among_b(wb, c, 0, _POSS)
    if res == 0:
        return None
    # optional U: ('U' test non-vowel) or (hop 1 test non-vowel)
    ch, i = _prev(wb, nc)
    if not ch:
        return None
    if ch in _U:
        ch2, _ = _prev(wb, i)
        return i if (ch2 and ch2 not in _VOWELS) else None
    ch2, _ = _prev(wb, i)
    return nc if (ch2 and ch2 not in _VOWELS) else None


def _mark_sU(wb: bytes, c: int):
    if not _harmony(wb, c):
        return None
    ch, i = _prev(wb, c)
    if ch not in _U:
        return None
    return _opt_c(wb, i, "s")


def _mark_yU(wb: bytes, c: int):
    if not _harmony(wb, c):
        return None
    ch, i = _prev(wb, c)
    if ch not in _U:
        return None
    return _opt_c(wb, i, "y")


class _W:
    """Word state: bytes, cursor c, and the '[' mark ket.

    Backwards semantics: '[' sets ket := c; marks move c left;
    '] delete' removes [c, ket).  Alternatives before their first
    delete are pure cursor movement, so restoring c (to ket) undoes
    them."""

    __slots__ = ("b", "c", "ket")

    def __init__(self, b: bytes):
        self.b = b
        self.c = len(b)
        self.ket = len(b)

    def bra(self):
        self.ket = self.c

    def reset(self):
        self.c = self.ket

    def delete(self):
        self.b = self.b[: self.c] + self.b[self.ket:]
        self.ket = self.c

    def restore_c(self):
        self.c = self.ket

    def top(self):
        """Re-anchor at the word end — used between top-level
        alternatives, where nothing has been deleted yet but a nested
        ki-chain attempt may have moved both c and ket."""
        self.c = self.ket = len(self.b)


def _try_mark(w: _W, mark) -> bool:
    nc = mark(w.b, w.c)
    if nc is None:
        return False
    w.c = nc
    return True


def _stem_nominal_verb_suffixes(w: _W) -> bool:
    w.bra()
    cont = True
    # alt 1: (ymUs | yDU | ysA | yken) -> delete
    if (_try_mark(w, _mark_ymUs) or _try_mark(w, _mark_yDU)
            or _try_mark(w, _mark_ysA) or _try_mark(w, _mark_yken)):
        w.delete()
        return cont
    w.top()
    # alt 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|true) ymUs -> delete
    if _try_mark(w, _mark_cAsInA):
        saved = w.c
        if not (_try_mark(w, _mark_sUnUz) or _try_mark(w, _mark_lAr)
                or _try_mark(w, _mark_yUm) or _try_mark(w, _mark_sUn)
                or _try_mark(w, _mark_yUz)):
            w.c = saved
        if _try_mark(w, _mark_ymUs):
            w.delete()
            return cont
    w.top()
    # alt 3: lAr -> delete, try([ (DUr|yDU|ysA|ymUs) ] delete), no-noun
    if _try_mark(w, _mark_lAr):
        w.delete()
        w.bra()
        if (_try_mark(w, _mark_DUr) or _try_mark(w, _mark_yDU)
                or _try_mark(w, _mark_ysA) or _try_mark(w, _mark_ymUs)):
            w.delete()
        else:
            w.reset()
        return False
    w.top()
    # alt 4: nUz (yDU | ysA) -> delete
    if _try_mark(w, _mark_nUz):
        if _try_mark(w, _mark_yDU) or _try_mark(w, _mark_ysA):
            w.delete()
            return cont
    w.top()
    # alt 5: (sUnUz|yUz|sUn|yUm) -> delete, try([ ymUs ] delete)
    if (_try_mark(w, _mark_sUnUz) or _try_mark(w, _mark_yUz)
            or _try_mark(w, _mark_sUn) or _try_mark(w, _mark_yUm)):
        w.delete()
        w.bra()
        if _try_mark(w, _mark_ymUs):
            w.delete()
        else:
            w.reset()
        return cont
    w.top()
    # alt 6: DUr -> delete, try([ (sUnUz|lAr|yUm|sUn|yUz|true) ymUs ] del)
    if _try_mark(w, _mark_DUr):
        w.delete()
        w.bra()
        saved = w.c
        if not (_try_mark(w, _mark_sUnUz) or _try_mark(w, _mark_lAr)
                or _try_mark(w, _mark_yUm) or _try_mark(w, _mark_sUn)
                or _try_mark(w, _mark_yUz)):
            w.c = saved
        if _try_mark(w, _mark_ymUs):
            w.delete()
        else:
            w.reset()
    else:
        w.reset()
    return cont


def _ki_chain(w: _W) -> bool:
    """stem_suffix_chain_before_ki at the current cursor."""
    w.bra()
    if not _try_mark(w, _mark_ki):
        w.reset()
        return False
    after_ki = w.c
    # branch DA
    if _try_mark(w, _mark_DA):
        w.delete()
        w.bra()
        if _try_mark(w, _mark_lAr):
            w.delete()
            _ki_chain(w)
        else:
            w.reset()
            if _try_mark(w, _mark_possessives):
                w.delete()
                w.bra()
                if _try_mark(w, _mark_lAr):
                    w.delete()
                    _ki_chain(w)
                else:
                    w.reset()
            else:
                w.reset()
        return True
    w.c = after_ki
    # branch nUn
    if _try_mark(w, _mark_nUn):
        w.delete()
        w.bra()
        if _try_mark(w, _mark_lArI):
            w.delete()
        else:
            w.reset()
            if _try_mark(w, _mark_possessives) or _try_mark(w, _mark_sU):
                w.delete()
                w.bra()
                if _try_mark(w, _mark_lAr):
                    w.delete()
                    _ki_chain(w)
                else:
                    w.reset()
            else:
                w.reset()
                _ki_chain(w)
        return True
    w.c = after_ki
    # branch ndA
    if _try_mark(w, _mark_ndA):
        if _try_mark(w, _mark_lArI):
            w.delete()
            return True
        w.c = after_ki
        _try_mark(w, _mark_ndA)
        if _try_mark(w, _mark_sU):
            w.delete()
            w.bra()
            if _try_mark(w, _mark_lAr):
                w.delete()
                _ki_chain(w)
            else:
                w.reset()
            return True
        w.c = after_ki
        _try_mark(w, _mark_ndA)
        if _ki_chain(w):
            return True
    w.reset()
    return False


def _stem_noun_suffixes(w: _W) -> bool:
    # alt 1: [lAr] delete try(ki_chain)
    w.bra()
    if _try_mark(w, _mark_lAr):
        w.delete()
        _ki_chain(w)
        return True
    w.top()
    # alt 2: [ncA] delete try( [lArI] del | [(poss|sU)] del try([lAr] del ki) | [lAr] del ki )
    if _try_mark(w, _mark_ncA):
        w.delete()
        w.bra()
        if _try_mark(w, _mark_lArI):
            w.delete()
        else:
            w.reset()
            if _try_mark(w, _mark_possessives) or _try_mark(w, _mark_sU):
                w.delete()
                w.bra()
                if _try_mark(w, _mark_lAr):
                    w.delete()
                    _ki_chain(w)
                else:
                    w.reset()
            else:
                w.reset()
                if _try_mark(w, _mark_lAr):
                    w.delete()
                    _ki_chain(w)
                else:
                    w.reset()
        return True
    w.top()
    # alt 3: [(ndA|nA)] ( lArI del | sU del try([lAr] del ki) | ki_chain )
    if _try_mark(w, _mark_ndA) or (w.restore_c() or _try_mark(w, _mark_nA)):
        mark_end = w.c
        if _try_mark(w, _mark_lArI):
            w.delete()
            return True
        w.c = mark_end
        if _try_mark(w, _mark_sU):
            w.delete()
            w.bra()
            if _try_mark(w, _mark_lAr):
                w.delete()
                _ki_chain(w)
            else:
                w.reset()
            return True
        w.c = mark_end
        if _ki_chain(w):
            return True
    w.top()
    # alt 4: [(ndAn|nU)] ( sU del try([lAr] del ki) | lArI del )
    if _try_mark(w, _mark_ndAn) or (w.restore_c() or _try_mark(w, _mark_nU)):
        mark_end = w.c
        if _try_mark(w, _mark_sU):
            w.delete()
            w.bra()
            if _try_mark(w, _mark_lAr):
                w.delete()
                _ki_chain(w)
            else:
                w.reset()
            return True
        w.c = mark_end
        if _try_mark(w, _mark_lArI):
            w.delete()
            return True
    w.top()
    # alt 5: [DAn] del try([ poss del try([lAr] del ki) | lAr del try(ki) | ki ])
    if _try_mark(w, _mark_DAn):
        w.delete()
        w.bra()
        if _try_mark(w, _mark_possessives):
            w.delete()
            w.bra()
            if _try_mark(w, _mark_lAr):
                w.delete()
                _ki_chain(w)
            else:
                w.reset()
        else:
            w.reset()
            if _try_mark(w, _mark_lAr):
                w.delete()
                _ki_chain(w)
            else:
                w.reset()
                _ki_chain(w)
        return True
    w.top()
    # alt 6: [(nUn|ylA)] del try( [lAr] del ki | [(poss|sU)] del try([lAr] del ki) | ki )
    if _try_mark(w, _mark_nUn) or (w.restore_c() or _try_mark(w, _mark_ylA)):
        w.delete()
        # try( [lAr] del ki  |  [poss|sU] del try([lAr] del ki)  | ki )
        # NB: a failed branch KEEPS its deletions ('günlerin' -> g).
        w.bra()
        done = False
        if _try_mark(w, _mark_lAr):
            w.delete()
            done = _ki_chain(w)
        if not done:
            w.top()
            if _try_mark(w, _mark_possessives) or (
                w.restore_c() or _try_mark(w, _mark_sU)
            ):
                w.delete()
                w.bra()
                if _try_mark(w, _mark_lAr):
                    w.delete()
                    _ki_chain(w)
                else:
                    w.reset()
            else:
                w.top()
                _ki_chain(w)
        return True
    w.top()
    # alt 7: [lArI] delete
    if _try_mark(w, _mark_lArI):
        w.delete()
        return True
    w.top()
    # alt 8: ki_chain
    if _ki_chain(w):
        return True
    w.top()
    # alt 9: [(DA|yU|yA)] del try([ (poss del try([lAr]) | lAr) ] del [ ki )
    if (_try_mark(w, _mark_DA) or (w.restore_c() or _try_mark(w, _mark_yU))
            or (w.restore_c() or _try_mark(w, _mark_yA))):
        w.delete()
        w.bra()
        ok = False
        if _try_mark(w, _mark_possessives):
            w.delete()
            w.bra()
            if not _try_mark(w, _mark_lAr):
                w.reset()
            ok = True
        else:
            w.reset()
            if _try_mark(w, _mark_lAr):
                ok = True
        if ok:
            w.delete()
            _ki_chain(w)
        else:
            w.reset()
        return True
    w.top()
    # alt 10: [(poss|sU)] del try([lAr] del ki)
    if _try_mark(w, _mark_possessives) or (w.restore_c() or _try_mark(w, _mark_sU)):
        w.delete()
        w.bra()
        if _try_mark(w, _mark_lAr):
            w.delete()
            _ki_chain(w)
        else:
            w.reset()
        return True
    w.reset()
    return False
def _post_process(wb: bytes) -> bytes:
    res, nc = find_among_b(wb, len(wb), 0, _POST)
    if res == 1:
        return wb[:nc] + b"p"
    if res == 2:
        return wb[:nc] + "ç".encode("utf-8")
    if res == 3:
        return wb[:nc] + b"t"
    if res == 4:
        return wb[:nc] + b"k"
    return wb


def _append_U(wb: bytes) -> bytes:
    if not (wb.endswith(b"d") or wb.endswith(b"g")):
        return wb
    s = wb.decode("utf-8")
    for ch in reversed(s[:-1]):
        if ch in _VOWELS:
            if ch in "aı":
                return wb + "ı".encode("utf-8")
            if ch in "ei":
                return wb + b"i"
            if ch in "ou":
                return wb + b"u"
            return wb + "ü".encode("utf-8")
    return wb


def stem(word: str) -> str:
    if sum(1 for ch in word if ch in _VOWELS) <= 1:
        return word
    wb = word.encode("utf-8")
    w = _W(wb)
    cont = _stem_nominal_verb_suffixes(w)
    if not cont:
        # the unset continue flag fails the backwards group, skipping
        # both the noun suffixes AND the postlude ('dağlar' -> dağ,
        # but 'dağda' -> dak)
        return w.b.decode("utf-8")
    _stem_noun_suffixes(w)
    wb = w.b
    if wb in (b"ad", b"soyad"):
        # reserved words: 'ad' (name) and 'soyad' (surname) skip the
        # postlude exactly ('adum' -> ad but 'benad' -> benadı)
        return wb.decode("utf-8")
    wb = _append_U(wb)
    wb = _post_process(wb)
    return wb.decode("utf-8")
