"""Snowball Arabic stemmer — pure Python, bit-exact to the compiled
libstemmer 'arabic' UTF-8 stemmer (snowball 2.2.0) the reference
links against (reference internal/snowball/byggfil fetches
libstemmer_c; snowball.c:210-220 runs the configured stemmer chain
over folded tokens).  Pinned by tests/test_arabic_goldens.py against
vectors captured from the compiled library plus live random sweeps.

Implements the published Arabic algorithm
(snowballstem.org/algorithms/arabic/stemmer.html):

  Checks1:       detect a definite article prefix (ال لل بال كال,
                 with word-length minimums) -> is_noun, not is_verb,
                 is_defined
  Normalize_pre: strip tatweel and diacritics, map Arabic-Indic
                 digits to ASCII, fold presentation forms to base
                 letters (the 144-entry table)
  Suffixes (backwards): the verb chain (object pronouns, then
                 person/number endings), or the noun chain (feminine
                 ة, possessives, plural endings, نsuffix, final ي)
                 gated on is_noun/is_verb/is_defined, or the bare
                 alef maqsura rewrite ى -> ي
  Prefixes:      hamza-on-alef doubling (Prefix_Step1), conjunction
                 ف/و, articles, ب/ك doubling, verb tense prefixes
                 (س.., يست/نست/تست -> است), each with word-length
                 minimums
  Normalize_post: final hamza forms -> ء, interior آ/أ/إ -> ا,
                 ؤ -> و, ئ -> ي

All length conditions count CHARACTERS (snowball `len`), not bytes.
Among tables are the EXACT arrays recovered from the compiled
library's data section (tools/extract_among.py); the jump-table
actions and the stem()'s or-chain were decoded from the disassembly
(tools/annotate_asm.py) and verified by differential probing to 0
divergences (tools/probe_stemmer.py --lang arabic --diff).
"""

from __future__ import annotations

from letarette_spark.analysis._among import find_among, find_among_b, make_amongs

# Normalize_pre replacements by result class (1 = delete; 2-11 the
# ASCII digits; 12-47 base letters; 48-51 lam-alef ligatures).
_NORM_PRE_REPL = (
    None, "", "0", "1", "2", "3", "4", "5", "6", "7", "8", "9",
    "ء", "أ", "إ", "ئ", "آ", "ؤ", "ا", "ب", "ة", "ت", "ث", "ج",
    "ح", "خ", "د", "ذ", "ر", "ز", "س", "ش", "ص", "ض", "ط", "ظ",
    "ع", "غ", "ف", "ق", "ك", "ل", "م", "ن", "ه", "و", "ى", "ي",
    "لا", "لأ", "لإ", "لآ",
)

_NORM_POST_F_REPL = (None, "ا", "و", "ي")

_PFX1_REPL = (None, "أ", "آ", "ا", "إ")
_PFX3V_REPL = (None, "ي", "ت", "ن", "أ")
_NORM_PRE = make_amongs((  # a_0 Normalize_pre @0x74980
    ('ـ', -1, 1), ('ً', -1, 1), ('ٌ', -1, 1), ('ٍ', -1, 1), ('َ', -1, 1), 
    ('ُ', -1, 1), ('ِ', -1, 1), ('ّ', -1, 1), ('ْ', -1, 1), ('٠', -1, 2), 
    ('١', -1, 3), ('٢', -1, 4), ('٣', -1, 5), ('٤', -1, 6), ('٥', -1, 7), 
    ('٦', -1, 8), ('٧', -1, 9), ('٨', -1, 10), ('٩', -1, 11), 
    ('ﺀ', -1, 12), ('ﺁ', -1, 16), ('ﺂ', -1, 16), ('ﺃ', -1, 13), 
    ('ﺄ', -1, 13), ('ﺅ', -1, 17), ('ﺆ', -1, 17), ('ﺇ', -1, 14), 
    ('ﺈ', -1, 14), ('ﺉ', -1, 15), ('ﺊ', -1, 15), ('ﺋ', -1, 15), 
    ('ﺌ', -1, 15), ('ﺍ', -1, 18), ('ﺎ', -1, 18), ('ﺏ', -1, 19), 
    ('ﺐ', -1, 19), ('ﺑ', -1, 19), ('ﺒ', -1, 19), ('ﺓ', -1, 20), 
    ('ﺔ', -1, 20), ('ﺕ', -1, 21), ('ﺖ', -1, 21), ('ﺗ', -1, 21), 
    ('ﺘ', -1, 21), ('ﺙ', -1, 22), ('ﺚ', -1, 22), ('ﺛ', -1, 22), 
    ('ﺜ', -1, 22), ('ﺝ', -1, 23), ('ﺞ', -1, 23), ('ﺟ', -1, 23), 
    ('ﺠ', -1, 23), ('ﺡ', -1, 24), ('ﺢ', -1, 24), ('ﺣ', -1, 24), 
    ('ﺤ', -1, 24), ('ﺥ', -1, 25), ('ﺦ', -1, 25), ('ﺧ', -1, 25), 
    ('ﺨ', -1, 25), ('ﺩ', -1, 26), ('ﺪ', -1, 26), ('ﺫ', -1, 27), 
    ('ﺬ', -1, 27), ('ﺭ', -1, 28), ('ﺮ', -1, 28), ('ﺯ', -1, 29), 
    ('ﺰ', -1, 29), ('ﺱ', -1, 30), ('ﺲ', -1, 30), ('ﺳ', -1, 30), 
    ('ﺴ', -1, 30), ('ﺵ', -1, 31), ('ﺶ', -1, 31), ('ﺷ', -1, 31), 
    ('ﺸ', -1, 31), ('ﺹ', -1, 32), ('ﺺ', -1, 32), ('ﺻ', -1, 32), 
    ('ﺼ', -1, 32), ('ﺽ', -1, 33), ('ﺾ', -1, 33), ('ﺿ', -1, 33), 
    ('ﻀ', -1, 33), ('ﻁ', -1, 34), ('ﻂ', -1, 34), ('ﻃ', -1, 34), 
    ('ﻄ', -1, 34), ('ﻅ', -1, 35), ('ﻆ', -1, 35), ('ﻇ', -1, 35), 
    ('ﻈ', -1, 35), ('ﻉ', -1, 36), ('ﻊ', -1, 36), ('ﻋ', -1, 36), 
    ('ﻌ', -1, 36), ('ﻍ', -1, 37), ('ﻎ', -1, 37), ('ﻏ', -1, 37), 
    ('ﻐ', -1, 37), ('ﻑ', -1, 38), ('ﻒ', -1, 38), ('ﻓ', -1, 38), 
    ('ﻔ', -1, 38), ('ﻕ', -1, 39), ('ﻖ', -1, 39), ('ﻗ', -1, 39), 
    ('ﻘ', -1, 39), ('ﻙ', -1, 40), ('ﻚ', -1, 40), ('ﻛ', -1, 40), 
    ('ﻜ', -1, 40), ('ﻝ', -1, 41), ('ﻞ', -1, 41), ('ﻟ', -1, 41), 
    ('ﻠ', -1, 41), ('ﻡ', -1, 42), ('ﻢ', -1, 42), ('ﻣ', -1, 42), 
    ('ﻤ', -1, 42), ('ﻥ', -1, 43), ('ﻦ', -1, 43), ('ﻧ', -1, 43), 
    ('ﻨ', -1, 43), ('ﻩ', -1, 44), ('ﻪ', -1, 44), ('ﻫ', -1, 44), 
    ('ﻬ', -1, 44), ('ﻭ', -1, 45), ('ﻮ', -1, 45), ('ﻯ', -1, 46), 
    ('ﻰ', -1, 46), ('ﻱ', -1, 47), ('ﻲ', -1, 47), ('ﻳ', -1, 47), 
    ('ﻴ', -1, 47), ('ﻵ', -1, 51), ('ﻶ', -1, 51), ('ﻷ', -1, 49), 
    ('ﻸ', -1, 49), ('ﻹ', -1, 50), ('ﻺ', -1, 50), ('ﻻ', -1, 48), 
    ('ﻼ', -1, 48), 
))

_NORM_POST_B = make_amongs((  # a_1 final hamza -> ء @0x748e0
    ('آ', -1, 1), ('أ', -1, 1), ('ؤ', -1, 1), ('إ', -1, 1), ('ئ', -1, 1), 
))

_NORM_POST_F = make_amongs((  # a_2 hamza forms -> bare letter @0x74840
    ('آ', -1, 1), ('أ', -1, 1), ('ؤ', -1, 2), ('إ', -1, 1), ('ئ', -1, 3), 
))

_CHECKS1 = make_amongs((  # a_3 Checks1 @0x747c0
    ('ال', -1, 2), ('بال', -1, 1), ('كال', -1, 1), ('لل', -1, 2), 
))

_PFX1 = make_amongs((  # a_4 Prefix_Step1 @0x74720
    ('أآ', -1, 2), ('أأ', -1, 1), ('أؤ', -1, 1), ('أإ', -1, 4), 
    ('أا', -1, 3), 
))

_PFX2 = make_amongs((  # a_5 Prefix_Step2 @0x746e0
    ('ف', -1, 1), ('و', -1, 1), 
))

_PFX3A = make_amongs((  # a_6 Prefix_Step3a_Noun @0x74660
    ('ال', -1, 2), ('بال', -1, 1), ('كال', -1, 1), ('لل', -1, 2), 
))

_PFX3B = make_amongs((  # a_7 Prefix_Step3b_Noun @0x745e0
    ('ب', -1, 1), ('با', 0, -1), ('بب', 0, 2), ('كك', -1, 3), 
))

_PFX3V = make_amongs((  # a_8 Prefix_Step3_Verb @0x74560
    ('سأ', -1, 4), ('ست', -1, 2), ('سن', -1, 3), ('سي', -1, 1), 
))

_PFX4V = make_amongs((  # a_9 Prefix_Step4_Verb @0x74500
    ('تست', -1, 1), ('نست', -1, 1), ('يست', -1, 1), 
))

_SFX_N1A = make_amongs((  # a_10 Suffix_Noun_Step1a @0x743c0
    ('ك', -1, 1), ('كم', -1, 2), ('هم', -1, 2), ('هن', -1, 2), 
    ('ه', -1, 1), ('ي', -1, 1), ('كما', -1, 3), ('هما', -1, 3), 
    ('نا', -1, 2), ('ها', -1, 2), 
))

_SFX_N1B = make_amongs((  # a_11 Suffix_Noun_Step1b @0x743a0
    ('ن', -1, 1), 
))

_SFX_N2A = make_amongs((  # a_12 Suffix_Noun_Step2a @0x74340
    ('و', -1, 1), ('ي', -1, 1), ('ا', -1, 1), 
))

_SFX_N2B = make_amongs((  # a_13 Suffix_Noun_Step2b @0x74320
    ('ات', -1, 1), 
))

_SFX_N2C1 = make_amongs((  # a_14 Suffix_Noun_Step2c1 @0x74300
    ('ت', -1, 1), 
))

_SFX_N2C2 = make_amongs((  # a_15 Suffix_Noun_Step2c2 @0x742e0
    ('ة', -1, 1), 
))

_SFX_N3 = make_amongs((  # a_16 Suffix_Noun_Step3 @0x742c0
    ('ي', -1, 1), 
))

_SFX_V1 = make_amongs((  # a_17 Suffix_Verb_Step1 @0x74140
    ('ك', -1, 1), ('كم', -1, 2), ('هم', -1, 2), ('كن', -1, 2), 
    ('هن', -1, 2), ('ه', -1, 1), ('كمو', -1, 3), ('ني', -1, 2), 
    ('كما', -1, 3), ('هما', -1, 3), ('نا', -1, 2), ('ها', -1, 2), 
))

_SFX_V2A = make_amongs((  # a_18 Suffix_Verb_Step2a @0x73fe0
    ('ن', -1, 1), ('ون', 0, 3), ('ين', 0, 3), ('ان', 0, 3), ('تن', 0, 2), 
    ('ي', -1, 1), ('ا', -1, 1), ('تما', 6, 4), ('نا', 6, 2), ('تا', 6, 2), 
    ('ت', -1, 1), 
))

_SFX_V2B = make_amongs((  # a_19 Suffix_Verb_Step2b @0x73fa0
    ('تم', -1, 1), ('وا', -1, 1), 
))

_SFX_V2C = make_amongs((  # a_20 Suffix_Verb_Step2c @0x73f60
    ('و', -1, 1), ('تمو', 0, 2), 
))

_ALEF_MAQSURA = make_amongs((  # a_21 Suffix_All_alef_maqsura @0x73f40
    ('ى', -1, 1), 
))



def _nchars(w: bytes) -> int:
    return sum(1 for b in w if b & 0xC0 != 0x80)


def _skip_fwd(w: bytes, c: int) -> int:
    c += 1
    while c < len(w) and w[c] & 0xC0 == 0x80:
        c += 1
    return c


def _prev_pos(w: bytes, c: int) -> int:
    c -= 1
    while c > 0 and w[c] & 0xC0 == 0x80:
        c -= 1
    return c


def stem(word: str) -> str:
    w = bytearray(word.encode("utf-8"))
    is_defined = False
    is_verb = True
    is_noun = True

    # Checks1 — detect the definite article (no slice, flags only)
    res, _nc = find_among(w, 0, len(w), _CHECKS1)
    if res:
        n = _nchars(w)
        if (res == 1 and n > 4) or (res == 2 and n > 3):
            is_noun = True
            is_verb = False
            is_defined = True

    # Normalize_pre — repeat ( rewrite or next )
    c = 0
    while c < len(w):
        res, nc = find_among(w, c, len(w), _NORM_PRE)
        if res:
            repl = _NORM_PRE_REPL[res].encode("utf-8")
            w[c:nc] = repl
            c += len(repl)
        else:
            c = _skip_fwd(w, c)

    # helper: backwards among with per-class minimum word length
    # (in characters, strictly greater); deletes the match
    def _del(c: int, table, minlen) -> tuple[bool, int]:
        res, nc = find_among_b(w, c, 0, table)
        if res and res in minlen and _nchars(w) > minlen[res]:
            del w[nc:c]
            return True, nc
        return False, c

    # Suffixes
    handled = False
    if is_verb:
        c = len(w)
        ok, c = _del(c, _SFX_V1, {1: 3, 2: 4, 3: 5})
        if ok:
            # object pronouns strip repeatedly
            while True:
                ok2, c = _del(c, _SFX_V1, {1: 3, 2: 4, 3: 5})
                if not ok2:
                    break
            ok2, c = _del(c, _SFX_V2A, {1: 3, 2: 4, 3: 5, 4: 5})
            if not ok2:
                ok2, c = _del(c, _SFX_V2C, {1: 3, 2: 5})
            if not ok2 and c > 0:
                c = _prev_pos(w, c)  # next
            handled = True
        else:
            ok, c = _del(len(w), _SFX_V2B, {1: 4})
            if ok:
                handled = True
            else:
                ok, c = _del(len(w), _SFX_V2A, {1: 3, 2: 4, 3: 5, 4: 5})
                if ok:
                    handled = True
    if not handled and is_noun:
        c = len(w)
        fired = False
        ok, c2 = _del(c, _SFX_N2C2, {1: 3})
        if ok:
            c = c2
            fired = True
        if not fired and not is_defined:
            ok, c2 = _del(c, _SFX_N1A, {1: 3, 2: 4, 3: 5})
            if ok:
                c = c2
                fired = True
                ok2, c3 = _del(c, _SFX_N2A, {1: 4})
                if not ok2:
                    ok2, c3 = _del(c, _SFX_N2B, {1: 4})
                if not ok2:
                    ok2, c3 = _del(c, _SFX_N2C1, {1: 3})
                if ok2:
                    c = c3
                elif c > 0:
                    c = _prev_pos(w, c)  # next
        if not fired:
            ok, c2 = _del(c, _SFX_N1B, {1: 5})
            if ok:
                ok2, c3 = _del(c2, _SFX_N2A, {1: 4})
                if not ok2:
                    ok2, c3 = _del(c2, _SFX_N2B, {1: 4})
                if not ok2:
                    ok2, c3 = _del(c2, _SFX_N2C1, {1: 3})
                if ok2:
                    c = c3
                    fired = True
                else:
                    # 1b sliced but its required inner group failed:
                    # the alternative fails, the deletion persists,
                    # and the chain continues at the (new) end
                    c = len(w)
        if not fired and not is_defined:
            ok, c2 = _del(c, _SFX_N2A, {1: 4})
            if ok:
                c = c2
                fired = True
        if not fired:
            ok, c2 = _del(c, _SFX_N2B, {1: 4})
            if ok:
                c = c2
                fired = True
        # Suffix_Noun_Step3 is REQUIRED for this alternative; on
        # failure the alef maqsura alternative runs at the current
        # end (each compiled step reloads z->l)
        res, nc = find_among_b(w, c, 0, _SFX_N3)
        if res and _nchars(w) > 2:
            del w[nc:c]
            handled = True
    if not handled:
        c = len(w)
        res, nc = find_among_b(w, c, 0, _ALEF_MAQSURA)
        if res:
            w[nc:c] = "ي".encode("utf-8")

    # Prefixes — the cursor carries through the try-steps
    c = 0
    res, nc = find_among(w, c, len(w), _PFX1)
    if res and _nchars(w) > 3:
        repl = _PFX1_REPL[res].encode("utf-8")
        w[c:nc] = repl
        c += len(repl)
    res, nc = find_among(w, c, len(w), _PFX2)
    if res and _nchars(w) > 3 and w[nc:nc + 2] != "ا".encode("utf-8"):
        del w[c:nc]
    # ( Prefix_Step3a_Noun or (is_noun Prefix_Step3b_Noun)
    #   or (is_verb try(Prefix_Step3_Verb) Prefix_Step4_Verb) )
    res, nc = find_among(w, c, len(w), _PFX3A)
    p3a = False
    if res:
        n = _nchars(w)
        if (res == 1 and n > 5) or (res == 2 and n > 4):
            del w[c:nc]
            p3a = True
    if not p3a:
        p3b = False
        if is_noun:
            res, nc = find_among(w, c, len(w), _PFX3B)
            if res != 0 and res != -1 and _nchars(w) > 3:
                if res == 1:
                    del w[c:nc]
                elif res == 2:
                    w[c:nc] = "ب".encode("utf-8")
                else:
                    w[c:nc] = "ك".encode("utf-8")
                p3b = True
        if not p3b and is_verb:
            res, nc = find_among(w, c, len(w), _PFX3V)
            if res and _nchars(w) > 4:
                repl = _PFX3V_REPL[res].encode("utf-8")
                w[c:nc] = repl
                c += len(repl)
            res, nc = find_among(w, c, len(w), _PFX4V)
            if res and _nchars(w) > 4:
                w[c:nc] = "است".encode("utf-8")
                is_verb = True
                is_noun = False

    # Normalize_post — final hamza form -> ء, then interior hamza
    # forms -> bare letters
    c = len(w)
    res, nc = find_among_b(w, c, 0, _NORM_POST_B)
    if res:
        w[nc:c] = "ء".encode("utf-8")
    c = 0
    while c < len(w):
        res, nc = find_among(w, c, len(w), _NORM_POST_F)
        if res:
            repl = _NORM_POST_F_REPL[res].encode("utf-8")
            w[c:nc] = repl
            c += len(repl)
        else:
            c = _skip_fwd(w, c)

    return bytes(w).decode("utf-8")
