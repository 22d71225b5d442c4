"""Snowball Tamil stemmer — pure Python, bit-exact to the compiled
libstemmer 'tamil' UTF-8 stemmer the reference links against
(reference internal/snowball fetches libstemmer_c; snowball.c:210-220
runs the configured stemmer chain over folded tokens).

Rajalingam's iterative affix-stripping algorithm, transcribed from
the disassembled stem function (.so 0x51cd0; fix_endings 0x515a0,
fix_va_start 0x51b70) with every branch sense pinned by differential
probing (tools/probe_stemmer.py):

  stem = do fix_ending; $(len > 4);
         remove_question_prefixes  ['எ' C '்'] delete, fix_va_start;
         remove_pronoun_prefixes   ['அ|இ|உ' C '்'] delete, fix_va;
         remove_question_suffixes  [ோ|ே|ா] -> ் , repeat fix_ending;
         remove_um                 [ும்] -> ் , fix_ending;
         remove_common_word_endings (ுடன் ிலிருந்து family -> ் or
                                     the T110 list deleted);
         remove_vetrumai_urupukal  (sets a flag consumed by the த்த்
                                     branch of fix_ending);
         remove_plural_suffix; remove_command_suffixes;
         remove_tense_suffixes (two passes + the கின்ற family).

All matching here is plain suffix/prefix comparison — the small
amongs are uniform-length character classes, so the find_among_b
fail-link subtleties never arise (unlike armenian/lithuanian).

Pinned by tests/test_tamil_goldens.py against vectors captured from
the compiled library (tools/gen_snowball_goldens.py --lang tamil).
"""

from __future__ import annotations

# character classes (among tables recovered from the compiled
# library's data; tools/extract_among.py)
_VOWEL_SIGNS = ("ீ", "ு", "ூ", "ெ", "ே", "ை", "ா", "ி")      # T60/82/90/123/155/163
_INDEP_VOWELS = ("அ", "ஆ", "இ", "ஈ", "உ", "ஊ", "எ", "ஏ",
                 "ஐ", "ஒ", "ஓ", "ஔ")                            # T68
_STOPS = ("க", "ச", "ட", "த", "ப", "ற")                         # T98/104/136/186/192/198
_CONS10 = ("க", "ங", "ச", "ஞ", "த", "ந", "ப", "ம", "ய", "வ")  # T142/210
_LIQUIDS = ("ய", "ர", "ல", "ள", "ழ", "வ")                       # T180
_NASALS = ("ங", "ஞ", "ண", "ந", "ன", "ம")                       # T174
_T171 = ("வ்", "ய", "வ")
_T204 = ("ீ", "ை", "ி")
_T207 = ("ந்த்", "ந்", "ந்த")
_T110 = ("பட்டு", "விட்டு", "படு", "விடு", "பட்டது", "ெல்லாம்",
         "பட்ட", "பட்டண", "தான", "படிதான", "குரிய", "படி",
         "பற்றி")
_T54 = ("கின்ற்", "ாநின்ற்", "கிற்", "கின்ற", "ாநின்ற", "கிற")
_T80 = ("படு", "கொண்டிர்")
_T131 = ("பி", "வி")
_T133 = ("ே", "ோ", "ா")


def _ends(w: str, suf) -> str | None:
    """Longest matching alternative stripped, or None."""
    if isinstance(suf, str):
        return w[: -len(suf)] if w.endswith(suf) else None
    best = None
    for s in suf:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return w[: -len(best)] if best is not None else None


def _fix_ending(w: str, vetrumai: bool) -> str | None:
    """One application; returns the new word or None (no change)."""
    if len(w) <= 3:
        return None
    # ['ந்த்'|'ந்'|'ந்த'] delete
    r = _ends(w, _T207)
    if r is not None:
        return r
    # ['ய்' preceded by ீ|ை|ி] delete only the ய்
    if w.endswith("ய்"):
        if _ends(w[:-2], _T204) is not None:
            return w[:-2]
    if w.endswith("ட்ப்") or w.endswith("ட்க்"):
        return w[:-4] + "ள்"
    if w.endswith("ன்ற்") or w.endswith("ற்க்"):
        return w[:-4] + "ல்"
    if w.endswith("ட்ட்"):
        return w[:-4] + "டு"
    if vetrumai and w.endswith("த்த்") and not w[:-4].endswith("ை"):
        return w[:-4] + "ம்"
    if w.endswith("ுக்") or w.endswith("ுக்க்"):
        return w[: -3 if w.endswith("ுக்") and not w.endswith("ுக்க்")
                 else -5] + "்"
    # ['்' STOP '்' STOP] -> delete the whole span
    if w.endswith("்"):
        t = _ends(w[:-1], _STOPS)
        if t is not None and t.endswith("்"):
            t2 = _ends(t[:-1], _STOPS)
            if t2 is not None:
                return t2
    # ['்' STOP] -> delete
    if w.endswith("்"):
        t = _ends(w[:-1], _STOPS)
        if t is not None:
            return t
    # ['்' (liquid) '்'] -> '்'   |  ['்' (nasal) '்'] -> '்'
    if w.endswith("்"):
        mid = _ends(w[:-1], _LIQUIDS)
        if mid is not None and mid.endswith("்"):
            return mid
        mid = _ends(w[:-1], _NASALS)
        if mid is not None and mid.endswith("்"):
            return mid
    # [வ்|ய|வ] delete
    r = _ends(w, _T171)
    if r is not None:
        return r
    # ['னு' not preceded by a vowel sign] delete
    if w.endswith("னு"):
        if _ends(w[:-2], _VOWEL_SIGNS) is None:
            return w[:-2]
    # ['ங்']: preceded by ை -> delete the ங்; else -> 'ம்'
    if w.endswith("ங்"):
        if w[:-2].endswith("ை"):
            return w[:-2]
        return w[:-2] + "ம்"
    # ['்' preceded by a vowel sign or another '்'] delete the '்'
    if w.endswith("்"):
        if _ends(w[:-1], _VOWEL_SIGNS) is not None:
            return w[:-1]
        if w[:-1].endswith("்"):
            return w[:-1]
    return None


def _fix_endings(w: str, vetrumai: bool, repeat: bool = True) -> str:
    while True:
        r = _fix_ending(w, vetrumai)
        if r is None:
            return w
        w = r
        if not repeat:
            return w


def _fix_va_start(w: str) -> str:
    for pre, rep in (("வோ", "ஓ"), ("வொ", "ஒ"), ("வு", "உ"),
                     ("வூ", "ஊ")):
        if w.startswith(pre):
            return rep + w[len(pre):]
    return w


def _starts(w: str, alts) -> str | None:
    for s in alts:
        if w.startswith(s):
            return w[len(s):]
    return None


def stem(word: str) -> str:
    w = word
    vetrumai = False
    if len(w) > 3:
        w = _fix_endings(w, vetrumai, repeat=False)
    if len(w) <= 4:
        return w

    # remove_question_prefixes: ['எ' C '்'] delete, do fix_va_start
    if w.startswith("எ"):
        t = _starts(w[1:], _CONS10)
        if t is not None and t.startswith("்"):
            w = t[1:]
            w = _fix_va_start(w)

    # remove_pronoun_prefixes: ['அ|இ|உ' C '்'] delete, do fix_va_start
    if w[:1] in ("அ", "இ", "உ"):
        t = _starts(w[1:], _CONS10)
        if t is not None and t.startswith("்"):
            w = t[1:]
            w = _fix_va_start(w)

    # remove_question_suffixes: optionally [ோ|ே|ா] -> '்', then
    # repeat fix_ending UNCONDITIONALLY (the repeat runs even when no
    # question suffix matched — asm falls through to the loop)
    if len(w) > 4:
        r = _ends(w, _T133)
        if r is not None:
            w = r + "்"
        w = _fix_endings(w, vetrumai)

    # remove_um: ['ும்'] -> '்', single fix_ending
    if len(w) > 4 and w.endswith("ும்"):
        w = _fix_endings(w[:-3] + "்", vetrumai, repeat=False)

    # remove_common_word_endings
    if len(w) > 4:
        new = _common_word_endings(w)
        if new is not None:
            w = _fix_endings(new, vetrumai)

    # remove_vetrumai_urupukal
    if len(w) > 4:
        new = _vetrumai(w)
        if new is not None:
            vetrumai = True
            if new.endswith("ின்"):
                new = new[:-3] + "்"
            w = _fix_endings(new, vetrumai)

    # remove_plural_suffix
    if len(w) > 4:
        done = False
        if w.endswith("ுங்கள்") and _ends(w[:-6], _STOPS) is None:
            w = w[:-6] + "்"
            done = True
        elif w.endswith("ற்கள்"):
            w = w[:-5] + "ல்"
            done = True
        elif w.endswith("ட்கள்"):
            w = w[:-5] + "ள்"
            done = True
        elif w.endswith("கள்"):
            w = w[:-3]
            done = True
        # (the plural section has NO fix_endings tail of its own: the
        # conversions happen inside the tense loop below, whose len>4
        # guard is what protects short results like 'உணவ்')

    # remove_command_suffixes: [பி|வி] delete (no fix_endings)
    if len(w) > 4:
        r = _ends(w, _T131)
        if r is not None:
            w = r

    # remove_tense_suffixes: repeat while something matched; the T54
    # attempt and the fix_endings loop run every iteration regardless
    while len(w) > 4:
        changed = False
        new = _tense_once(w)
        if new is not None:
            w = new
            changed = True
        r = _ends(w, _T54)
        if r is not None:
            w = r
            changed = True
        w = _fix_endings(w, vetrumai)
        if not changed:
            break
    return w


def _common_word_endings(w: str) -> str | None:
    for s in ("ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகி", "ாகிய",
              "ென்று", "ுள்ள", "ுடைய", "ுடை", "ெனும்"):
        if w.endswith(s):
            return w[: -len(s)] + "்"
    if w.endswith("ல்ல") and _ends(w[:-3], _VOWEL_SIGNS) is None:
        return w[:-3] + "்"
    if w.endswith("ென"):
        return w[:-2] + "்"
    if w.endswith("ாகி"):
        return w[:-3] + "்"
    r = _ends(w, _T110)
    if r is not None:
        return r
    return None


def _vetrumai(w: str) -> str | None:
    if w.endswith("னை"):
        return w[:-2]
    if w.endswith("ினை"):
        t = _ends(w[:-3], _STOPS)
        if t is None:
            return w[:-3] + "்"
        # stop before: fall through to the ை analysis below
    if w.endswith("ை"):
        t = _ends(w[:-1], _STOPS)
        if t is None:
            return w[:-1] + "்"
        if t.endswith("்"):
            return w[:-1] + "்"
    for s in ("ொடு", "ோடு", "ில்", "ிற்", "ின்று", "ிருந்து",
              "விட", "ால்", "ுடை", "ாமல்", "ுள்"):
        if w.endswith(s):
            return w[: -len(s)] + "்"
    for s in ("கண்", "முன்", "மேல்", "மேற்", "கீழ்", "பின்"):
        if w.endswith(s):
            return w[: -len(s)]
    if w.endswith("ின்") and not w[:-3].endswith("ம"):
        return w[:-3] + "்"
    if len(w) > 6 and w.endswith("ிடம்"):
        return w[:-4] + "்"
    if w.endswith("ல்") and _ends(w[:-2], _VOWEL_SIGNS) is None:
        return w[:-2] + "்"
    if w.endswith("து") and _ends(w[:-2], _VOWEL_SIGNS) is None:
        return w[:-2]
    if w.endswith("ீ"):
        return w[:-1] + "ி"
    return None


_TENSE_DELETE = (
    "மார்", "மின்", "னன்", "னான்", "னாள்", "னார்",
)
_TENSE_DELETE2 = (
    "னள்", "வள்", "னர்", "வர்", "ன", "ப", "க", "த", "ய",
    "பன்", "பள்", "பர்",
)
_TENSE_DELETE3 = (
    "ிற்று", "பம்", "னம்", "தும்", "றும்", "கும்", "னென்", "னை",
    "வை",
)
_TENSE_TO_VIRAMA = (
    "ாள்", "ார்", "ேன்", "ா", "ாம்", "ெம்", "ேம்", "ோம்",
    "கும்", "தும்", "டும்", "றும்", "ாய்", "னென்", "னிர்",
    "ீர்", "ீயர்",
)


def _tense_once(w: str) -> str | None:
    r = _ends(w, _T80)
    if r is not None:
        return r
    for s in _TENSE_DELETE:
        if w.endswith(s):
            return w[: -len(s)]
    if w.endswith("வன்") and _ends(w[:-3], _INDEP_VOWELS) is None:
        return w[:-3]
    for s in _TENSE_DELETE2:
        if w.endswith(s):
            return w[: -len(s)]
    if w.endswith("து") and _ends(w[:-2], _VOWEL_SIGNS) is None:
        return w[:-2]
    for s in _TENSE_DELETE3:
        if w.endswith(s):
            return w[: -len(s)]
    if w.endswith("ான்") and not w[:-3].endswith("ச"):
        return w[:-3] + "்"
    for s in _TENSE_TO_VIRAMA:
        if w.endswith(s):
            return w[: -len(s)] + "்"
    if (w.endswith("கு") or w.endswith("து")) and w[:-2].endswith("்"):
        return w[:-2]
    return None
