"""Snowball Spanish stemmer — pure Python, bit-exact to the compiled
libstemmer 'spanish' UTF-8 stemmer (snowball 2.2.0) the reference links
against (reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens). Pinned by tests/test_spanish_goldens.py against 49,542 vectors
captured from the compiled library.

Implements the published Spanish algorithm
(snowballstem.org/algorithms/spanish/stemmer.html):

  vowels: a e i o u á é í ó ú ü
  RV: second letter consonant -> after the next vowel; first two
      letters vowels -> after the next consonant; else (CV) position 3
  step 0: attached pronoun (me/se/sela/…/nos) after a gerund/infinitive
      ending in RV — accented endings lose their accent
  step 1: standard suffixes with the ic/iv/at/os/ad/abil/ante/able/ible
      follow-up chains (amente needs R1, most need R2)
  step 2a (if step 1 failed): y-verb endings in RV preceded by u
  step 2b (if 2a failed): verb conjugation endings in RV; en/es/éis/emos
      also strip a preceding u after g
  step 3 (always): residual os/a/o/á/í/ó and e/é in RV (e/é also strip
      a preceding u after g when the u is in RV)
  postlude: strip acute accents
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóúü")

_PRONOUNS = sorted(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"],
    key=len,
    reverse=True,
)

# (ending, replacement or None=delete-pronoun-only)
_P_ACCENTED = {"iéndo": "iendo", "ándo": "ando", "ár": "ar", "ér": "er",
               "ír": "ir"}
_P_PLAIN = ("iendo", "ando", "ar", "er", "ir")
_P_ENDINGS = sorted(
    [*_P_ACCENTED, *_P_PLAIN, "yendo"], key=len, reverse=True
)

_STEP1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_STEP1_ADOR = (
    "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
    "ancia", "ador", "ante",
)
_STEP1_SUFFIXES = sorted(
    [
        *_STEP1_DELETE_R2, *_STEP1_ADOR, "logías", "logía", "uciones",
        "ución", "encias", "encia", "amente", "mente", "idades", "idad",
        "ivas", "ivos", "iva", "ivo",
    ],
    key=len,
    reverse=True,
)

_Y_VERB = sorted(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas",
     "yes", "yais", "yamos"],
    key=len,
    reverse=True,
)

_VERB_GU = ("éis", "emos", "en", "es")
_VERB_OTHER = (
    "arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
    "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
    "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
    "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
    "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
    "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
    "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
    "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
    "adas", "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
    "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
    "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
    "imos", "áramos", "iéramos", "iésemos", "ásemos",
)
_VERB_SUFFIXES = sorted(
    [*_VERB_GU, *_VERB_OTHER], key=len, reverse=True
)

_RESIDUAL_SIMPLE = ("os", "a", "o", "á", "í", "ó")
_RESIDUAL = sorted(
    [*_RESIDUAL_SIMPLE, "e", "é"], key=len, reverse=True
)

_UNACCENT = str.maketrans("áéíóú", "aeiou")


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                # v c : after the next vowel
                for i in range(2, n):
                    if w[i] in _V:
                        pv = i + 1
                        break
            else:
                # v v : after the next consonant
                for i in range(2, n):
                    if w[i] not in _V:
                        pv = i + 1
                        break
        else:
            if w[1] in _V:
                # c v : position 3
                if n > 2:
                    pv = 3
            else:
                # c c : after the next vowel
                for i in range(2, n):
                    if w[i] in _V:
                        pv = i + 1
                        break

    def _after_v_nonv(start: int) -> int:
        i = start
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        return i + 1 if i < n else n

    p1 = _after_v_nonv(0)
    p2 = _after_v_nonv(p1) if p1 < n else n
    return pv, p1, p2


def _attached_pronoun(w: str, pv: int) -> str:
    pron = None
    for p in _PRONOUNS:
        if w.endswith(p):
            pron = p
            break
    if pron is None:
        return w
    s = len(w) - len(pron)
    base = w[:s]
    for end in _P_ENDINGS:
        if base.endswith(end):
            t = s - len(end)
            if t < pv:
                return w
            if end in _P_ACCENTED:
                return base[:t] + _P_ACCENTED[end]
            if end == "yendo":
                if t >= 1 and base[t - 1] == "u":
                    return base
                return w
            return base  # plain gerund/infinitive: drop the pronoun
    return w


def _standard_suffix(w: str, p1: int, p2: int):
    suf = None
    for s1 in _STEP1_SUFFIXES:
        if w.endswith(s1):
            suf = s1
            break
    if suf is None:
        return w, False
    s = len(w) - len(suf)

    if suf in _STEP1_DELETE_R2:
        if s >= p2:
            return w[:s], True
        return w, False
    if suf in _STEP1_ADOR:
        if s < p2:
            return w, False
        w = w[:s]
        if w.endswith("ic") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    if suf in ("logía", "logías"):
        if s >= p2:
            return w[:s] + "log", True
        return w, False
    if suf in ("ución", "uciones"):
        if s >= p2:
            return w[:s] + "u", True
        return w, False
    if suf in ("encia", "encias"):
        if s >= p2:
            return w[:s] + "ente", True
        return w, False
    if suf == "amente":
        if s < p1:
            return w, False
        w = w[:s]
        if w.endswith("iv") and len(w) - 2 >= p2:
            w = w[:-2]
            if w.endswith("at") and len(w) - 2 >= p2:
                w = w[:-2]
        else:
            for pre in ("os", "ic", "ad"):
                if w.endswith(pre) and len(w) - 2 >= p2:
                    w = w[:-2]
                    break
        return w, True
    if suf == "mente":
        if s < p2:
            return w, False
        w = w[:s]
        for pre in ("ante", "able", "ible"):
            if w.endswith(pre) and len(w) - 4 >= p2:
                w = w[:-4]
                break
        return w, True
    if suf in ("idad", "idades"):
        if s < p2:
            return w, False
        w = w[:s]
        for pre in ("abil", "ic", "iv"):
            if w.endswith(pre) and len(w) - len(pre) >= p2:
                w = w[: -len(pre)]
                break
        return w, True
    if suf in ("iva", "ivo", "ivas", "ivos"):
        if s < p2:
            return w, False
        w = w[:s]
        if w.endswith("at") and len(w) - 2 >= p2:
            w = w[:-2]
        return w, True
    return w, False  # pragma: no cover


def _y_verb_suffix(w: str, pv: int):
    # setlimit to RV: longest suffix fitting in RV; then the u test
    # (which may look before RV)
    for suf in _Y_VERB:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            s = len(w) - len(suf)
            if s >= 1 and w[s - 1] == "u":
                return w[:s], True
            return w, False
    return w, False


def _verb_suffix(w: str, pv: int):
    for suf in _VERB_SUFFIXES:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            s = len(w) - len(suf)
            if suf in _VERB_GU:
                # strip a preceding u after g (u may be outside RV)
                if s >= 2 and w[s - 1] == "u" and w[s - 2] == "g":
                    s -= 1
                return w[:s], True
            return w[:s], True
    return w, False


def _residual_suffix(w: str, pv: int) -> str:
    for suf in _RESIDUAL:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            s = len(w) - len(suf)
            if suf in _RESIDUAL_SIMPLE:
                return w[:s]
            # e / é: also strip a preceding u after g, u must be in RV
            if (
                s >= 2
                and w[s - 1] == "u"
                and w[s - 2] == "g"
                and s - 1 >= pv
            ):
                s -= 1
            return w[:s]
    return w


def stem(word: str) -> str:
    w = word
    pv, p1, p2 = _regions(w)
    w = _attached_pronoun(w, pv)
    w2, ok = _standard_suffix(w, p1, p2)
    if ok:
        w = w2
    else:
        w, ok = _y_verb_suffix(w, pv)
        if not ok:
            w, _ = _verb_suffix(w, pv)
    w = _residual_suffix(w, pv)
    return w.translate(_UNACCENT)
