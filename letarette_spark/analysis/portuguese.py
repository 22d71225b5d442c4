"""Snowball Portuguese stemmer — pure Python, bit-exact to the compiled
libstemmer 'portuguese' UTF-8 stemmer (snowball 2.2.0) the reference
links against (reference internal/snowball/byggfil fetches
libstemmer_c; snowball.c:210-220 runs the configured stemmer chain over
folded tokens). Pinned by tests/test_romance_goldens.py against 51,417
vectors captured from the compiled library.

Implements the published Portuguese algorithm
(snowballstem.org/algorithms/portuguese/stemmer.html):

  prelude: ã -> a~, õ -> o~ (nasal markers; '~' is a consonant)
  vowels: a e i o u á é í ó ú â ê ô
  RV/R1/R2: the standard Romance regions (on the marked word)
  step 1: standard suffixes with their iv/at/os/ic/ad/abil/ante/avel/
      ível chains; e+ira(s) -> ir in RV
  step 2 (if step 1 failed): the conjugation table in RV
  step 3 (if step 1 or 2 succeeded): final i after c in RV
  step 4 (if both failed): residual os/a/i/o/á/í/ó in RV
  step 5 (always): final e/é/ê in RV (then gu/ci strip the u/i when in
      RV); final ç -> c
  postlude: a~ -> ã, o~ -> õ
"""

from __future__ import annotations

_V = frozenset("aeiouáéíóúâêô")

_STEP1_DELETE_R2 = (
    "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
    "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
    "amento", "amentos", "imento", "imentos", "adora", "ador", "aça~o",
    "adoras", "adores", "aço~es", "ante", "antes", "ância",
)
_STEP1_SUFFIXES = sorted(
    [
        *_STEP1_DELETE_R2, "logia", "logias", "uça~o", "uço~es",
        "ência", "ências", "amente", "mente", "idade", "idades", "iva",
        "ivo", "ivas", "ivos", "ira", "iras",
    ],
    key=len,
    reverse=True,
)

_STEP2 = sorted(
    [
        "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
        "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
        "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
        "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
        "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
        "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir",
        "as", "adas", "idas", "ias", "arias", "erias", "irias", "arás",
        "aras", "erás", "eras", "irás", "avas", "es", "ardes", "erdes",
        "irdes", "ares", "eres", "ires", "asses", "esses", "isses",
        "astes", "estes", "istes", "is", "ais", "eis", "íeis",
        "aríeis", "eríeis", "iríeis", "áreis", "areis", "éreis",
        "ereis", "íreis", "ireis", "ásseis", "ésseis", "ísseis",
        "áveis", "ados", "idos", "ámos", "amos", "íamos", "aríamos",
        "eríamos", "iríamos", "áramos", "éramos", "íramos", "ávamos",
        "emos", "aremos", "eremos", "iremos", "ássemos", "êssemos",
        "íssemos", "imos", "armos", "ermos", "irmos", "eu", "iu", "ou",
        "ira", "iras",
    ],
    key=len,
    reverse=True,
)

_RESIDUAL = ("os", "a", "i", "o", "á", "í", "ó")


def _regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    pv = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:
                for i in range(2, n):
                    if w[i] in _V:
                        pv = i + 1
                        break
            else:
                for i in range(2, n):
                    if w[i] not in _V:
                        pv = i + 1
                        break
        else:
            if w[1] in _V:
                if n > 2:
                    pv = 3
            else:
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


def _standard_suffix(w: str, pv: int, p1: int, p2: int):
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
    if suf in ("logia", "logias"):
        if s >= p2:
            return w[:s] + "log", True
        return w, False
    if suf in ("uça~o", "uço~es"):
        if s >= p2:
            return w[:s] + "u", True
        return w, False
    if suf in ("ência", "ências"):
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
        for pre in ("ante", "avel", "ível"):
            if w.endswith(pre) and len(w) - 4 >= p2:
                w = w[:-4]
                break
        return w, True
    if suf in ("idade", "idades"):
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
    if suf in ("ira", "iras"):
        if s >= pv and s >= 1 and w[s - 1] == "e":
            return w[:s] + "ir", True
        return w, False
    return w, False  # pragma: no cover


def _verb_suffix(w: str, pv: int):
    for suf in _STEP2:
        if w.endswith(suf) and len(w) - len(suf) >= pv:
            return w[: len(w) - len(suf)], True
    return w, False


def stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    pv, p1, p2 = _regions(w)

    w2, ok = _standard_suffix(w, pv, p1, p2)
    if ok:
        w = w2
    else:
        w, ok = _verb_suffix(w, pv)
    if ok:
        # step 3: final i after c, in RV
        if w.endswith("i") and len(w) - 1 >= pv and len(w) >= 2 and w[-2] == "c":
            w = w[:-1]
    else:
        # step 4: residual suffix
        for suf in _RESIDUAL:
            if w.endswith(suf) and len(w) - len(suf) >= pv:
                w = w[: len(w) - len(suf)]
                break

    # step 5 (always)
    if w and w[-1] in "eéê" and len(w) - 1 >= pv:
        w = w[:-1]
        if (
            len(w) >= 2
            and len(w) - 1 >= pv
            and (
                (w[-1] == "u" and w[-2] == "g")
                or (w[-1] == "i" and w[-2] == "c")
            )
        ):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
