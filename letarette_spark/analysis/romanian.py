"""Snowball Romanian stemmer — pure Python, bit-exact to the compiled
libstemmer 'romanian' UTF-8 stemmer (snowball 2.2.0, which recognizes
the CEDILLA spellings ş/ţ; comma-below ș/ț pass through as plain
consonants). Pinned by tests/test_romanian_goldens.py against the
golden vectors captured from the compiled library (reference
internal/snowball/byggfil; snowball.c:210-220 chain semantics).

Implements the published Romanian algorithm
(snowballstem.org/algorithms/romanian/stemmer.html) with the among
semantics derived by probing the compiled stemmer:

  prelude: u/i between vowels -> U/I (so the aua/iua step-0 entries
      never see an unmarked u — matching the library)
  vowels: a ă â e i î o u ; RV Romance-style, R1/R2 standard
  steps 0-2 and 4: the LONGEST MATCHING entry wins regardless of
      region fit; its R1/R2/RV condition then commits (failure aborts
      the step — no fallthrough)
  step 3 (verbs; only when steps 1-2 removed nothing): setlimit to RV —
      the longest entry FITTING RV wins; group A then needs a
      preceding consonant or u (commit on failure), group B
      (at/it/ut/aţi…, the se/sese family) is unconditional
  step 4: final a/e/i/ie/ă in RV
  postlude: unmark U I
"""

from __future__ import annotations

_V = frozenset("aăâeiîou")

_STEP0 = sorted(
    ["ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei",
     "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia"],
    key=len,
    reverse=True,
)

_STEP1 = [
    (("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
    (("ibilitate",), "ibil"),
    (("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
    (("icitate", "icitati", "icităi", "icităţi", "icator", "icatori",
      "iciv", "iciva", "icive", "icivi", "icivă", "ical", "icala",
      "icale", "icali", "icală"), "ic"),
    (("ativ", "ativa", "ative", "ativi", "ativă", "aţiune", "atoare",
      "ator", "atori", "ătoare", "ător", "ători"), "at"),
    (("itiv", "itiva", "itive", "itivi", "itivă", "iţiune", "itoare",
      "itor", "itori"), "it"),
]
_STEP1_FLAT = sorted(
    [(s, rep) for sufs, rep in _STEP1 for s in sufs],
    key=lambda x: len(x[0]),
    reverse=True,
)

_STEP2_DELETE = (
    "at", "ata", "ată", "ati", "ate", "ut", "uta", "ută", "uti", "ute",
    "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice", "ici", "ică",
    "abil", "abila", "abile", "abili", "abilă", "ibil", "ibila",
    "ibile", "ibili", "ibilă", "oasa", "oasă", "oase", "os", "osi",
    "oşi", "ant", "anta", "ante", "anti", "antă", "ator", "atori",
    "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive", "ivi",
    "ivă",
)
_STEP2_IST = ("ism", "isme", "ist", "ista", "iste", "isti", "istă",
              "işti")
_STEP2 = sorted(
    [*_STEP2_DELETE, "iune", "iuni", *_STEP2_IST], key=len, reverse=True
)

# verb suffixes: group A needs a preceding consonant or u WITHIN RV
# (commit on failure); B is unconditional. Both probe-derived from the
# compiled library with step-2 interference excluded (prefixes whose R2
# cannot cover the suffix).
_VERB_A = (
    "ai", "am", "are", "ară", "arăm", "ase", "asem", "aseră",
    "aserăm", "aserăţi", "aseşi", "au", "aşi", "ea", "eai", "eam",
    "ească",
    "eau", "eaţi", "ează", "ere", "esc", "ez", "eze", "ezi", "eşte",
    "eşti",
    "ia", "iai", "iam", "iau", "iaţi", "ind", "indu", "iră", "ire",
    "irăm",
    "ise", "isem", "iseră", "iserăm", "iserăţi", "iseşi", "işi", "ui",
    "ură", "urăm", "use", "usem", "useră", "userăm", "userăţi",
    "useşi", "uşi", "âi", "ând", "ându", "âră", "âre", "ârăm", "âse",
    "âsem", "âseră", "âserăm", "âserăţi", "âseşi", "âşi", "ăsc",
    "ăşte", "ăşti",
)
_VERB_B = (
    "aţi", "em", "eţi", "im", "iţi", "se", "sei", "seră", "serăm",
    "serăţi", "sese", "sesem", "seseră", "seserăm", "seserăţi",
    "seseşi", "seşi", "âm", "âţi", "ăm",
)
_VERBS = sorted([*_VERB_A, *_VERB_B], key=len, reverse=True)

_STEP4 = sorted(["a", "e", "i", "ie", "ă"], key=len, reverse=True)


def _prelude(word: str) -> str:
    w = list(word)
    p = 0
    while p < len(w):
        c = w[p]
        nxt = w[p + 1] if p + 1 < len(w) else ""
        if c in _V and nxt in ("u", "i"):
            if p + 2 < len(w) and w[p + 2] in _V:
                w[p + 1] = "U" if nxt == "u" else "I"
                p += 2
                continue
        p += 1
    return "".join(w)


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


def stem(word: str) -> str:
    w = _prelude(word)
    pv, p1, p2 = _regions(w)

    # ---- step 0: plural/article (longest match; R1 commits) ----
    for suf in _STEP0:
        if w.endswith(suf):
            s = len(w) - len(suf)
            if s >= p1:
                if suf in ("ul", "ului"):
                    w = w[:s]
                elif suf == "aua":
                    w = w[:s] + "a"
                elif suf in ("ea", "ele", "elor"):
                    w = w[:s] + "e"
                elif suf in ("ii", "iua", "iei", "iile", "iilor",
                             "ilor"):
                    w = w[:s] + "i"
                elif suf == "ile":
                    if not w[:s].endswith("ab"):
                        w = w[:s] + "i"
                elif suf == "atei":
                    w = w[:s] + "at"
                else:  # aţie / aţia
                    w = w[:s] + "aţi"
            break

    # ---- step 1: combining suffixes, repeated to fixpoint ----
    removed_1_2 = False
    while True:
        changed = False
        for suf, rep in _STEP1_FLAT:
            if w.endswith(suf):
                if len(w) - len(suf) >= p1:
                    w = w[: len(w) - len(suf)] + rep
                    removed_1_2 = True
                    changed = True
                break  # longest match commits either way
        if not changed:
            break

    # ---- step 2: standard suffixes (longest match; R2 commits) ----
    for suf in _STEP2:
        if w.endswith(suf):
            s = len(w) - len(suf)
            if s >= p2:
                if suf in _STEP2_IST:
                    w = w[:s] + "ist"
                    removed_1_2 = True
                elif suf in ("iune", "iuni"):
                    if s >= 1 and w[s - 1] == "ţ":
                        w = w[: s - 1] + "t"
                        removed_1_2 = True
                else:
                    w = w[:s]
                    removed_1_2 = True
            break

    # ---- step 3: verbs (setlimit RV: longest FITTING entry) ----
    if not removed_1_2:
        for suf in _VERBS:
            if w.endswith(suf) and len(w) - len(suf) >= pv:
                s = len(w) - len(suf)
                if suf in _VERB_B or (
                    s >= 1
                    and s - 1 >= pv
                    and (w[s - 1] not in _V or w[s - 1] == "u")
                ):
                    w = w[:s]
                break  # condition failure commits
    # ---- step 4: final vowel (longest match; RV commits) ----
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= pv:
                w = w[: len(w) - len(suf)]
            break

    return w.replace("I", "i").replace("U", "u")
