"""Snowball Hungarian stemmer — pure Python, bit-exact to the compiled
libstemmer 'hungarian' UTF-8 stemmer the reference links against
(reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded tokens).

Implements the published Hungarian algorithm
(snowballstem.org/algorithms/hungarian/stemmer.html) as shipped in
libstemmer 2.2.0, verified by differential probing
(tools/probe_stemmer.py --lang hungarian --diff):

  vowels: a á e é i í o ó ö ő u ú ü ű
  R1: word starts with a vowel -> after the first consonant run's first
      consonant OR consonant digraph (cs dz dzs gy ly ny sz ty zs,
      longest first); starts with a consonant -> after the first vowel;
      no such position -> null region.
  Steps (in order): instrumental case (al/el after double consonant,
  delete + undouble), frequent cases (+ trailing á->a é->e), special
  cases, other cases, factive (á/é after double consonant, delete +
  undouble), owned, singular owner, plural owner, plural.

Every among() here COMMITS to the longest matching suffix before the R1
test (snowball `[substring] R1 among(...)` semantics) — a longest match
failing R1 does NOT fall through to a shorter entry.

Pinned by tests/test_hungarian_goldens.py against vectors captured from
the compiled library (tools/gen_snowball_goldens.py --lang hungarian).
"""

from __future__ import annotations

_VOWELS = frozenset("aáeéiíoóöőuúüű")

_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz",
)

# step 2: frequent case endings, deleted in R1; a trailing á/é on the
# remainder is then unaccented.  Membership pinned by commit-failure
# probes ('zat' unchanged -> 'at' IS an entry whose longest-match commit
# fails R1; 'zit' -> 'zi' -> 'it' is NOT, plain 't' fires).
_CASE = sorted(
    [
        "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
        "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
        "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp",
        "képpen", "kor", "ul", "ül", "vá", "vé", "onként", "enként",
        "anként", "ként", "en", "on", "an", "ön", "n", "t",
    ],
    key=len,
    reverse=True,
)

_CASE_SPECIAL = [("ánként", "a"), ("én", "e"), ("án", "a")]

_CASE_OTHER = [
    ("astul", ""), ("estül", ""), ("ástul", "a"), ("éstül", "e"),
    ("stul", ""), ("stül", ""),
]

# probed against the compiled library (dorsd* carrier series): the
# accented-owner entries REPLACE with the unaccented vowel (áké->a,
# éé->e, ...), which the later sing_owner step then deletes when it is
# still word-final — that two-step dance is what makes 'cuáéé'->'cuá'
# (owned éé->e, sing_owner deletes 'e', the á survives because
# sing_owner already consumed its one match).
_OWNED = [
    ("áké", "a"), ("éké", "e"), ("aké", ""), ("eké", ""), ("oké", ""),
    ("öké", ""), ("ké", ""), ("áéi", "a"), ("ééi", "e"), ("éi", ""),
    ("éé", "e"), ("é", ""),
]

_SING_OWNER = [
    ("ünk", ""), ("unk", ""), ("ánk", "a"), ("énk", "e"), ("nk", ""),
    ("ájuk", "a"), ("éjük", "e"), ("juk", ""), ("jük", ""),
    ("uk", ""), ("ük", ""),
    ("ém", "e"), ("ám", "a"), ("em", ""), ("om", ""), ("am", ""),
    ("m", ""),
    ("ád", "a"), ("éd", "e"), ("od", ""), ("ed", ""), ("ad", ""),
    ("öd", ""), ("d", ""),
    ("ja", ""), ("je", ""),
    ("á", "a"), ("é", "e"), ("a", ""), ("e", ""), ("o", ""),
]

_PLUR_OWNER = [
    ("jaitok", ""), ("jeitek", ""), ("áitok", "a"), ("éitek", "e"),
    ("aitok", ""), ("eitek", ""), ("itek", ""),
    ("jaink", ""), ("jeink", ""), ("áink", "a"), ("éink", "e"),
    ("aink", ""), ("eink", ""), ("ink", ""),
    ("jaim", ""), ("jeim", ""), ("áim", "a"), ("éim", "e"),
    ("aim", ""), ("eim", ""), ("im", ""),
    ("jaid", ""), ("jeid", ""), ("áid", "a"), ("éid", "e"),
    ("aid", ""), ("eid", ""), ("id", ""),
    ("jaik", ""), ("jeik", ""), ("áik", "a"), ("éik", "e"),
    ("aik", ""), ("eik", ""), ("ik", ""),
    ("jai", ""), ("jei", ""), ("ái", "a"), ("éi", "e"),
    ("ai", ""), ("ei", ""), ("i", ""),
]

_PLURAL = [
    ("ák", "a"), ("ék", "e"),
    ("ök", ""), ("ok", ""), ("ek", ""), ("ak", ""), ("k", ""),
]


def _r1(word: str) -> int:
    n = len(word)
    if not n:
        return n
    if word[0] in _VOWELS:
        i = 1
        while i < n and word[i] in _VOWELS:
            i += 1
        if i >= n:
            return n
        for dg in _DIGRAPHS:
            if word.startswith(dg, i):
                return i + len(dg)
        return i + 1
    for i in range(n):
        if word[i] in _VOWELS:
            return i + 1
    return n


def _longest(word: str, table) -> tuple[str, str] | None:
    """Longest suffix match over (suffix, replacement) pairs — the
    snowball among() commits to the longest entry regardless of any
    later R1 test."""
    best = None
    for suf, rep in table:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep)
    return best


def _ends_double(word: str) -> bool:
    return any(word.endswith(d) for d in _DOUBLES)


def _undouble(word: str) -> str:
    # snowball: next [hop 1] delete — removes the second-to-last char,
    # turning ssz->sz, ccs->cs, bb->b.
    return word[:-2] + word[-1] if len(word) >= 2 else word


def stem(word: str) -> str:
    r1 = _r1(word)

    # ---- step 1: instrumental (al/el after a double consonant) ----
    for suf in ("al", "el"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1 and _ends_double(word[: -len(suf)]):
                word = _undouble(word[: -len(suf)])
            break

    # ---- step 2: frequent cases ----
    for suf in _CASE:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)]
                # v_ending: the trailing á/é is only unaccented if it
                # itself lies in R1 (probed: 'zét' -> 'zé', not 'ze')
                if word.endswith("á") and len(word) - 1 >= r1:
                    word = word[:-1] + "a"
                elif word.endswith("é") and len(word) - 1 >= r1:
                    word = word[:-1] + "e"
            break

    # ---- step 3: special cases ----
    m = _longest(word, _CASE_SPECIAL)
    if m and len(word) - len(m[0]) >= r1:
        word = word[: -len(m[0])] + m[1]

    # ---- step 4: other cases ----
    m = _longest(word, _CASE_OTHER)
    if m and len(word) - len(m[0]) >= r1:
        word = word[: -len(m[0])] + m[1]

    # ---- step 5: factive (á/é after a double consonant) ----
    for suf in ("á", "é"):
        if word.endswith(suf):
            if len(word) - 1 >= r1 and _ends_double(word[:-1]):
                word = _undouble(word[:-1])
            break

    # ---- steps 6-9: owned / singular owner / plural owner / plural ----
    # SEQUENTIAL `do` steps, each applied at most once in order (probed:
    # 'dorsdie' loses 'e' to sing_owner and then 'i' to plur_owner;
    # 'dorsdoi' keeps the 'o' because sing_owner ran before plur_owner
    # exposed it).
    for table in (_OWNED, _SING_OWNER, _PLUR_OWNER, _PLURAL):
        m = _longest(word, table)
        if m and len(word) - len(m[0]) >= r1:
            word = word[: -len(m[0])] + m[1]

    return word
