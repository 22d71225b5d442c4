"""Snowball Nepali stemmer — pure Python, bit-exact to the compiled
libstemmer 'nepali' UTF-8 stemmer the reference links against
(reference internal/snowball fetches libstemmer_c; snowball.c:210-220
runs the configured stemmer chain over folded tokens).

Three suffix categories over Devanagari (the published algorithm
follows Bal/Shrestha's Nepali stemmer; tables recovered from the
compiled library's among() data via tools/extract_among.py and the
conditions pinned by differential probing, tools/probe_stemmer.py):

  - category 1 (postpositions) stripped ONCE at the start, longest
    match; the क-forms (को का की कि कै) only strip when NOT preceded
    by ए or े (those are verbal participles, left for category 3:
    'कएको' -> क via एको, but 'कआको' -> कआ via को);
  - then a loop: each iteration may first strip one trailing
    ँ/ं (only after यौ/छौ/नौ/थे) or ै (only after त्र) — category 2,
    applied even when the following category-3 step fails ('कनौं' ->
    कनौ) — then must strip one category-3 verbal suffix (longest
    match, unconditional) for the loop to continue;
  - category 3 may consume the whole word ('हरूलाई' -> '').

Pinned by tests/test_nepali_goldens.py against vectors captured from
the compiled library (tools/gen_snowball_goldens.py --lang nepali).
"""

from __future__ import annotations

# category 1: stripped once, longest match.  True = the क-form
# condition (no preceding ए/े).
_CAT1 = {
    "मार्फत": False, "द्वारा": False, "सँगै": False, "लाई": False,
    "लाइ": False, "सँग": False, "संग": False, "पछि": False,
    "ले": False, "मा": False, "मै": False, "रत": False,
    "को": True, "का": True, "की": True, "कि": True, "कै": True,
}
_CAT1_ENTRIES = sorted(_CAT1.items(), key=lambda e: len(e[0]), reverse=True)

# category 2: (suffix char, required immediately-preceding contexts)
_CAT2_NASAL_CTX = ("यौ", "छौ", "नौ", "थे")

# category 3: stripped in a loop, longest match, unconditional delete.
_CAT3 = (
    "ेकी", "एकी", "इएकी", "िएकी", "देखी", "थी", "दी",
    "छु", "ेछु", "नेछु", "एछु", "नु", "हरु", "हरू",
    "छे", "थे", "ने", "ेकै", "नेकै", "एकै",
    "दै", "इदै", "िदै",
    "ेको", "नेको", "एको", "इएको", "िएको",
    "दो", "इदो", "िदो",
    "यो", "इयो", "थ्यो", "भयो", "ियो", "थियो", "दियो",
    "छौ", "इछौ", "ेछौ", "नेछौ", "एछौ", "िछौ",
    "यौ", "छ्यौ", "थ्यौ", "थियौ",
    "छन्", "इछन्", "ेछन्", "नेछन्", "एछन्", "िछन्",
    "लान्", "छिन्", "थिन्", "पर्",
    "इस्", "थिइस्", "छेस्", "होस्",
    "छस्", "इछस्", "ेछस्", "नेछस्", "एछस्", "िछस्",
    "िस्", "थिस्", "थिए",
    "छ", "इछ", "ेछ", "नेछ", "हुनेछ", "हुन्छ", "इन्छ", "िन्छ",
    "एछ", "िछ",
    "ेका", "नेका", "एका", "इएका", "िएका",
    "दा", "इदा", "िदा",
    "देखि", "माथि",
)
_CAT3_ENTRIES = sorted(_CAT3, key=len, reverse=True)


def _remove_category_1(word: str) -> str:
    for suf, k_form in _CAT1_ENTRIES:
        if not word.endswith(suf):
            continue
        stem = word[: len(word) - len(suf)]
        if k_form and stem.endswith(("ए", "े")):
            return word
        return stem
    return word


def _remove_category_2(word: str) -> str:
    if word.endswith(("ँ", "ं")):
        if word[:-1].endswith(_CAT2_NASAL_CTX):
            return word[:-1]
    elif word.endswith("ै") and word[:-1].endswith("त्र"):
        return word[:-1]
    return word


def stem(word: str) -> str:
    word = _remove_category_1(word)
    while True:
        word = _remove_category_2(word)
        for suf in _CAT3_ENTRIES:
            if word.endswith(suf):
                word = word[: len(word) - len(suf)]
                break
        else:
            return word
