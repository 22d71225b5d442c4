"""Snowball Hindi stemmer — pure Python, bit-exact to the compiled
libstemmer 'hindi' UTF-8 stemmer the reference links against
(reference internal/snowball/byggfil fetches libstemmer_c;
snowball.c:210-220 runs the configured stemmer chain over folded
tokens).

A lightweight longest-suffix stripper over Devanagari (the published
algorithm follows Ramanathan & Rao's "A Lightweight Stemmer for
Hindi"): one strip per word, choosing the longest matching entry whose
guard passes, with FALL-THROUGH to shorter entries when a longer
match's guard fails (probed: 'कताएं' -> 'कत' — the guarded 'ताएं'
fails its 2-char-stem guard and the free 'ाएं' fires instead; same
for 'ाएं' -> 'ा' via 'एं').

Guards (probe-derived, tools/probe_stemmer.py):
  - the 12 consonant-initial entries (कर ता ती ते ना नी ने तीं ताएं
    ताओं नाएं नाओं) require the immediately preceding codepoint to be
    a CONSONANT (U+0915-0939, U+093C nukta, U+0958-095F) that is not
    word-initial ('कीकर' and 'क्कर' don't strip, 'अककर' -> 'अक'
    does);
  - every other entry (matra- or independent-vowel-initial, including
    the composite vowel+suffix forms अकर/ाकर/आता/... and the bare
    virama '्') requires >= 1 codepoint of stem.

Pinned by tests/test_hindi_goldens.py against vectors captured from
the compiled library (tools/gen_snowball_goldens.py --lang hindi).
"""

from __future__ import annotations

# entries requiring >= 2 codepoints of stem before them
_GUARDED = (
    "कर", "ता", "ती", "ते", "ना", "नी", "ने", "तीं",
    "ताएं", "ताओं", "नाएं", "नाओं",
)

# entries requiring >= 1 codepoint of stem (vowel/matra-initial,
# discovered exhaustively + leftward closure against the compiled
# library; the composites like 'अकर'/'ाकर' are real single entries —
# 'अअकर' -> 'अ' strips all three codepoints in one match)
_FREE = (
    "अ", "आ", "इ", "ई", "उ", "ऊ", "ए", "ओ",
    "ा", "ि", "ी", "ु", "ू", "े", "ो", "्",
    "आँ", "आं", "आई", "आए", "आओ", "इए", "ईं", "एं", "ओं",
    "ाँ", "ां", "ाई", "ाए", "ाओ", "िए", "ीं", "ें", "ों",
    "अकर", "अता", "अती", "अते", "अना", "अनी", "अने",
    "आइए", "आईं", "आएं", "आओं", "आकर", "आता", "आती", "आते",
    "आना", "आने", "आया",
    "उआं", "उएं", "उओं", "एगा", "एगी", "ओगी", "ओगे",
    "ाइए", "ाईं", "ाएं", "ाओं", "ाकर", "ाता", "ाती", "ाते",
    "ाना", "ाने", "ाया",
    "ुआं", "ुएं", "ुओं", "ेगा", "ेगी", "ोगी", "ोगे",
    "अतीं", "आएगा", "आएगी", "आओगी", "आओगे", "आतीं",
    "इयाँ", "इयां", "इयों", "एंगी", "एंगे",
    "ाएगा", "ाएगी", "ाओगी", "ाओगे", "ातीं",
    "ियाँ", "ियां", "ियों", "ूंगा", "ूंगी", "ेंगी", "ेंगे",
    "ऊंगा", "ऊंगी", "ाऊंगा", "ाऊंगी", "आऊंगा", "आऊंगी",
    "अताएं", "अताओं", "अनाएं", "अनाओं",
    "आइयाँ", "आइयां", "आइयों", "आएंगी", "आएंगे",
    "ाइयाँ", "ाइयां", "ाइयों", "ाएंगी", "ाएंगे",
)

_CONSONANT = frozenset(
    [chr(c) for c in range(0x0915, 0x093A)]
    + ["़"]
    + [chr(c) for c in range(0x0958, 0x0960)]
)

# (suffix, guarded) sorted longest-first: first passing entry strips.
_ENTRIES = sorted(
    [(s, True) for s in _GUARDED] + [(s, False) for s in _FREE],
    key=lambda e: len(e[0]),
    reverse=True,
)


def stem(word: str) -> str:
    for suf, guarded in _ENTRIES:
        if not word.endswith(suf):
            continue
        stem_len = len(word) - len(suf)
        if guarded:
            if stem_len >= 2 and word[stem_len - 1] in _CONSONANT:
                return word[:stem_len]
        elif stem_len >= 1:
            return word[:stem_len]
    return word
