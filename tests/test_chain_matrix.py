"""Chain semantics across the full 24-language stemmer matrix.

The reference tokenizer applies a stemmer CHAIN: stemmers run in
configured order and the first one that changes the token's BYTE
length wins (reference internal/snowball/snowball.c:210-220 —
stemmedLength != nToken compares byte counts, so a same-byte-length
rewrite does NOT stop the chain; bytes and characters diverge for
transliterating stemmers like serbian).  The per-language goldens suites pin each stemmer and a few
two-language chains; this suite pins the chain GLUE uniformly: for
random chains drawn from every supported language and words drawn
from every language's golden vocabulary, the analyzer's term_of must
equal a reference fold over the bit-exact stemmers."""

from __future__ import annotations

import gzip
import importlib
import os
import random

from letarette_spark.analysis.tokenizer import (
    Analyzer,
    AnalyzerConfig,
    supported_languages,
)

_DATA = os.path.join(os.path.dirname(__file__), "data")


def _stem_fn(lang: str):
    if lang == "porter":
        from letarette_spark.analysis import porter

        return porter.stem
    if lang == "english":
        from letarette_spark.analysis import porter2

        return porter2.stem
    return importlib.import_module(f"letarette_spark.analysis.{lang}").stem


def _vocab(lang: str, step: int = 211) -> list[str]:
    path = os.path.join(_DATA, f"snowball_{lang}_goldens.tsv.gz")
    if not os.path.exists(path):  # porter has no own goldens file
        path = os.path.join(_DATA, "snowball_english_goldens.tsv.gz")
    if not os.path.exists(path):
        return []
    out = []
    with gzip.open(path, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % step == 0:
                out.append(line.split("\t")[0])
    return out


def test_chain_first_length_change_wins_across_all_languages():
    langs = [lg for lg in supported_languages() if lg != "porter"]
    assert len(langs) >= 23
    stems = {lg: _stem_fn(lg) for lg in langs}
    words = []
    for lg in langs:
        words.extend(_vocab(lg))
    assert len(words) > 1500

    def chain_expected(word: str, chain: tuple[str, ...]) -> str:
        out = word
        nbytes = len(word.encode("utf-8"))
        for lg in chain:
            out = stems[lg](word)
            if len(out.encode("utf-8")) != nbytes:
                break
        return out

    rng = random.Random(20260817)
    chains = [tuple(rng.sample(langs, rng.choice((2, 3)))) for _ in range(6)]
    for chain in chains:
        an = Analyzer(AnalyzerConfig(languages=chain))
        checked = 0
        for w in rng.sample(words, 400):
            if not (3 <= len(w.encode("utf-8")) <= 40):
                continue
            assert an.term_of(w) == chain_expected(w, chain), (w, chain)
            checked += 1
        assert checked > 200, chain
