"""Snowball Swedish stemmer: full-vocabulary proof + chain semantics.

24,925 (word, stem) golden vectors captured from the compiled libstemmer
'swedish' UTF-8 stemmer (the library the reference's tokenizer links —
internal/snowball/byggfil; sb_stemmer_new(lang, "UTF_8"),
snowball.c:296). Vectors cover ~170 Swedish bases x a 64-suffix matrix
over every rule family (the 36 step-1 endings, conditional 's', step-2
double-consonant trims, step-3 lig/ig/els + löst/fullt, å/ä/ö vowels,
the >=3-letter R1 adjustment), rule-edge adversarials, and 15k seeded
random strings. Regenerate: python tools/gen_snowball_goldens.py --lang
swedish.

The analyzer's stemmer CHAIN follows snowball.c:210-220: each configured
stemmer is applied to the ORIGINAL folded token in order until one
changes its length; the last tried stemmer's output is emitted either
way. The index manifest stamps the chain (analyzer config key), so an
index refuses queries under a different chain — the stemmerstate analog
(internal/letarette/stemmer.go:32-59)."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import porter2, swedish
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_swedish_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_swedish_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = swedish.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 20000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_swedish_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("swedish")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = "abcdefghijklmnopqrstuvwxyzäåö" + "aeiouyäåö" * 2 + "st" * 2
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        if swedish.stem(w) != st.stem(w):
            bad.append((w, st.stem(w), swedish.stem(w)))
    assert not bad, bad[:10]


class TestStemmerChain:
    def test_first_length_change_wins_and_last_output_otherwise(self):
        """Reproduce snowball.c:213-219 exactly: stem the ORIGINAL token
        with each chain member; break on the first length change; emit the
        last tried output either way."""
        stems = {"english": porter2.stem, "swedish": swedish.stem}

        def chain_expected(word, langs):
            out = word
            for lang in langs:
                out = stems[lang](word)
                if len(out.encode("utf-8")) != len(word.encode("utf-8")):  # byte rule, snowball.c:216
                    break
            return out

        vocab = []
        with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
            for i, line in enumerate(f):
                if i % 9 == 0:
                    vocab.append(line.split("\t")[0])
        order_matters = [
            w for w in vocab
            if chain_expected(w, ("english", "swedish"))
            != chain_expected(w, ("swedish", "english"))
        ]
        assert order_matters, "fixture vocabulary must exercise chain order"
        for langs in (("english", "swedish"), ("swedish", "english"), ("swedish",)):
            an = Analyzer(AnalyzerConfig(languages=langs))
            for w in vocab[:400] + order_matters[:50]:
                # only tokens inside [stem_min, stem_max] bytes are stemmed
                if 3 <= len(w.encode("utf-8")) <= 40:
                    assert an.term_of(w) == chain_expected(w, langs), (w, langs)

    def test_manifest_refuses_mismatched_chain(self, spark, tmp_path):
        from letarette_spark.index.builder import Index, build_index

        root = str(tmp_path / "sv_idx")
        sdf = spark.createDataFrame(
            [{"doc_id": "d1", "rowid": 1, "space": "m",
              "title": "flickorna", "body": "jackorna hängde i hallen",
              "alive": True}]
        )
        cfg_sv = AnalyzerConfig(languages=("swedish",))
        build_index(spark, sdf, root, config=cfg_sv, n_build_partitions=1,
                    chunk_size=1)
        Index.open(spark, root, cfg_sv)  # matching chain loads
        with pytest.raises(ValueError):
            Index.open(spark, root, AnalyzerConfig(languages=("english",)))


class TestSwedishModeRankIdentity:
    """Whole-pipeline identity under the swedish chain via pre-stemming:
    both sides receive the identical folded+stemmed token stream (stemmed
    terms are plain alphanumerics after unicode61 remove_diacritics 2
    folding), FTS5 computes real bm25(5,1) over it — the same oracle
    technique as test_letarette_mode_oracle.py."""

    def test_rank_identity(self, spark, tmp_path):
        from letarette_spark.index.builder import Index, build_index
        from letarette_spark.query.executor import Searcher
        from tests.fts5_oracle import Fts5Index

        cfg = AnalyzerConfig(languages=("swedish",))
        an = Analyzer(cfg)
        vocab = (
            "flickorna jackorna möjligheten verkligheten hemligheter "
            "betydelsen kärlekens meningsfullt hoppfullt klokaste vackrast "
            "springer hoppade byggde huset barnen skolan läraren eleverna "
            "44 på och att det som en av"
        ).split()
        rng = random.Random(3)
        docs = []
        for i in range(60):
            title = " ".join(rng.choices(vocab, k=rng.randint(1, 3)))
            body = " ".join(rng.choices(vocab, k=rng.randint(8, 30)))
            docs.append((i + 1, title, body))

        root = str(tmp_path / "sv_rank_idx")
        sdf = spark.createDataFrame(
            [{"doc_id": f"d{r}", "rowid": r, "space": "m", "title": t,
              "body": b, "alive": True} for r, t, b in docs]
        )
        build_index(spark, sdf, root, config=cfg, n_build_partitions=2,
                    chunk_size=2)
        s = Searcher(Index.open(spark, root, cfg), stopwords=frozenset(),
                     synonyms={})

        def prestem(text):
            return " ".join(an.terms(text))

        oracle = Fts5Index.build(
            [(r, prestem(t), prestem(b)) for r, t, b in docs],
            tokenizer="unicode61 remove_diacritics 2",
        )
        for q in ("flickorna", "huset barnen", "möjligheten -skolan",
                  "klokaste", '"huset barnen"'):
            from letarette_spark.query.parser import (
                Phrase, compile_match_string, parse_query, reduce_phrases,
            )

            phrases = []
            for p in reduce_phrases(parse_query(q)):
                terms = an.terms(p.text)
                if terms:
                    phrases.append(
                        Phrase(" ".join(terms), wildcard=p.wildcard,
                               exclude=p.exclude)
                    )
            match = compile_match_string(phrases)
            exp = oracle.search(match, limit=10) if match else []
            df, _t, _c = s.search_df(q, limit=10)
            got = (
                [(r["rowid"], r["score"]) for r in df.collect()]
                if df is not None else []
            )
            assert [r for r, _ in got] == [r for r, _ in exp], q
            for (_, sg), (_, se) in zip(got, exp):
                assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), q
