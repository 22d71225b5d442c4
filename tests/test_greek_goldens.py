"""Snowball Greek stemmer: full-vocabulary proof, live library
cross-check, chain membership, and rank identity.

53,233 (word, stem) golden vectors captured from the compiled
libstemmer 'greek' UTF-8 stemmer (snowball 2.2.0).  The vocabulary
covers tolower/accent folding (including the published ϊ/ΐ -> η
quirk), the step-1 exception rewrites, the verb families S1-S10 with
their re-attachment exception lists (atlimit vs ends-with), the noun
steps 2a-2d/3/4 (including step 4's stale-cursor double rewrite:
'αλυικα' -> 'αλικικ'), all thirteen step-5 ending groups in their
compiled order ('ησ*' before 'αγ*'), the test1-gated generic ending
removal of step 6, and the comparative strip of step 7.

The compiled library RETURNS AN ERROR (sb_stemmer_stem -> NULL) for
words reduced to exactly 'ισα' after an ισ-suffix strip — its
generated `('ισα' atlimit <- 'ισ')` slices with the stale ket of the
preceding delete.  Those words are excluded from goldens; this port
completes the intended rewrite instead ('ισαισα' -> 'ισ', pinned
below).

Regenerate: python tools/gen_snowball_goldens.py --lang greek."""

from __future__ import annotations

import ctypes.util
import gzip
import math
import os
import random

import pytest

from letarette_spark.analysis import greek
from letarette_spark.analysis.tokenizer import Analyzer, AnalyzerConfig

GOLDENS = os.path.join(
    os.path.dirname(__file__), "data", "snowball_greek_goldens.tsv.gz"
)

_HAVE_LIB = bool(
    ctypes.util.find_library("stemmer")
    or os.path.exists("/usr/lib/x86_64-linux-gnu/libstemmer.so.0d")
)


def test_greek_matches_compiled_snowball_goldens():
    bad = []
    n = 0
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for line in f:
            word, want = line.rstrip("\n").split("\t")
            n += 1
            got = greek.stem(word)
            if got != want:
                bad.append((word, want, got))
    assert n > 50000
    assert not bad, f"{len(bad)}/{n} divergences, first 20: {bad[:20]}"


@pytest.mark.skipif(not _HAVE_LIB, reason="compiled libstemmer not available")
def test_greek_matches_live_library_on_fresh_randoms():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_snowball_goldens import SnowballStemmer

    st = SnowballStemmer("greek")
    rng = random.Random()  # intentionally unseeded: fresh vectors each run
    alpha = ("αβγδεζηθικλμνξοπρστυφχψω" * 3 + "άέήίόύώϊϋΐΰς"
             + "ΑΒΓΔΕΖΗΘΙΚΛΜΝΞΟΠΡΣΤΥΦΧΨΩ")
    bad = []
    for _ in range(4000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        want = st.stem(w)
        if want is None:  # library-internal error path, documented
            continue
        if greek.stem(w) != want:
            bad.append((w, want, greek.stem(w)))
    assert not bad, bad[:10]


def test_known_greek_forms():
    cases = {
        # tolower + accents (ϊ/ΐ -> η is the published table's quirk)
        "Άλφα": "αλφ",
        "ΪΩΤΑ": "ιωτ",
        "ϊδιο": "ηδι",
        "τέλος": "τελ",
        # step-1 exceptions
        "φαγιου": "φα",
        "καθεστωτος": "καθεστ",
        "γεγονοτα": "γεγον",
        # verb families with re-attachment
        "αναμπαιζω": "αναμπαι",
        "μαρκιζα": "μαρκιζ",
        "δανεισμος": "δανει",
        "σεισμος": "σεισμ",
        "αγνωστικισμος": "αγνωστ",
        # step 4's stale-cursor double rewrite
        "αλυικα": "αλικικ",
        "ηθιικου": "ηθικικ",
        # compiled step order: 'ησ*' strips before 'αγ*'
        "μπαγεσησου": "μπ",
        # step5a stale-bra quirk
        "αγαμε": "αγαμ",
        "αγαμεισα": "αγαμεαγαμ",
        # generic ending removal gated on test1
        "ανθρωπος": "ανθρωπ",
        # 'παιδια' ends in steps9's 'ιδια', not just step3's 'ια'
        "παιδια": "πα",
    }
    for w, want in cases.items():
        assert greek.stem(w) == want, (w, greek.stem(w), want)


def test_greek_library_error_path_completes_naturally():
    # The compiled library returns NULL for these (stale-ket slice
    # failure); the port must never fail on text, so it finishes the
    # intended rewrite.
    assert greek.stem("ισαισα") == "ισ"
    assert greek.stem("ισα") == ""


def test_chain_membership():
    from letarette_spark.analysis import porter2

    vocab = []
    with gzip.open(GOLDENS, "rt", encoding="utf-8") as f:
        for i, line in enumerate(f):
            if i % 29 == 0:
                vocab.append(line.split("\t")[0])

    def chain_expected(word, langs):
        stems = {"english": porter2.stem, "greek": greek.stem}
        out = word
        nbytes = len(word.encode("utf-8"))
        for lang in langs:
            out = stems[lang](word)
            # byte-length chain rule (snowball.c:216)
            if len(out.encode("utf-8")) != nbytes:
                break
        return out

    for langs in (("english", "greek"), ("greek", "english")):
        an = Analyzer(AnalyzerConfig(languages=langs))
        for w in vocab[:400]:
            if 3 <= len(w.encode("utf-8")) <= 40:
                assert an.term_of(w) == chain_expected(w, langs), (w, langs)


def test_rank_identity(spark, tmp_path):
    """Whole-pipeline identity under the greek chain via the
    term-remapping oracle (stems may collide after folding, so remap
    every term — including any empty stem — to a synthetic ASCII id,
    preserving positions, dl, and df exactly)."""
    from letarette_spark.index.builder import Index, build_index
    from letarette_spark.query.executor import Searcher
    from letarette_spark.query.parser import (
        Phrase,
        compile_match_string,
        parse_query,
        reduce_phrases,
    )
    from tests.fts5_oracle import Fts5Index

    cfg = AnalyzerConfig(languages=("greek",))
    an = Analyzer(cfg)
    words = (
        "ανθρωπος παιδια υπολογιστης θαλασσα βουνο ποταμι πουλια "
        "ψαρια σκυλος γατες αγελαδες ελεφαντες φρουτα λουλουδια "
        "φυλλα δαση χωραφια ψωμι γαλα φαγητο νυχτα μερα πρωι βραδυ "
        "χρονια μηνες εβδομαδες σπιτια σχολεια βιβλια δασκαλοι "
        "μαθητες φιλοι κλεινουμε αγαπαμε διαβαζουν γραφεις"
    ).split()
    rng = random.Random(67)
    docs = []
    for i in range(40):
        title = " ".join(rng.choices(words, k=rng.randint(1, 3)))
        body = " ".join(rng.choices(words, k=rng.randint(8, 25)))
        docs.append((i + 1, title, body))

    root = str(tmp_path / "el_rank_idx")
    sdf = spark.createDataFrame(
        [
            {"doc_id": f"d{r}", "rowid": r, "space": "m", "title": t,
             "body": b, "alive": True}
            for r, t, b in docs
        ]
    )
    build_index(spark, sdf, root, config=cfg, n_build_partitions=2,
                chunk_size=2)
    s = Searcher(Index.open(spark, root, cfg), stopwords=frozenset(),
                 synonyms={})

    ids: dict[str, str] = {}

    def remap(term: str) -> str:
        if term not in ids:
            ids[term] = f"tt{len(ids)}"
        return ids[term]

    def prestem(text):
        return " ".join(remap(t) for t in an.terms(text))

    oracle = Fts5Index.build(
        [(r, prestem(t), prestem(b)) for r, t, b in docs],
        tokenizer="unicode61 remove_diacritics 2",
    )
    for q in ("ανθρωπος", "παιδια βιβλια", "θαλασσα -νυχτα"):
        phrases = []
        for p in reduce_phrases(parse_query(q)):
            terms = an.terms(p.text)
            if terms:
                phrases.append(
                    Phrase(" ".join(remap(t) for t in terms),
                           wildcard=p.wildcard, exclude=p.exclude)
                )
        match = compile_match_string(phrases)
        exp = oracle.search(match, limit=10) if match else []
        df, _t, _c = s.search_df(q, limit=10)
        got = (
            [(r["rowid"], r["score"]) for r in df.collect()]
            if df is not None
            else []
        )
        assert [r for r, _ in got] == [r for r, _ in exp], q
        for (_, sg), (_, se) in zip(got, exp):
            assert math.isclose(sg, se, rel_tol=1e-9, abs_tol=1e-12), q
