"""Build lineage + resume-without-recompute (FIXTURES.md §9; analog of the
reference's interest-list commit semantics, db_index.go:122-176)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from letarette_spark.analysis.tokenizer import AnalyzerConfig
from letarette_spark.index.builder import Index, build_index
from letarette_spark.index.manifest import Manifest
from letarette_spark.sources.corpus import docs_from_corpus, generate_corpus_local


@pytest.fixture(scope="module")
def corpus(spark):
    return docs_from_corpus(spark.createDataFrame(generate_corpus_local(60, seed=3)))


CFG = AnalyzerConfig(mode="porter")


def _summary(spark, root):
    idx = Index.open(spark, root, CFG)
    postings = idx.postings()
    return {
        "meta": {k: idx.meta[k] for k in ("ndocs", "sum_dl", "nterms")},
        "postings": sorted(
            (r["term"], r["rowid"], r["tf0"], r["tf1"], tuple(r["pos0"]), tuple(r["pos1"]), r["dl"])
            for r in postings.collect()
        ),
        "term_stats": sorted(
            (r["term"], r["df"], r["cnt"]) for r in idx.term_stats().collect()
        ),
    }


def test_killed_build_resumes_without_recompute(spark, corpus, tmp_path):
    root_a = str(tmp_path / "uninterrupted")
    root_b = str(tmp_path / "killed")

    build_index(spark, corpus, root_a, config=CFG, n_build_partitions=8, chunk_size=2)

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, corpus, root_b, config=CFG,
            n_build_partitions=8, chunk_size=2, fail_after_chunks=2,
        )
    lin = Manifest(root_b).lineage()
    assert len(lin["chunks"]) == 2 and lin["plan"] is not None
    assert not Manifest.exists(root_b)  # no query-visible snapshot yet

    res = build_index(
        spark, corpus, root_b, config=CFG, n_build_partitions=8, chunk_size=2
    )
    assert res.chunks_skipped == 2 and res.chunks_built == 2
    assert Manifest(root_b).lineage()["plan"] is None  # plan cleared on commit

    assert _summary(spark, root_a) == _summary(spark, root_b)


def test_conflicting_plan_is_refused(spark, corpus, tmp_path):
    root = str(tmp_path / "conflict")
    with pytest.raises(RuntimeError):
        build_index(
            spark, corpus, root, config=CFG,
            n_build_partitions=8, chunk_size=2, fail_after_chunks=1,
        )
    with pytest.raises(ValueError, match="active build plan"):
        build_index(spark, corpus, root, config=CFG, n_build_partitions=4, chunk_size=2)


def test_analyzer_mismatch_is_refused(spark, corpus, tmp_path):
    root = str(tmp_path / "mismatch")
    build_index(spark, corpus, root, config=CFG, n_build_partitions=2, chunk_size=2)
    with pytest.raises(ValueError, match="refusing to serve"):
        Index.open(spark, root, AnalyzerConfig(mode="letarette"))


def test_sha256_invariant_checked(spark, corpus, tmp_path):
    root = str(tmp_path / "sha")
    tampered = corpus.withColumn(
        "body", F.when(F.col("rowid") % 7 == 0, F.lit("tampered")).otherwise(F.col("body"))
    )
    with pytest.raises(ValueError, match="content_sha256"):
        build_index(spark, tampered, root, config=CFG, verify_sha256=True,
                    n_build_partitions=2, chunk_size=2)
    build_index(spark, corpus, str(tmp_path / "sha_ok"), config=CFG,
                verify_sha256=True, n_build_partitions=2, chunk_size=2)
