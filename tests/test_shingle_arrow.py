"""The Arrow shingle/MinHash stage (_shingle_sig_frame) must be
bit-identical to the JVM expression formulation it replaced:
shingle sets == array_distinct(transform(...concat_ws...)), and
sig_i == array_min(transform(_sh, md5(s || '#' || i))).

These pins are what let the optimization claim "results unchanged":
the driver gate hashes minhash_signatures / minhash_lsh_pairs /
jaccard_pairs values, and all three now flow through the Arrow stage.
"""

import pytest
from pyspark.sql import functions as F

from letarette_spark.functions.dedup import (
    _shingle_array_expr,
    _shingle_sig_frame,
    _sig_cols,
    minhash_signatures,
)


@pytest.fixture(scope="module")
def sf_docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).cache()


@pytest.fixture(scope="module")
def edge_docs(spark):
    rows = [
        (1, "alpha beta gamma delta alpha beta gamma"),  # repeats -> distinct
        (2, "one two"),                                  # < n tokens
        (3, ""),                                         # empty
        (4, None),                                       # null text
        (5, "x y z"),                                    # short tokens dropped (<2 chars)
        (6, "Key VALUE table KEY value TABLE key value"),  # case folding
        (7, "a1 b2 c3 d4 e5 a1 b2 c3"),                  # alnum + dup run
        (8, "word " * 50),                               # one distinct shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestArrowShingleEquivalence:
    def test_shingle_sets_match_jvm_expr(self, spark, edge_docs):
        jvm = {
            r["doc_id"]: r["sh"]
            for r in edge_docs.select(
                "doc_id", _shingle_array_expr("text", 3).alias("sh")
            ).collect()
        }
        arrow = {
            r["doc_id"]: r["_sh"]
            for r in _shingle_sig_frame(edge_docs, 3, 0).collect()
        }
        assert arrow == jvm  # exact lists: same elements, same order

    @pytest.mark.parametrize("n", [1, 2, 4])
    def test_shingle_sets_match_other_n(self, edge_docs, n):
        jvm = {
            r["doc_id"]: r["sh"]
            for r in edge_docs.select(
                "doc_id", _shingle_array_expr("text", n).alias("sh")
            ).collect()
        }
        arrow = {
            r["doc_id"]: r["_sh"]
            for r in _shingle_sig_frame(edge_docs, n, 0).collect()
        }
        assert arrow == jvm

    def test_sigs_match_jvm_fold(self, edge_docs):
        k = 6
        frame = _shingle_sig_frame(edge_docs, 3, k)
        arrow = {
            r["doc_id"]: [r[f"sig_{i}"] for i in range(k)]
            for r in frame.filter(F.size("_sh") > 0).collect()
        }
        jvm_frame = edge_docs.select(
            "doc_id", _shingle_array_expr("text", 3).alias("_sh")
        ).filter(F.size("_sh") > 0)
        jvm = {
            r["doc_id"]: [r[f"sig_{i}"] for i in range(k)]
            for r in jvm_frame.select(
                "doc_id", *_sig_cols(F.col("_sh"), k)
            ).collect()
        }
        assert arrow == jvm

    def test_minhash_signatures_on_corpus(self, spark, sf_docs):
        """Full-corpus pin at sf0.01: the public minhash_signatures output
        equals the JVM formulation row-for-row."""
        k = 8
        new = {
            r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(k))
            for r in minhash_signatures(sf_docs, k=k).collect()
        }
        jvm_frame = sf_docs.select(
            "doc_id", _shingle_array_expr("text", 3).alias("_sh")
        ).filter(F.size("_sh") > 0)
        old = {
            r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(k))
            for r in jvm_frame.select(
                "doc_id", *_sig_cols(F.col("_sh"), k)
            ).collect()
        }
        assert new == old
