"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the full inverted index (porter mode)
over the sf0.001 documents table and run a BM25 engine search.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators (dedup, similarity,
text analysis). Spark callables and DuckDB SQL strings are exact twins:
same token definition (simple analyzer: lower + [a-z0-9]+ runs, min length
2), same math (float64, round 6), same column names and orderings.
Hash-derived operators (simhash, fingerprint, LSH buckets) use md5 and
literal seeded hyperplanes precisely so their oracle twins exist; only the
engine BM25 path (stemmed tokens + NEAR semantics) ships without an oracle
entry → the driver records the weaker rows-only check there; its
correctness gate is the live-FTS5 rank-identity pytest suite instead.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SF_DEFAULT = "/root/testdata/sf0.001"
_EMB_DIM = 64  # testdata embeddings dim (constant across sf)

# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB) — keep in lockstep with
# letarette_spark.functions.simple_text
# ---------------------------------------------------------------------------
_ARR = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> length(x) >= 2)"
_TOK = f"SELECT doc_id, unnest({_ARR}) AS term FROM documents"

QUERY_TERMS = ["key", "value"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ---------------------------------------------------------------------------
# engine-native flagship (no SQL oracle: stemming + NEAR are not ANSI-SQL)
# ---------------------------------------------------------------------------
_ENGINE_CACHE: dict[str, object] = {}


def _engine_index_cached(
    spark: SparkSession, sf_dir: str, mode: str = "porter",
    suffix: str = "", with_rowid: bool = False,
):
    """Build-or-reuse an engine index for the driver gate, cached in-process
    and under /tmp across driver invocations. ONE implementation of the
    layout-version cache-wipe guard (rebuild when absent or when a prior
    run left an older storage layout behind) for every analyzer variant."""
    import shutil

    from letarette_spark.analysis.tokenizer import AnalyzerConfig
    from letarette_spark.index.builder import Index, LAYOUT_VERSION, build_index
    from letarette_spark.index.manifest import Manifest

    key = os.path.abspath(sf_dir) + (f"|{suffix}" if suffix else "")
    if key in _ENGINE_CACHE:
        return _ENGINE_CACHE[key]
    root = os.path.join(
        tempfile.gettempdir(), "letarette_spark_idx",
        os.path.abspath(sf_dir).strip("/").replace("/", "_")
        + (f"_{suffix}" if suffix else ""),
    )
    cfg = AnalyzerConfig(mode=mode)
    cols = [F.col("doc_id").cast("string").alias("doc_id")]
    if with_rowid:
        cols.append(F.col("doc_id").cast("long").alias("rowid"))
    cols += [
        F.col("lang").alias("space"),
        F.col("source").alias("title"),
        F.col("text").alias("body"),
        F.lit(True).alias("alive"),
    ]
    docs = _docs(spark, sf_dir).select(*cols)
    needs_build = True
    if Manifest.exists(root):
        try:
            idx = Index.open(spark, root, cfg)
            needs_build = idx.meta.get("layout") != LAYOUT_VERSION
        except Exception:
            needs_build = True
    if needs_build:
        shutil.rmtree(root, ignore_errors=True)
        build_index(spark, docs, root, config=cfg, n_build_partitions=4, chunk_size=4)
        idx = Index.open(spark, root, cfg)
    _ENGINE_CACHE[key] = idx
    return idx


def _engine_index(spark: SparkSession, sf_dir: str):
    return _engine_index_cached(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine path (tokenize → postings → BM25 NEAR top-k)
    over /root/testdata/sf0.001; returns the hit DataFrame."""
    from letarette_spark.query.executor import Searcher

    idx = _engine_index(spark, _SF_DEFAULT)
    df, _total, _capped = Searcher(idx).search_df("key value", limit=10)
    if df is None:
        return spark.createDataFrame([], "rowid long, space string, score double")
    return df


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def q_engine_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from letarette_spark.query.executor import Searcher

    idx = _engine_index(spark, sf_dir)
    df, _t, _c = Searcher(idx).search_df("key value", limit=10)
    return df.select(F.col("rowid"), F.round("score", 6).alias("score"))


def _engine_index_simple(spark: SparkSession, sf_dir: str):
    """Simple-analyzer (no stemming) index with rowid = doc_id, so the full
    engine query path has a value-exact DuckDB twin (stemming is the only
    non-ANSI-SQL step; the analyzer supports turning it off)."""
    return _engine_index_cached(
        spark, sf_dir, mode="simple", suffix="simple", with_rowid=True
    )


def q_engine_bm25_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine path — postings retrieval, NEAR(15) conjunction with
    participant-filtered tf, BM25(5.0, 1.0), top-k — hash-verified against
    a DuckDB twin that reproduces the NEAR interval algebra with nested
    list lambdas (the simple analyzer makes tokenization SQL-expressible)."""
    from letarette_spark.query.executor import Searcher

    idx = _engine_index_simple(spark, sf_dir)
    s = Searcher(idx, stopwords=frozenset(), synonyms={})
    df, _t, _c = s.search_df("key value", limit=10)
    return (
        df.select("rowid", F.round("score", 6).alias("score"))
        .orderBy("score", "rowid")
    )


def q_engine_wildcard_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine WILDCARD path — build-time prefix aggregates (the
    reference's prefix='2 3 4' B-tree analog), pre-merged per-rowid union
    of matching terms' instances, BM25(5.0, 1.0), top-k — hash-verified
    against a DuckDB twin that reproduces prefix matching with
    starts_with over the token arrays (simple analyzer: tokenization is
    SQL-expressible)."""
    from letarette_spark.query.executor import Searcher

    idx = _engine_index_simple(spark, sf_dir)
    s = Searcher(idx, stopwords=frozenset(), synonyms={})
    df, _t, _c = s.search_df("val*", limit=10)
    return (
        df.select("rowid", F.round("score", 6).alias("score"))
        .orderBy("score", "rowid")
    )


def _multiline_augmented(spark, sf_dir):
    """Corpus text given deterministic line structure (the raw corpus is
    single-line): a unique trailer per doc + a shared 2-line footer on
    even doc_ids — identical string algebra in the DuckDB twins."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nuniq "), F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("\nCopyright Example Corp\nAll rights reserved"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_lm_perplexity(spark, sf_dir):
    """Corpus-trained bigram-LM perplexity (functions/lm_score.py) — the
    CCNet-style fluency signal; add-k smoothing, exact model, rounded to
    6 decimals for cross-engine value hashing."""
    from letarette_spark.functions.lm_score import lm_perplexity

    return lm_perplexity(_docs(spark, sf_dir)).orderBy("doc_id")


def q_pack_sequences(spark, sf_dir):
    """Cross-document sequence packing (functions/packing.py): 96-token
    budget, 4 pack groups; md5 of the packed text so the driver compares
    exact sequence content."""
    from letarette_spark.functions.packing import pack_sequences

    out = pack_sequences(_docs(spark, sf_dir), budget=96, n_groups=4)
    return out.select(
        "group", "seq_idx", "n_tokens", "n_docs",
        F.md5(F.col("seq")).alias("seq_md5"),
    ).orderBy("group", "seq_idx")


def q_repeated_spans(spark, sf_dir):
    """Exact-substring repeat table (functions/spandedup.py): 12-token
    windows appearing >= 2 times corpus-wide — the audit view of the
    span dedup (Lee et al. 2022 reformulated at window granularity)."""
    from letarette_spark.functions.spandedup import repeated_spans

    return repeated_spans(_docs(spark, sf_dir), span_tokens=12).orderBy("whash")


def q_span_dedup_clean(spark, sf_dir):
    """Strip every token covered by a repeated 12-token window; md5 of
    the surviving text so the driver compares exact content."""
    from letarette_spark.functions.spandedup import strip_repeated_spans

    out = strip_repeated_spans(_docs(spark, sf_dir), span_tokens=12)
    return out.select(
        "doc_id", F.md5(F.col("clean")).alias("clean_md5"),
        "n_tokens", "n_removed",
    ).orderBy("doc_id")


def q_repetition_scores(spark, sf_dir):
    """Gopher repetition signals (functions/textstats.py
    repetition_scores): dup-n-gram fraction + top-n-gram character
    fraction for n = 2, 3, 4, deterministic argmax tie-break."""
    from letarette_spark.functions.textstats import repetition_scores

    return repetition_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def q_pipeline_audit(spark, sf_dir):
    """One-call training-data preparation (functions/pipeline.py):
    quality gates -> exact dedup -> near dedup (LSH, jaccard >= 0.05) ->
    decontamination vs the doc_id%20 benchmark slice; per-doc kept flag
    + first-dropping-stage reason."""
    from letarette_spark.functions.pipeline import prepare_training_data

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 20 == 0)
    train = d.filter(F.col("doc_id") % 20 != 0)
    return prepare_training_data(train, bench, threshold=0.05).orderBy("doc_id")


def q_chunk_documents(spark, sf_dir):
    """Token-window chunking (functions/chunking.py): 40-token windows
    with 8-token overlap; md5 of each chunk so the driver compares the
    exact window text."""
    from letarette_spark.functions.chunking import chunk_documents

    out = chunk_documents(_docs(spark, sf_dir), max_tokens=40, overlap=8)
    return out.select(
        "doc_id", "chunk_idx",
        F.md5(F.col("chunk")).alias("chunk_md5"), "n_tokens",
    ).orderBy("doc_id", "chunk_idx")


def q_boilerplate_lines(spark, sf_dir):
    """Cross-document boilerplate detection (functions/boilerplate.py):
    lines whose document frequency >= 2 over the line-augmented corpus."""
    from letarette_spark.functions.boilerplate import boilerplate_lines

    return boilerplate_lines(
        _multiline_augmented(spark, sf_dir), min_df=2
    ).orderBy("line")


def q_boilerplate_clean(spark, sf_dir):
    """Boilerplate removal: per-doc md5 of the cleaned text (remaining
    lines in original order) so the driver compares byte-for-byte."""
    from letarette_spark.functions.boilerplate import remove_boilerplate_lines

    out = remove_boilerplate_lines(_multiline_augmented(spark, sf_dir), min_df=2)
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("clean_md5")
    ).orderBy("doc_id")


def _pii_augmented(spark, sf_dir):
    """The corpus text with deterministic synthetic PII appended (the raw
    corpus contains none) — identical string algebra in the DuckDB twin."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or https://example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-123-4567"),
        ).alias("text"),
    )


def q_pii_redact(spark, sf_dir):
    """PII scrubbing (functions/redact.py): chained regexp_replace over
    url/email/ipv4/ssn/phone in one zero-shuffle scan; output hashed so
    the driver compares full redacted text byte-for-byte."""
    from letarette_spark.functions.redact import redact

    out = redact(_pii_augmented(spark, sf_dir))
    return out.select(
        "doc_id", F.md5(F.col("text")).alias("redacted_md5")
    ).orderBy("doc_id")


def q_pii_counts(spark, sf_dir):
    """Per-doc PII match counts (audit view for drop-vs-redact policy)."""
    from letarette_spark.functions.redact import pii_counts

    return pii_counts(_pii_augmented(spark, sf_dir)).orderBy("doc_id")


def q_sample_fraction(spark, sf_dir):
    """Deterministic Bernoulli sample (functions/sampling.py): md5-derived
    unit hash < 0.1 — a pure zero-shuffle filter, same subset at any
    partitioning/cluster size."""
    from letarette_spark.functions.sampling import hash_sample

    return hash_sample(_docs(spark, sf_dir), 0.1, seed=42).select(
        "doc_id"
    ).orderBy("doc_id")


def q_sample_quota(spark, sf_dir):
    """Exactly-20-per-language quota sample: the 20 smallest unit hashes
    per stratum, ties by key — deterministic, partition-independent."""
    from letarette_spark.functions.sampling import quota_sample

    return quota_sample(_docs(spark, sf_dir), "lang", 20, seed=42).select(
        "lang", "doc_id"
    ).orderBy("lang", "doc_id")


def q_cluster_split(spark, sf_dir):
    """Leakage-safe train/test split (functions/sampling.py
    split_by_cluster): near-dup clusters (jaccard >= 0.05 components)
    land in one split atomically; singletons hash individually."""
    from letarette_spark.functions.dedup import jaccard_pairs
    from letarette_spark.functions.sampling import split_by_cluster

    d = _docs(spark, sf_dir)
    pairs = jaccard_pairs(d, n=3, threshold=0.05)
    return split_by_cluster(d, pairs, test_fraction=0.1, seed=42).orderBy(
        "doc_id"
    )


def q_sample_temperature(spark, sf_dir):
    """Temperature-mixed sample (alpha=0.5): per-language quotas
    proportional to sqrt(count), the multilingual data-mixing rule;
    exact quotas, smallest-unit-hash members."""
    from letarette_spark.functions.sampling import temperature_sample

    return temperature_sample(
        _docs(spark, sf_dir), "lang", 150, alpha=0.5, seed=42
    ).select("lang", "doc_id").orderBy("lang", "doc_id")


def q_decontam_report(spark, sf_dir):
    """Benchmark decontamination (functions/decontam.py): per-doc count of
    8-gram shingles shared with a 'benchmark' slice (doc_id % 20 == 0) —
    broadcast benchmark shingles, zero corpus-wide shuffle to find hits."""
    from letarette_spark.functions.decontam import decontamination_report

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 20 == 0)
    train = d.filter(F.col("doc_id") % 20 != 0)
    return decontamination_report(train, bench, n=8).orderBy("doc_id")


def q_decontam_pairs(spark, sf_dir):
    """(training doc, benchmark doc) pairs sharing >= 1 distinct 8-gram,
    with the shared-shingle count."""
    from letarette_spark.functions.decontam import contaminated_pairs

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 20 == 0)
    train = d.filter(F.col("doc_id") % 20 != 0)
    return (
        contaminated_pairs(train, bench, n=8)
        .select("doc_id", "bench_id", "n_shared")
        .orderBy("doc_id", "bench_id")
    )


def q_training_shards(spark, sf_dir):
    """Deterministic global shuffle manifest (functions/sampling.py
    shard_positions): every doc's (shard, within-shard position) for an
    8-shard training write — integer-md5 shard assignment + digest-order
    positions, bit-identical at any partitioning or cluster size. The
    write itself (write_training_shards) pays ONE hash shuffle."""
    from letarette_spark.functions.sampling import shard_positions

    return shard_positions(_docs(spark, sf_dir), 8, seed=7).orderBy(
        "shard", "pos"
    )


# Batch-retrieval gate queries (query/batch.py): analyzed under the simple
# mode (no stemming/stopwords/synonyms) these become exactly the qterms
# VALUES literal in the oracle twin — keep the two in lockstep.
BATCH_QUERIES = ["key", "value", "key value", "key -value"]


def q_batch_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-queries-in-one-job batch retrieval (query/batch.py): term-pruned
    narrow postings scan ⋈ broadcast query terms → in-plan phrase df →
    BM25 doc aggregate → per-query top-k window. Hash-verified against a
    DuckDB twin that mirrors the same relational plan over the raw
    documents table (simple analyzer: tokenization is SQL-expressible)."""
    from letarette_spark.query.batch import search_batch
    from letarette_spark.query.executor import Searcher

    idx = _engine_index_simple(spark, sf_dir)
    s = Searcher(idx, stopwords=frozenset(), synonyms={})
    out = search_batch(s, BATCH_QUERIES, limit=5)
    return (
        out.select(
            "query_id", "rank", "rowid", F.round("score", 6).alias("score")
        )
        .orderBy("query_id", "rank")
    )


def q_term_stats(spark, sf_dir):
    from letarette_spark.functions.simple_text import term_stats

    return (
        term_stats(_docs(spark, sf_dir))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(50)
        .select("term", "df", "cnt")
    )


def q_stopword_candidates(spark, sf_dir):
    from letarette_spark.functions.simple_text import stopword_candidates

    return stopword_candidates(_docs(spark, sf_dir), cutoff=0.01, n=15)


def q_doc_token_counts(spark, sf_dir):
    from letarette_spark.functions.simple_text import doc_lengths

    return doc_lengths(_docs(spark, sf_dir))


def q_bm25_topk(spark, sf_dir):
    from letarette_spark.functions.simple_text import bm25_scores

    return (
        bm25_scores(_docs(spark, sf_dir), QUERY_TERMS)
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_match_and(spark, sf_dir):
    from letarette_spark.functions.simple_text import match_all_terms

    return match_all_terms(_docs(spark, sf_dir), QUERY_TERMS)


def q_match_not(spark, sf_dir):
    from letarette_spark.functions.simple_text import match_not

    return match_not(_docs(spark, sf_dir), "key", "value")


def q_match_prefix(spark, sf_dir):
    from letarette_spark.functions.simple_text import match_prefix

    return match_prefix(_docs(spark, sf_dir), "par")


def q_match_phrase(spark, sf_dir):
    from letarette_spark.functions.simple_text import match_phrase

    return match_phrase(_docs(spark, sf_dir), QUERY_TERMS)


def q_match_or(spark, sf_dir):
    from letarette_spark.functions.simple_text import match_any

    return match_any(_docs(spark, sf_dir), QUERY_TERMS)


def q_shard_assign(spark, sf_dir):
    from letarette_spark.functions.sharding import shard_expr

    return (
        _docs(spark, sf_dir)
        .withColumn("id_str", F.col("doc_id").cast("string"))
        .select(
            "doc_id", shard_expr("id_str", 8).cast("long").alias("shard")
        )
    )


def q_knn_batch(spark, sf_dir):
    from letarette_spark.functions.similarity import cosine_topk_per_query

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_per_query(emb, queries, k=3).select(
        "query_id",
        "vec_id",
        F.round("cos", 6).alias("cos"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_dedup_exact(spark, sf_dir):
    from letarette_spark.functions.dedup import exact_duplicate_groups

    return exact_duplicate_groups(_docs(spark, sf_dir))


def q_jaccard_pairs(spark, sf_dir):
    from letarette_spark.functions.dedup import jaccard_pairs

    return jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.05).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


def q_minhash_signatures(spark, sf_dir):
    from letarette_spark.functions.dedup import minhash_signatures

    return minhash_signatures(_docs(spark, sf_dir), k=8)


def q_minhash_lsh_pairs(spark, sf_dir):
    from letarette_spark.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), bands=4, rows_per_band=2, n=3, threshold=0.05
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_clusters(spark, sf_dir):
    from letarette_spark.functions.dedup import duplicate_clusters, jaccard_pairs

    pairs = jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.05)
    return duplicate_clusters(pairs).select("component", "size", "members")


def q_near_dedup_kept(spark, sf_dir):
    from letarette_spark.functions.dedup import near_dedup

    return near_dedup(
        _docs(spark, sf_dir), bands=4, rows_per_band=2, n=3, threshold=0.05
    ).select("doc_id")


def q_embedding_dups(spark, sf_dir):
    from letarette_spark.functions.dedup import embedding_duplicate_pairs

    return embedding_duplicate_pairs(_emb(spark, sf_dir), threshold=0.3).select(
        "a", "b", F.round("cos", 6).alias("cos")
    )


def q_lsh_embedding_dups(spark, sf_dir):
    from letarette_spark.functions.dedup import lsh_embedding_duplicate_pairs

    return lsh_embedding_duplicate_pairs(
        _emb(spark, sf_dir), threshold=0.3, bands=2, planes_per_band=4,
        dim=_EMB_DIM, seed=42,
    ).select("a", "b", F.round("cos", 6).alias("cos"))


def q_bpe_token_count(spark, sf_dir):
    from letarette_spark.functions.textstats import bpe_ish_token_count_expr

    return _docs(spark, sf_dir).select(
        "doc_id", bpe_ish_token_count_expr("text").alias("bpe_tokens")
    )


def q_bpe_word_counts(spark, sf_dir):
    """BPE training stage 1: the corpus word-frequency table (one scan +
    one partial-agg shuffle) every later merge round works from."""
    from letarette_spark.functions.bpe import word_counts

    return (
        word_counts(_docs(spark, sf_dir))
        .orderBy(F.desc("cnt"), "word")
        .limit(50)
    )


def q_bpe_top_pairs(spark, sf_dir):
    """BPE training round 0: character-pair frequencies weighted by word
    count — the candidate list the first merge is chosen from."""
    from letarette_spark.functions.bpe import top_pairs

    return top_pairs(_docs(spark, sf_dir), k=30)


def q_bpe_merges(spark, sf_dir):
    """Learned BPE merge table (24 merges, symbol-disjoint batches of 4 —
    6 vocab-table rounds). The iterative merge loop is not SQL-expressible
    (the driver records the rows-only check); the schedule is pinned
    exactly against an independent pure-Python implementation and the
    classic batch=1 algorithm in tests/test_bpe.py."""
    from letarette_spark.functions.bpe import bpe_train, merges_df

    merges = bpe_train(_docs(spark, sf_dir), n_merges=24, batch=4)
    return merges_df(spark, merges).orderBy("rank")


def q_bpe_encoded(spark, sf_dir):
    """Corpus re-tokenized with the learned merges (Arrow-batched encode,
    one scan, zero shuffles). Rows-only gate; token-exact parity with the
    pure-JVM fold-chain encoder is pinned in tests/test_bpe.py."""
    from letarette_spark.functions.bpe import bpe_encode, bpe_train

    docs = _docs(spark, sf_dir)
    merges = bpe_train(docs, n_merges=24, batch=4)
    return (
        bpe_encode(docs, merges)
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    )


def q_knn_cosine(spark, sf_dir):
    from letarette_spark.functions.similarity import cosine_topk

    return cosine_topk(_emb(spark, sf_dir), query_id=0, k=5).select(
        "vec_id", F.round("cos", 6).alias("cos")
    )


def q_ann_ivf(spark, sf_dir):
    """IVF ANN with a real (nprobe < n_cells) probe: deterministic
    lowest-id centroid seeding + argmax-cosine assignment, so the whole
    algebra (centroids -> cells -> probe-2-of-8 -> cosine top-k) has an
    exact ANSI-SQL twin. The kmeans-refined variant (n_iter>0) is
    pytest-covered against a numpy Lloyd reference (tests/test_ivf.py)."""
    from letarette_spark.functions.similarity import ivf_topk

    return ivf_topk(
        _emb(spark, sf_dir), query_id=0, k=5, n_cells=8, nprobe=2, n_iter=0
    ).select("vec_id", F.round("cos", 6).alias("cos"))


def q_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-k (functions/pq.py): m=8 subspaces x
    k=16 codes over the 64-dim embeddings (4 bytes/vector), seed
    codebooks (n_iter=0 — exactly SQL-expressible; Lloyd variants are
    numpy-pinned in tests/test_pq.py), asymmetric-distance top-10."""
    from letarette_spark.functions.pq import pq_adc_topk, pq_codebooks

    e = _emb(spark, sf_dir)
    books = pq_codebooks(e, m=8, k=16, n_iter=0)
    return pq_adc_topk(e, query_id=0, codebooks=books, k=10).select(
        "vec_id", F.round("adist", 6).alias("adist")
    )


def q_ivf_pq_topk(spark, sf_dir):
    """Full IVF-PQ ANN (functions/pq.py ivf_pq_topk): cosine-probe 2 of
    8 IVF cells, ADC-rank only those cells' PQ codes; both trainings at
    the SQL-expressible n_iter=0 seed configuration."""
    from letarette_spark.functions.pq import ivf_pq_topk, pq_codebooks
    from letarette_spark.functions.similarity import ivf_centroids

    e = _emb(spark, sf_dir)
    cents = ivf_centroids(e, n_cells=8, n_iter=0)
    books = pq_codebooks(e, m=8, k=16, n_iter=0)
    return ivf_pq_topk(
        e, query_id=0, centroids=cents, codebooks=books, k=10, nprobe=2
    ).select("vec_id", F.round("adist", 6).alias("adist"))


def q_ivf_pq_rerank(spark, sf_dir):
    """Three-stage ANN (functions/pq.py ivf_pq_rerank_topk): IVF probe ->
    ADC shortlist (20) -> exact-cosine re-rank top-10."""
    from letarette_spark.functions.pq import ivf_pq_rerank_topk, pq_codebooks
    from letarette_spark.functions.similarity import ivf_centroids

    e = _emb(spark, sf_dir)
    cents = ivf_centroids(e, n_cells=8, n_iter=0)
    books = pq_codebooks(e, m=8, k=16, n_iter=0)
    return ivf_pq_rerank_topk(
        e, query_id=0, centroids=cents, codebooks=books,
        k=10, shortlist=20, nprobe=2,
    ).select("vec_id", F.round("cos", 6).alias("cos"))


def q_text_quality(spark, sf_dir):
    from letarette_spark.functions.textstats import quality_scores

    return quality_scores(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    from letarette_spark.functions.textstats import lang_id

    return lang_id(_docs(spark, sf_dir))


def q_quality_gates(spark, sf_dir):
    from letarette_spark.functions.textstats import gopher_quality_flags

    return gopher_quality_flags(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    from letarette_spark.functions.dedup import simhash64

    return simhash64(_docs(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    from letarette_spark.functions.textstats import fingerprint64

    return fingerprint64(_docs(spark, sf_dir))


def q_lsh_cosine(spark, sf_dir):
    from letarette_spark.functions.similarity import lsh_cosine_topk

    return lsh_cosine_topk(_emb(spark, sf_dir), query_id=0, k=5, n_planes=4).select(
        "vec_id", F.round("cos", 6).alias("cos")
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def q_event_hourly(spark, sf_dir):
    """Tumbling 1-hour windowed counts/sums per event type — the batch
    equivalent of the streaming windowed-agg operator (SURVEY.md §2.8)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.col("event_type"),
            F.date_trunc("hour", F.col("ts")).cast("string").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def q_sessionize(spark, sf_dir):
    """Sessionization: a >30-min gap starts a new session (lag + cumsum
    window — the applyInPandasWithState-free formulation)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ; route through TIMESTAMP (session tz = UTC)
    # for epoch math — matches DuckDB's epoch_us() on naive timestamps.
    # MICROSECOND precision, not floored seconds: session_window compares
    # at full event-time precision, and all three session formulations
    # (this one, q_session_spans, streaming sessionize) must agree even
    # when timestamps gain sub-second parts
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    new_s = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    return (
        ev.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(
            F.sum("new_s").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def q_session_spans(spark, sf_dir):
    """Per-session spans via the native session_window operator (the
    streaming sessionizer's exact batch twin — streaming/pipeline.py);
    the DuckDB oracle derives the same sessions with the lag+cumsum
    formulation (split only when the gap strictly exceeds 30 min —
    session_window's inclusive-boundary merge rule), proving the two
    session algebras agree row-for-row."""
    from letarette_spark.streaming.pipeline import sessionize

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return sessionize(ev, gap_minutes=30).select(
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "user_id",
        "n_events",
        "total_value",
    )


def q_top_users_per_type(spark, sf_dir):
    """Top-3 users by total value per event type (rank window)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    agg = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("total_value"), F.asc("user_id")
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("event_type", "user_id", "total_value", F.col("rank").cast("long").alias("rank"))
    )


def q_video_frame_features(spark, sf_dir):
    """Multimodal end-to-end: synthesize a deterministic media corpus
    (every third video a genuine MJPEG container — real JPEG frames with
    stsz/stsc/stco addressing), extract each sampled frame's bytes from
    the container and decode them to pixels with the repo's own JPEG
    decoder (mp4.py + jpeg.py; no external codec). Binary decode is not
    SQL-expressible, so this entry has no DuckDB twin — the driver
    records the rows-only check; pixel correctness is pinned by
    tests/test_mp4_samples.py (decoded output vs encoded source)."""
    from letarette_spark.functions.multimodal import (
        synthesize_media, video_frame_features,
    )

    media = synthesize_media(spark, 30)
    return (
        video_frame_features(media, every_ms=100)
        .withColumn("mean_luma", F.round("mean_luma", 6))
        .orderBy("media_id", "frame_idx")
    )


def _synth_html_expr() -> "F.Column":
    """Deterministic HTML wrapper around each documents row — the same
    construction the DuckDB twin builds with || so the html gates
    exercise extraction (script/style/comment stripping, quoted-'>'
    attributes, entities, absolute/relative hrefs) on identical input
    synthesized from the corpus itself (no external data)."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit(
            "</title><style>p{color:red}</style>"
            '<script type="text/javascript">'
            'if (a<b && c>d) { alert("x&y"); }</script></head>'
            "<body><!-- comment <p>hidden</p> --><h1>Doc "
        ),
        did,
        F.lit(' &amp; friends</h1><p class="lead" title="a>b">'),
        F.substring(F.col("text"), 1, 120),
        F.lit("</p><ul><li>lang: "),
        F.col("lang"),
        F.lit("</li><li>source: "),
        F.col("source"),
        F.lit('</li></ul><a href="https://www.Example.com/d/'),
        did,
        F.lit("?ref=1\">self</a><a href='http://Mirror"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(
            ".org/x#frag'>m</a><a href=\"/relative/path\">rel</a>"
            "<p>5 &lt; 6 &amp;&amp; 7 &gt; 3, &quot;quoted&quot;, "
            "it&#39;s&nbsp;here caf&#233; &#x2019;q&#x2019; "
            "&#1114112; &amp;#65;</p></body></html>"
        ),
    )


def q_html_text(spark, sf_dir):
    """HTML -> main-text extraction (functions/html.py html_to_text):
    pure-JVM regexp chain — script/style/comments out, block tags to
    newlines, entities decoded, whitespace normalized. md5 of the
    extracted text so the driver compares exact content."""
    from letarette_spark.functions.html import html_to_text

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(html_to_text(_synth_html_expr())).alias("text_md5"),
    ).orderBy("doc_id")


def q_html_links(spark, sf_dir):
    """Link harvest (functions/html.py doc_links): one row per href in
    document order with its normalized host ('' for relative links)."""
    from letarette_spark.functions.html import doc_links

    df = _docs(spark, sf_dir).select(
        "doc_id", _synth_html_expr().alias("html")
    )
    return doc_links(df).orderBy("doc_id", "pos")


def q_html_anchors(spark, sf_dir):
    """Anchor-element harvest (functions/html.py doc_anchors): one row
    per <a href=...>text</a> with the anchor's plain text and host."""
    from letarette_spark.functions.html import doc_anchors

    df = _docs(spark, sf_dir).select(
        "doc_id", _synth_html_expr().alias("html")
    )
    return doc_anchors(df).orderBy("doc_id", "pos")


def q_html_anchor_agg(spark, sf_dir):
    """Per-link-target anchor-text rollup (anchor_text_agg) — incoming
    link text aggregated per href; one partial-agg shuffle."""
    from letarette_spark.functions.html import anchor_text_agg

    df = _docs(spark, sf_dir).select(
        "doc_id", _synth_html_expr().alias("html")
    )
    return anchor_text_agg(df).orderBy("href")


def q_tfidf_keywords(spark, sf_dir):
    """Per-document TF-IDF keywords (functions/keywords.py): top-5
    distinctive terms by tf * ln(N/df), ties to term ascending."""
    from letarette_spark.functions.keywords import tfidf_keywords

    return tfidf_keywords(_docs(spark, sf_dir), k=5).orderBy(
        "doc_id", "rank"
    )


def q_pmi_collocations(spark, sf_dir):
    """Adjacent-token PMI collocations (functions/keywords.py): top-30
    pairs by pointwise mutual information, min bigram count 5."""
    from letarette_spark.functions.keywords import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir), k=30, min_count=5)


def q_html_host_counts(spark, sf_dir):
    """Per-host link rollup (functions/html.py host_doc_counts) — the
    aggregate URL filtering/sampling reads; one partial-agg shuffle."""
    from letarette_spark.functions.html import host_doc_counts

    df = _docs(spark, sf_dir).select(
        "doc_id", _synth_html_expr().alias("html")
    )
    return host_doc_counts(df).orderBy("host")


def q_semdedup_pairs(spark, sf_dir):
    """SemDeDup semantic-duplicate pairs (functions/semdedup.py, Abbas et
    al. 2023): IVF-cell clustering + within-cell cosine — the join key is
    the cell, never a cross join."""
    from letarette_spark.functions.semdedup import semdedup_pairs

    return semdedup_pairs(_emb(spark, sf_dir), n_cells=8, threshold=0.3).select(
        "a", "b", "cell", F.round("cos", 6).alias("cos")
    ).orderBy("a", "b")


def q_semdedup_kept(spark, sf_dir):
    """SemDeDup survivors under the paper keep rule (keep the pair member
    LESS similar to its cluster centroid, ties to the lower id)."""
    from letarette_spark.functions.semdedup import semdedup_kept

    return semdedup_kept(_emb(spark, sf_dir), n_cells=8, threshold=0.3).select(
        "vec_id"
    ).orderBy("vec_id")


def _dsir_frames(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return docs, docs.filter(F.col("lang") == "en")


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (functions/dsir.py, Xie et al. 2023):
    hashed unigram+bigram buckets (256, md5), add-1-smoothed target
    (lang='en') vs raw distributions, one broadcast log-ratio join."""
    from letarette_spark.functions.dsir import dsir_log_weights

    raw, target = _dsir_frames(spark, sf_dir)
    return dsir_log_weights(raw, target, n_buckets=256).select(
        "doc_id", F.round("log_w", 6).alias("log_w")
    ).orderBy("doc_id")


def q_dsir_sample(spark, sf_dir):
    """DSIR Gumbel top-k resampling: the 50 docs with the largest
    log_w - ln(-ln u) keys, u an md5-derived deterministic uniform."""
    from letarette_spark.functions.dsir import dsir_sample

    raw, target = _dsir_frames(spark, sf_dir)
    return dsir_sample(raw, target, k=50, n_buckets=256, seed=42).select(
        "doc_id",
        F.round("log_w", 6).alias("log_w"),
        F.round("gumbel", 6).alias("gumbel"),
    )


def q_hard_negatives(spark, sf_dir):
    """Denoised hard-negative mining (functions/similarity.py,
    RocketQA-style margin rule): per query, top-5 most-similar examples
    strictly below 0.95 * nearest-neighbor cosine."""
    from letarette_spark.functions.similarity import hard_negatives

    return hard_negatives(
        _emb(spark, sf_dir), query_ids=[0, 1, 2, 3, 4], k=5, margin=0.95
    ).select(
        "query_id", "neg_id", F.round("cos", 6).alias("cos"), "rank"
    ).orderBy("query_id", "rank")


def _synth_url_expr() -> "F.Column":
    """Deterministic messy-URL synthesis from the documents row — mixed
    scheme/host case, trailing-dot host, default ports, duplicate
    slashes, tracker params in varying order, fragments, surrounding
    whitespace — so the url gates exercise every canonicalization rule on
    input derived from the corpus itself (the DuckDB twin builds the
    identical string with ||)."""
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https"))
    host = (
        F.when(did % 3 == 0, F.lit("WWW.Example.COM."))
        .when(did % 3 == 1, F.lit("www.example.com"))
        .otherwise(F.lit("www.EXAMPLE.com"))
    )
    port = F.when(did % 2 == 0, F.lit(":80")).otherwise(
        F.when(did % 4 == 1, F.lit(":443")).otherwise(F.lit(""))
    )
    path = F.concat(
        F.when(did % 5 == 0, F.lit("//d//")).otherwise(F.lit("/d/")),
        (did % 50).cast("string"),
    )
    query = (
        F.when(did % 3 == 0, F.lit("?b=2&utm_source=feed&a=1&gclid=g1"))
        .when(did % 3 == 1, F.lit("?a=1&utm_campaign=x&b=2"))
        .otherwise(F.lit("?b=2&a=1&ref=abc"))
    )
    frag = F.when(did % 4 == 0, F.concat(F.lit("#sec-"), F.col("lang"))).otherwise(
        F.lit("")
    )
    return F.concat(
        F.lit(" "), scheme, F.lit("://"), host, port, path, query, frag, F.lit(" ")
    )


def q_url_canonical(spark, sf_dir):
    """URL canonicalization (functions/urls.py): scheme/host lowercase,
    trailing-dot + default-port + fragment stripped, slashes collapsed,
    tracker params dropped, remaining params sorted."""
    from letarette_spark.functions.urls import canonicalize

    return canonicalize(
        _docs(spark, sf_dir).select("doc_id", _synth_url_expr().alias("url"))
    ).orderBy("doc_id")


def q_url_dup_groups(spark, sf_dir):
    """URL-level dup groups: distinct surface spellings per canonical
    URL + the deterministic survivor (min doc_id)."""
    from letarette_spark.functions.urls import url_dup_groups

    return url_dup_groups(
        _docs(spark, sf_dir).select("doc_id", _synth_url_expr().alias("url"))
    ).orderBy("canon")


def q_bloom_dedup_kept(spark, sf_dir):
    """Bloom-filter incremental dedup (functions/bloom.py): the rows of a
    'new crawl batch' (doc_id % 3 == 0) whose text never appears in the
    'seen corpus' (doc_id % 2 == 0). The bloom prefilter is a physical
    optimization — the result is EXACTLY new-anti-join-seen by text, so
    the DuckDB twin is a plain anti-join."""
    from letarette_spark.functions.bloom import incremental_dedup

    docs = _docs(spark, sf_dir)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    return incremental_dedup(new, seen, "text").select("doc_id").orderBy(
        "doc_id"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "engine_bm25": q_engine_bm25,
        "engine_bm25_simple": q_engine_bm25_simple,
        "engine_wildcard_simple": q_engine_wildcard_simple,
        "term_stats": q_term_stats,
        "stopword_candidates": q_stopword_candidates,
        "doc_token_counts": q_doc_token_counts,
        "bm25_topk": q_bm25_topk,
        "batch_bm25": q_batch_bm25,
        "lm_perplexity": q_lm_perplexity,
        "pack_sequences": q_pack_sequences,
        "repeated_spans": q_repeated_spans,
        "span_dedup_clean": q_span_dedup_clean,
        "pipeline_audit": q_pipeline_audit,
        "repetition_scores": q_repetition_scores,
        "pq_topk": q_pq_topk,
        "ivf_pq_topk": q_ivf_pq_topk,
        "ivf_pq_rerank": q_ivf_pq_rerank,
        "chunk_documents": q_chunk_documents,
        "boilerplate_lines": q_boilerplate_lines,
        "boilerplate_clean": q_boilerplate_clean,
        "pii_redact": q_pii_redact,
        "pii_counts": q_pii_counts,
        "sample_fraction": q_sample_fraction,
        "sample_quota": q_sample_quota,
        "sample_temperature": q_sample_temperature,
        "cluster_split": q_cluster_split,
        "decontam_report": q_decontam_report,
        "decontam_pairs": q_decontam_pairs,
        "training_shards": q_training_shards,
        "match_and": q_match_and,
        "match_not": q_match_not,
        "match_prefix": q_match_prefix,
        "match_phrase": q_match_phrase,
        "match_or": q_match_or,
        "shard_assign": q_shard_assign,
        "knn_batch": q_knn_batch,
        "dedup_exact": q_dedup_exact,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "near_dedup_kept": q_near_dedup_kept,
        "embedding_dups": q_embedding_dups,
        "lsh_embedding_dups": q_lsh_embedding_dups,
        "bpe_token_count": q_bpe_token_count,
        "bpe_word_counts": q_bpe_word_counts,
        "bpe_top_pairs": q_bpe_top_pairs,
        "bpe_merges": q_bpe_merges,
        "bpe_encoded": q_bpe_encoded,
        "knn_cosine": q_knn_cosine,
        "ann_ivf": q_ann_ivf,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "quality_gates": q_quality_gates,
        "simhash": q_simhash,
        "fingerprint": q_fingerprint,
        "lsh_cosine": q_lsh_cosine,
        "event_hourly": q_event_hourly,
        "sessionize": q_sessionize,
        "session_spans": q_session_spans,
        "top_users_per_type": q_top_users_per_type,
        "video_frame_features": q_video_frame_features,
        "html_text": q_html_text,
        "html_links": q_html_links,
        "html_host_counts": q_html_host_counts,
        "html_anchors": q_html_anchors,
        "html_anchor_agg": q_html_anchor_agg,
        "tfidf_keywords": q_tfidf_keywords,
        "pmi_collocations": q_pmi_collocations,
        "semdedup_pairs": q_semdedup_pairs,
        "semdedup_kept": q_semdedup_kept,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "hard_negatives": q_hard_negatives,
        "url_canonical": q_url_canonical,
        "url_dup_groups": q_url_dup_groups,
        "bloom_dedup_kept": q_bloom_dedup_kept,
    }


def _plane_literal(plane: list[float]) -> str:
    """DuckDB double-array literal for one hyperplane. repr() emits the
    shortest round-trip decimal, which both engines parse to the identical
    float64 — the plane constants in the Spark plan and the SQL match
    bit-for-bit."""
    return "[" + ", ".join(repr(float(c)) for c in plane) + "]"


def _lsh_bucket_sql(planes: list[list[float]], vec: str = "v") -> str:
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec}, {_plane_literal(p)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


# shared IVF-PQ oracle body (routing + encode + LUT + per-vector ADC
# sums), finished differently by the ivf_pq_topk / ivf_pq_rerank twins
_IVFPQ_BODY = """
            WITH icents AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                       embedding::DOUBLE[] AS cv
                FROM (SELECT vec_id, embedding FROM embeddings
                      WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 8)
            ),
            vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            assign AS (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                    c.cell) AS rn
                FROM vecs e CROSS JOIN icents c
            ),
            cellof AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
            q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
            probe AS (
                SELECT c.cell FROM icents c CROSS JOIN q
                ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cell
                LIMIT 2
            ),
            seeds AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
                       embedding::DOUBLE[] AS v
                FROM (SELECT vec_id, embedding FROM embeddings
                      WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)
            ),
            subs AS (SELECT unnest(range(8)) AS s),
            cb AS (SELECT subs.s, seeds.code,
                          seeds.v[subs.s*8+1 : subs.s*8+8] AS c
                   FROM seeds CROSS JOIN subs),
            pairs AS (SELECT vecs.vec_id, cb.s, cb.code, cb.c,
                             vecs.v[cb.s*8+1 : cb.s*8+8] AS sub
                      FROM vecs CROSS JOIN cb),
            enc AS (SELECT vec_id, s, code FROM (
                SELECT vec_id, s, code,
                       row_number() OVER (PARTITION BY vec_id, s
                         ORDER BY list_dot_product(sub, sub)
                                  - 2*list_dot_product(sub, c)
                                  + list_dot_product(c, c) ASC,
                                  code ASC) AS rn
                FROM pairs) WHERE rn = 1),
            lut AS (SELECT cb.s, cb.code,
                           list_dot_product(qs.sub, qs.sub)
                           - 2*list_dot_product(qs.sub, cb.c)
                           + list_dot_product(cb.c, cb.c) AS d2
                    FROM cb JOIN (
                      SELECT subs.s, q.qv[subs.s*8+1 : subs.s*8+8] AS sub
                      FROM subs CROSS JOIN q
                    ) qs ON qs.s = cb.s),
            sc AS (SELECT enc.vec_id, sum(lut.d2) AS adist
                   FROM enc JOIN lut ON lut.s = enc.s AND lut.code = enc.code
                   GROUP BY enc.vec_id)"""


# SemDeDup twin: centroids = the 8 lowest-id vectors (ivf_centroids
# n_iter=0 seeding), cell = argmax cosine (ties low cell), ccos = cosine
# to own centroid — the same assignment CTE shape the ann_ivf gate pins.
_SEMDEDUP_ASSIGN = """
    WITH cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
               embedding::DOUBLE[] AS cv
        FROM (SELECT vec_id, embedding FROM embeddings
              WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 8)
    ),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          WHERE embedding IS NOT NULL),
    scored AS (
        SELECT v.vec_id, c.cell, list_cosine_similarity(v.v, c.cv) AS ccos,
               row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY list_cosine_similarity(v.v, c.cv) DESC,
                            c.cell ASC) AS rn
        FROM v CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cell, ccos FROM scored WHERE rn = 1)
"""

# DSIR twin: hashed unigram+bigram buckets (256, md5), add-1-smoothed
# target (lang='en') vs raw bucket distributions, per-doc
# sum(cnt * log-ratio); zero-feature docs get log_w 0.
_DSIR_WEIGHTS = f"""
    WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
    uni AS (SELECT doc_id, unnest(toks) AS gram FROM t),
    ex AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t),
    bi AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram FROM ex),
    grams AS (SELECT doc_id, gram FROM uni
              UNION ALL SELECT doc_id, gram FROM bi),
    bk AS (SELECT doc_id,
                  ('0x' || substr(md5(gram), 1, 8))::BIGINT % 256 AS bucket
           FROM grams),
    per_doc AS (SELECT doc_id, bucket, count(*)::DOUBLE AS cnt
                FROM bk GROUP BY doc_id, bucket),
    tgt_doc AS (SELECT p.* FROM per_doc p JOIN documents d USING (doc_id)
                WHERE d.lang = 'en'),
    buckets AS (SELECT unnest(range(256)) AS bucket),
    rawt AS (SELECT sum(cnt) AS t FROM per_doc),
    tgtt AS (SELECT sum(cnt) AS t FROM tgt_doc),
    p_raw AS (SELECT b.bucket,
                     (coalesce(s.c, 0) + 1.0) / (rawt.t + 256.0) AS p
              FROM buckets b
              LEFT JOIN (SELECT bucket, sum(cnt) AS c FROM per_doc
                         GROUP BY bucket) s USING (bucket)
              CROSS JOIN rawt),
    p_tgt AS (SELECT b.bucket,
                     (coalesce(s.c, 0) + 1.0) / (tgtt.t + 256.0) AS p
              FROM buckets b
              LEFT JOIN (SELECT bucket, sum(cnt) AS c FROM tgt_doc
                         GROUP BY bucket) s USING (bucket)
              CROSS JOIN tgtt),
    ratio AS (SELECT p_tgt.bucket, ln(p_tgt.p) - ln(p_raw.p) AS log_ratio
              FROM p_tgt JOIN p_raw USING (bucket)),
    w AS (SELECT d.doc_id, coalesce(s.log_w, 0.0) AS log_w
          FROM documents d
          LEFT JOIN (SELECT doc_id, sum(cnt * log_ratio) AS log_w
                     FROM per_doc JOIN ratio USING (bucket)
                     GROUP BY doc_id) s USING (doc_id))
"""

# url gates: synthesize the messy URL exactly as _synth_url_expr, then
# the canonicalization chain of functions/urls.py canonical_url.
_URL_SYNTH = """
    ' ' || (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
    || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM.'
             WHEN doc_id % 3 = 1 THEN 'www.example.com'
             ELSE 'www.EXAMPLE.com' END)
    || (CASE WHEN doc_id % 2 = 0 THEN ':80'
             WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN '//d//' ELSE '/d/' END)
    || (doc_id % 50)::VARCHAR
    || (CASE WHEN doc_id % 3 = 0 THEN '?b=2&utm_source=feed&a=1&gclid=g1'
             WHEN doc_id % 3 = 1 THEN '?a=1&utm_campaign=x&b=2'
             ELSE '?b=2&a=1&ref=abc' END)
    || (CASE WHEN doc_id % 4 = 0 THEN '#sec-' || lang ELSE '' END)
    || ' '
"""

_URL_CANON = f"""
    WITH raw AS (SELECT doc_id, {_URL_SYNTH} AS url FROM documents),
    s1 AS (SELECT doc_id, url,
                  regexp_replace(trim(url), '#.*$', '') AS nofrag
           FROM raw),
    s2 AS (SELECT *,
                  lower(regexp_extract(nofrag,
                      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                  regexp_extract(nofrag,
                      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS authority,
                  regexp_extract(nofrag,
                      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1) AS raw_path,
                  regexp_extract(nofrag, '\\?(.*)$', 1) AS query
           FROM s1),
    s3 AS (SELECT *,
                  regexp_replace(lower(regexp_extract(authority,
                      '^([^:]*)', 1)), '[.]$', '') AS host,
                  regexp_extract(authority, ':([0-9]+)$', 1) AS port
           FROM s2),
    s4 AS (SELECT *,
                  CASE WHEN (scheme = 'http' AND port = '80')
                         OR (scheme = 'https' AND port = '443')
                         OR port = '' THEN ''
                       ELSE ':' || port END AS port_part,
                  regexp_replace(CASE WHEN raw_path = '' THEN '/'
                                      ELSE raw_path END,
                                 '/{{2,}}', '/', 'g') AS path,
                  list_sort(list_filter(string_split(query, '&'),
                      p -> p <> '' AND NOT regexp_matches(p,
                          '^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)=')))
                      AS params
           FROM s3),
    s5 AS (SELECT doc_id, url,
                  CASE WHEN scheme = '' THEN trim(url)
                       WHEN regexp_extract(authority, '([^@]*)$', 1)
                            LIKE '[%' THEN trim(url)
                       ELSE scheme || '://' || host || port_part || path ||
                            CASE WHEN len(params) > 0
                                 THEN '?' || array_to_string(params, '&')
                                 ELSE '' END
                  END AS canon
           FROM s4)
"""


def oracle_sql() -> dict[str, str]:
    from letarette_spark.functions.redact import PII_PATTERNS
    from letarette_spark.functions.similarity import _hyperplanes
    from letarette_spark.functions.textstats import LANG_PROFILES

    from letarette_spark.functions.textstats import LANG_TRIGRAM_TIERS

    # chained redaction expression + per-kind count columns, generated
    # from the SAME ordered pattern table the Spark operator uses
    _PII_REDACT_EXPR = "t"
    for _k, (_pat, _repl) in PII_PATTERNS.items():
        _PII_REDACT_EXPR = (
            f"regexp_replace({_PII_REDACT_EXPR}, '{_pat}', '{_repl}', 'g')"
        )
    _PII_COUNT_COLS = ", ".join(
        f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{k}"
        for k, (pat, _r) in PII_PATTERNS.items()
    )

    # html gates: the SAME deterministic HTML construction as
    # _synth_html_expr (|| mirrors F.concat), extraction SQL generated
    # from the pattern constants in functions/html.py — one source of
    # truth for both engines
    from letarette_spark.functions.html import (
        RE_HREF,
        _sql_pat,
        html_to_text_sql,
        url_host_sql,
    )

    _HTML = """
        '<html><head><title>Doc ' || doc_id || '</title><style>p{color:red}</style>'
        || '<script type="text/javascript">if (a<b && c>d) { alert("x&y"); }</script></head>'
        || '<body><!-- comment <p>hidden</p> --><h1>Doc ' || doc_id || ' &amp; friends</h1>'
        || '<p class="lead" title="a>b">' || substr(text, 1, 120) || '</p>'
        || '<ul><li>lang: ' || lang || '</li><li>source: ' || source || '</li></ul>'
        || '<a href="https://www.Example.com/d/' || doc_id || '?ref=1">self</a>'
        || '<a href=''http://Mirror' || (doc_id % 7) || '.org/x#frag''>m</a>'
        || '<a href="/relative/path">rel</a>'
        || '<p>5 &lt; 6 &amp;&amp; 7 &gt; 3, &quot;quoted&quot;, it&#39;s&nbsp;here caf&#233; &#x2019;q&#x2019; &#1114112; &amp;#65;</p></body></html>'
    """
    from letarette_spark.functions.html import RE_ANCHOR

    _HREF_PAT = _sql_pat(RE_HREF)
    _ANCH_PAT = _sql_pat(RE_ANCHOR)
    # anchor elements: href (group 2/3 by quote style) + inner HTML
    # (group 4) run through the SAME generated text-extraction chain.
    # The aligned lists are unnested to ROWS before the text chain runs
    # — the chain itself contains list_transform lambdas (numeric
    # character references), and DuckDB lambdas cannot close over an
    # outer lambda's variable, so it must not be nested inside one.
    _HTML_ANCHORS_CTE = f"""
        WITH h AS (SELECT doc_id, ({_HTML}) AS html FROM documents),
        a AS (SELECT doc_id,
                     regexp_extract_all(html, {_ANCH_PAT}, 2) AS dq,
                     regexp_extract_all(html, {_ANCH_PAT}, 3) AS sq,
                     regexp_extract_all(html, {_ANCH_PAT}, 4) AS inr
              FROM h),
        z0 AS (SELECT doc_id,
                      unnest(range(1, len(dq)+1)) AS ord,
                      unnest(dq) AS dqv,
                      unnest(sq) AS sqv,
                      unnest(inr) AS inrv
               FROM a),
        zf AS (SELECT doc_id, ord,
                      CASE WHEN dqv <> '' THEN dqv ELSE sqv END AS href,
                      {html_to_text_sql('inrv')} AS anchor
               FROM z0),
        f AS (SELECT doc_id, href, anchor,
                     (row_number() OVER (
                         PARTITION BY doc_id ORDER BY ord) - 1) AS pos
              FROM zf WHERE href <> '')
    """
    # document-order picked hrefs: the alternation captures the
    # double-quoted body in group 2 and the single-quoted body in group
    # 3; per-match pick = CASE over the two aligned extract_all lists
    _HTML_LINKS_CTE = f"""
        WITH h AS (SELECT doc_id, ({_HTML}) AS html FROM documents),
        l AS (SELECT doc_id,
                     regexp_extract_all(html, {_HREF_PAT}, 2) AS dq,
                     regexp_extract_all(html, {_HREF_PAT}, 3) AS sq
              FROM h),
        c AS (SELECT doc_id,
                     list_filter(list_transform(range(1, len(dq)+1),
                         i -> CASE WHEN dq[i] <> '' THEN dq[i]
                              ELSE sq[i] END),
                         x -> x <> '') AS fl
              FROM l)
    """

    terms_in = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    phrase = " ".join(QUERY_TERMS)
    sw = {k: ", ".join(f"'{w}'" for w in v) for k, v in LANG_PROFILES.items()}
    # weighted trigram tiers injected from the SAME tables the Spark
    # operator uses (single source of truth — the twin stays in
    # lockstep). Weighting = multiplicity: a trigram in k tiers of a
    # language contributes k rows, so a hash JOIN counts it k times per
    # occurrence — identical to the old sum-over-tiers list_filter form
    # but O(|tris|) instead of O(|tris| x 15k profile scans), which kept
    # the twin from finishing at sf0.1.
    langs = sorted(LANG_TRIGRAM_TIERS)  # ties resolve to the first in order
    lang_prof_rows = ", ".join(
        f"('{lg}', '{t}')"
        for lg in langs
        for tier in LANG_TRIGRAM_TIERS[lg]
        for t in tier
    )
    lang_hit_cols = ",\n                     ".join(
        f"coalesce(max(CASE WHEN hits.lg = '{lg}' THEN hits.c END), 0)"
        f"::BIGINT AS h_{lg}"
        for lg in langs
    )
    gmax = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    lang_case = "\n                        ".join(
        f"WHEN h_{lg} = {gmax} THEN '{lg}'" for lg in langs
    )
    lsh_planes = _hyperplanes(_EMB_DIM, 4, seed=42)      # q_lsh_cosine twin
    band_planes = [_hyperplanes(_EMB_DIM, 4, seed=42 + b) for b in range(2)]

    # repetition-scores twin: per-n CTEs generated from the same n list
    # the Spark operator defaults to; argmax tie-break mirrored exactly
    # (count desc, char length desc, n-gram text desc)
    _REP_NS = (2, 3, 4)
    _rep_ctes, _rep_joins, _rep_cols = [], [], []
    for _n in _REP_NS:
        _join = " || ' ' || ".join(f"toks[i+{j+1}]" for j in range(_n))
        _rep_ctes.append(f"""
            ng{_n} AS (SELECT doc_id,
                list_transform(range(greatest(len(toks) - {_n - 1}, 0)),
                               i -> {_join}) AS ng FROM t),
            dup{_n} AS (SELECT doc_id,
                CASE WHEN len(ng) > 0
                     THEN round(1.0 - len(list_distinct(ng))::DOUBLE / len(ng), 6)
                     ELSE 0.0 END AS dup_{_n}gram_frac FROM ng{_n}),
            agg{_n} AS (SELECT doc_id, g, count(*) AS c,
                               length(replace(g, ' ', '')) AS gl
                        FROM (SELECT doc_id, unnest(ng) AS g FROM ng{_n})
                        GROUP BY doc_id, g),
            top{_n} AS (SELECT doc_id, c * gl AS topchars FROM (
                SELECT doc_id, c, gl,
                       row_number() OVER (PARTITION BY doc_id
                         ORDER BY c DESC, gl DESC, g DESC) AS rn
                FROM agg{_n}) WHERE rn = 1)""")
        _rep_joins.append(
            f"LEFT JOIN dup{_n} USING (doc_id) LEFT JOIN top{_n} USING (doc_id)"
        )
    _rep_cols = ", ".join(
        [f"coalesce(dup{_n}.dup_{_n}gram_frac, 0.0) AS dup_{_n}gram_frac"
         for _n in _REP_NS]
        + [f"""round(CASE WHEN b.chars > 0
                 THEN coalesce(top{_n}.topchars, 0)::DOUBLE / b.chars
                 ELSE 0.0 END, 6) AS top_{_n}gram_char_frac"""
           for _n in _REP_NS]
    )
    _REP_SQL = f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            b AS (SELECT doc_id,
                    coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                      AS chars
                  FROM t),{",".join(_rep_ctes)}
            SELECT b.doc_id, {_rep_cols}
            FROM b {" ".join(_rep_joins)}
            ORDER BY b.doc_id
        """
    return {
        "term_stats": f"""
            WITH tok AS ({_TOK})
            SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cnt
            FROM tok GROUP BY term ORDER BY cnt DESC, term LIMIT 50
        """,
        "stopword_candidates": f"""
            WITH tok AS ({_TOK}),
            ts AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cnt
                   FROM tok GROUP BY term),
            tot AS (SELECT sum(cnt)::DOUBLE AS total FROM ts)
            SELECT term, df, cnt FROM ts, tot WHERE cnt > total * 0.01
            ORDER BY cnt DESC, term LIMIT 15
        """,
        "doc_token_counts": f"""
            SELECT doc_id, len({_ARR})::BIGINT AS dl FROM documents
        """,
        "bpe_word_counts": f"""
            WITH tok AS ({_TOK})
            SELECT term AS word, count(*)::BIGINT AS cnt
            FROM tok GROUP BY term ORDER BY cnt DESC, word LIMIT 50
        """,
        # adjacent character pairs of every word, weighted by word count —
        # substr(word, i, 2) for i in 1..len-1 is exactly the zip of the
        # Spark side's split-to-chars slices
        "bpe_top_pairs": f"""
            WITH wc AS (
                SELECT term AS word, count(*)::BIGINT AS cnt
                FROM ({_TOK}) GROUP BY term),
            pr AS (
                SELECT unnest(list_transform(range(1, length(word)),
                              i -> substr(word, i, 2))) AS p, cnt
                FROM wc)
            SELECT substr(p, 1, 1) AS a, substr(p, 2, 1) AS b,
                   sum(cnt)::BIGINT AS cnt
            FROM pr GROUP BY 1, 2
            ORDER BY cnt DESC, a, b LIMIT 30
        """,
        # bigram-LM perplexity twin: identical add-k=0.5 model (bigram
        # counts, context counts from the bigram table, vocab = distinct
        # tokens), entropy = -avg log2 P, both engines round to 6
        "lm_perplexity": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            ex AS (SELECT doc_id, toks,
                          unnest(range(1, len(toks))) AS i FROM t),
            ev AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM ex),
            m2 AS (SELECT w1, w2, count(*)::DOUBLE AS c2
                   FROM ev GROUP BY w1, w2),
            m1 AS (SELECT w1, sum(c2) AS c1 FROM m2 GROUP BY w1),
            v AS (SELECT count(DISTINCT term)::DOUBLE AS vv FROM ({_TOK})),
            sc AS (
              SELECT ev.doc_id, count(*)::BIGINT AS nb,
                     -avg(log2((c2 + 0.5) / (c1 + 0.5 * vv))) AS ent
              FROM ev JOIN m2 USING (w1, w2) JOIN m1 USING (w1), v
              GROUP BY ev.doc_id
            )
            SELECT d.doc_id,
                   coalesce(nb, 0)::BIGINT AS n_bigrams,
                   round(ent, 6) AS entropy,
                   round(pow(2.0, ent), 6) AS perplexity
            FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
            ORDER BY d.doc_id
        """,
        # packing twin: same md5-prefix key (32-bit, = unit_hash * 2^32),
        # group = key % 4, exclusive prefix sum of token counts in
        # (key, doc_id) order, sequence = global position // 96; parallel
        # unnests zip (position with token)
        "pack_sequences": f"""
            WITH t AS (
              SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS k,
                     doc_id, {_ARR} AS toks
              FROM documents
            ),
            g AS (SELECT (k % 4)::INTEGER AS grp, k, doc_id, toks,
                         len(toks) AS dl
                  FROM t WHERE len(toks) > 0),
            s AS (SELECT *,
                         sum(dl) OVER (
                           PARTITION BY grp ORDER BY k, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                         ) - dl AS strt
                  FROM g),
            ev AS (SELECT grp, doc_id,
                          strt + unnest(range(len(toks))) AS pos,
                          unnest(toks) AS tok
                   FROM s)
            SELECT grp AS "group",
                   (pos // 96)::BIGINT AS seq_idx,
                   count(*)::BIGINT AS n_tokens,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS seq_md5
            FROM ev GROUP BY grp, pos // 96
            ORDER BY "group", seq_idx
        """,
        "repetition_scores": _REP_SQL,
        # PQ twin: seed codebooks = subvectors of the 16 lowest-id
        # vectors; encode = per-(vec, subspace) argmin L2 with
        # d2 = s.s - 2 s.c + c.c over list_dot_product (bit-identical to
        # the Spark fold), ties lowest code; ADC = per-query LUT joined
        # on (subspace, code), summed per vector
        "pq_topk": """
            WITH seeds AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
                       embedding::DOUBLE[] AS v
                FROM (SELECT vec_id, embedding FROM embeddings
                      WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT 16)
            ),
            subs AS (SELECT unnest(range(8)) AS s),
            cb AS (SELECT subs.s, seeds.code,
                          seeds.v[subs.s*8+1 : subs.s*8+8] AS c
                   FROM seeds CROSS JOIN subs),
            vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            pairs AS (SELECT vecs.vec_id, cb.s, cb.code, cb.c,
                             vecs.v[cb.s*8+1 : cb.s*8+8] AS sub
                      FROM vecs CROSS JOIN cb),
            enc AS (SELECT vec_id, s, code FROM (
                SELECT vec_id, s, code,
                       row_number() OVER (PARTITION BY vec_id, s
                         ORDER BY list_dot_product(sub, sub)
                                  - 2*list_dot_product(sub, c)
                                  + list_dot_product(c, c) ASC,
                                  code ASC) AS rn
                FROM pairs) WHERE rn = 1),
            q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
            lut AS (SELECT cb.s, cb.code,
                           list_dot_product(qs.sub, qs.sub)
                           - 2*list_dot_product(qs.sub, cb.c)
                           + list_dot_product(cb.c, cb.c) AS d2
                    FROM cb JOIN (
                      SELECT subs.s, q.qv[subs.s*8+1 : subs.s*8+8] AS sub
                      FROM subs CROSS JOIN q
                    ) qs ON qs.s = cb.s),
            sc AS (SELECT enc.vec_id, sum(lut.d2) AS adist
                   FROM enc JOIN lut ON lut.s = enc.s AND lut.code = enc.code
                   GROUP BY enc.vec_id)
            SELECT vec_id, round(adist, 6) AS adist
            FROM sc WHERE vec_id <> 0
            ORDER BY adist ASC, vec_id ASC
            LIMIT 10
        """,
        # IVF-PQ twin: the ann_ivf routing CTEs (cosine cells, probe 2/8)
        # composed with the pq_topk CTEs (seed codebooks, argmin encode,
        # ADC LUT), candidates restricted to the probed cells
        "ivf_pq_topk": _IVFPQ_BODY + """
            SELECT sc.vec_id, round(sc.adist, 6) AS adist
            FROM sc JOIN cellof USING (vec_id)
            WHERE cellof.cell IN (SELECT cell FROM probe) AND sc.vec_id <> 0
            ORDER BY sc.adist ASC, sc.vec_id ASC
            LIMIT 10
        """,
        # three-stage twin: same body, ADC shortlist of 20, exact-cosine
        # re-rank to 10
        "ivf_pq_rerank": _IVFPQ_BODY + """,
            shortlist AS (
                SELECT sc.vec_id FROM sc JOIN cellof USING (vec_id)
                WHERE cellof.cell IN (SELECT cell FROM probe)
                  AND sc.vec_id <> 0
                ORDER BY sc.adist ASC, sc.vec_id ASC LIMIT 20
            )
            SELECT v.vec_id,
                   round(list_cosine_similarity(v.v, q.qv), 6) AS cos
            FROM vecs v JOIN shortlist USING (vec_id) CROSS JOIN q
            ORDER BY list_cosine_similarity(v.v, q.qv) DESC, v.vec_id
            LIMIT 10
        """,
        
        # pipeline-audit twin: the staged composition of the quality_gates,
        # dedup_exact (keep min id), near_dedup_kept (LSH + verify +
        # components at 0.05, over exact survivors), and decontam (8-gram
        # vs the bench slice, over near survivors) twins; reason = first
        # dropping stage
        "pipeline_audit": f"""
            WITH RECURSIVE
            tr AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 <> 0),
            qbase AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'),
                                 w -> length(w) > 0) AS words,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                l -> trim(l)),
                                 l -> length(l) > 0) AS lines
              FROM tr
            ),
            qm AS (
              SELECT doc_id,
                     len(words)::DOUBLE AS n_words,
                     CASE WHEN len(words) > 0
                          THEN list_sum(list_transform(words, w -> length(w)))::DOUBLE / len(words)
                          ELSE 0.0 END AS mean_wl,
                     CASE WHEN len(words) > 0
                          THEN len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE / len(words)
                          ELSE 0.0 END AS frac_alpha,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE / len(lines)
                          ELSE 0.0 END AS bullet_frac,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE / len(lines)
                          ELSE 0.0 END AS ellipsis_frac,
                     CASE WHEN len(lines) > 0
                          THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                          ELSE 0.0 END AS dup_frac
              FROM qbase
            ),
            q AS (
              SELECT doc_id,
                     (n_words >= 50 AND n_words <= 100000
                      AND mean_wl >= 3.0 AND mean_wl <= 10.0
                      AND frac_alpha >= 0.8 AND bullet_frac <= 0.9
                      AND ellipsis_frac <= 0.3 AND dup_frac <= 0.3) AS passes
              FROM qm
            ),
            s1 AS (SELECT tr.doc_id, tr.text FROM tr
                   JOIN q USING (doc_id) WHERE passes),
            ex AS (SELECT doc_id,
                          min(doc_id) OVER (PARTITION BY md5(text)) AS keep
                   FROM s1),
            s2 AS (SELECT s1.doc_id, s1.text FROM s1
                   JOIN ex USING (doc_id) WHERE s1.doc_id = ex.keep),
            arr AS (SELECT doc_id, {_ARR} AS a FROM s2),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr),
            sig AS (SELECT doc_id,
                    {", ".join(f"min(md5(shingle || '#' || '{i}')) AS s{i}" for i in range(8))}
                    FROM sh GROUP BY doc_id),
            banded AS (SELECT doc_id, unnest([
                    md5('0' || '|' || s0 || '|' || s1),
                    md5('1' || '|' || s2 || '|' || s3),
                    md5('2' || '|' || s4 || '|' || s5),
                    md5('3' || '|' || s6 || '|' || s7)]) AS bucket FROM sig),
            cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                     FROM banded x JOIN banded y
                     ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
                      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            pairs AS (SELECT cand.a, cand.b FROM cand
                      JOIN inter ON inter.a = cand.a AND inter.b = cand.b
                      JOIN sizes sa ON sa.doc_id = cand.a
                      JOIN sizes sb ON sb.doc_id = cand.b
                      WHERE i / (sa.sz + sb.sz - i) >= 0.05),
            edges AS (SELECT a AS u, b AS v FROM pairs
                      UNION ALL SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, n) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.n
            ),
            comp AS (SELECT id, min(n) AS component FROM reach GROUP BY id),
            s3 AS (SELECT doc_id, text FROM s2 WHERE doc_id NOT IN
                   (SELECT id FROM comp WHERE id <> component)),
            t3 AS (SELECT doc_id, {_ARR} AS toks FROM s3),
            sh3 AS (SELECT doc_id,
                      list_distinct(list_transform(
                        range(greatest(len(toks) - 7, 0)),
                        i -> array_to_string(toks[i+1:i+8], ' '))) AS shs
                    FROM t3),
            bt AS (SELECT {_ARR} AS toks FROM documents WHERE doc_id % 20 = 0),
            bsh AS (SELECT DISTINCT unnest(list_transform(
                      range(greatest(len(toks) - 7, 0)),
                      i -> array_to_string(toks[i+1:i+8], ' '))) AS shingle
                    FROM bt),
            dirty AS (SELECT DISTINCT doc_id
                      FROM (SELECT doc_id, unnest(shs) AS shingle FROM sh3) d
                      JOIN bsh USING (shingle)),
            s4 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN
                   (SELECT doc_id FROM dirty))
            SELECT tr.doc_id,
                   (CASE
                      WHEN tr.doc_id NOT IN (SELECT doc_id FROM s1) THEN 'quality'
                      WHEN tr.doc_id NOT IN (SELECT doc_id FROM s2) THEN 'exact_dup'
                      WHEN tr.doc_id NOT IN (SELECT doc_id FROM s3) THEN 'near_dup'
                      WHEN tr.doc_id NOT IN (SELECT doc_id FROM s4) THEN 'contaminated'
                    END) IS NULL AS kept,
                   CASE
                     WHEN tr.doc_id NOT IN (SELECT doc_id FROM s1) THEN 'quality'
                     WHEN tr.doc_id NOT IN (SELECT doc_id FROM s2) THEN 'exact_dup'
                     WHEN tr.doc_id NOT IN (SELECT doc_id FROM s3) THEN 'near_dup'
                     WHEN tr.doc_id NOT IN (SELECT doc_id FROM s4) THEN 'contaminated'
                   END AS reason
            FROM tr ORDER BY tr.doc_id
        """,
        # span-dedup twins: L=12-token windows, md5 window hash, repeat =
        # corpus count >= 2 (self-repeats included); strip removes tokens
        # covered by any repeated window (1-based inclusive list slices)
        "repeated_spans": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            w AS (SELECT doc_id, toks,
                         unnest(range(len(toks) - 11)) AS s
                  FROM t WHERE len(toks) >= 12),
            wh AS (SELECT doc_id, s,
                          md5(array_to_string(toks[s+1 : s+12], ' ')) AS whash
                   FROM w)
            SELECT whash, count(*)::BIGINT AS n_occurrences,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM wh GROUP BY whash HAVING count(*) >= 2
            ORDER BY whash
        """,
        "span_dedup_clean": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            w AS (SELECT doc_id, toks,
                         unnest(range(len(toks) - 11)) AS s
                  FROM t WHERE len(toks) >= 12),
            wh AS (SELECT doc_id, s,
                          md5(array_to_string(toks[s+1 : s+12], ' ')) AS whash
                   FROM w),
            rep AS (SELECT whash FROM wh GROUP BY whash HAVING count(*) >= 2),
            fl AS (SELECT doc_id, s FROM wh JOIN rep USING (whash)),
            tok AS (SELECT doc_id, unnest(range(len(toks))) AS i,
                           unnest(toks) AS tok
                    FROM t),
            cov AS (SELECT DISTINCT tok.doc_id, i
                    FROM tok JOIN fl ON fl.doc_id = tok.doc_id
                                    AND fl.s <= i AND i <= fl.s + 11),
            kept AS (SELECT tok.doc_id, i, tok
                     FROM tok LEFT JOIN cov USING (doc_id, i)
                     WHERE cov.i IS NULL)
            SELECT t.doc_id,
                   md5(coalesce(k.clean, '')) AS clean_md5,
                   len(t.toks)::BIGINT AS n_tokens,
                   (len(t.toks) - coalesce(k.n_kept, 0))::BIGINT AS n_removed
            FROM t LEFT JOIN (
              SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean,
                     count(*) AS n_kept
              FROM kept GROUP BY doc_id
            ) k ON k.doc_id = t.doc_id
            ORDER BY t.doc_id
        """,
        # chunking twin: starts advance by step=32 (max 40, overlap 8);
        # last admissible start = len - overlap - 1 (no fully-contained
        # tails); Spark's inclusive sequence == range(0, last+1, step)
        "chunk_documents": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            c AS (
              SELECT doc_id, toks,
                     unnest(range(0, greatest(len(toks) - 9, 0) + 1, 32)) AS s
              FROM t WHERE len(toks) > 0
            )
            SELECT doc_id,
                   (s // 32)::INTEGER AS chunk_idx,
                   md5(array_to_string(toks[s+1:s+40], ' ')) AS chunk_md5,
                   len(toks[s+1:s+40])::BIGINT AS n_tokens
            FROM c ORDER BY doc_id, chunk_idx
        """,
        # boilerplate twins: lockstep unnest(list)+unnest(range) preserves
        # line positions; blank lines never counted/removed; df counts
        # DISTINCT docs (in-doc repeats count once).
        "boilerplate_lines": """
            WITH aug AS (
              SELECT doc_id,
                     text || chr(10) || 'uniq ' || doc_id::VARCHAR ||
                     CASE WHEN doc_id % 2 = 0
                          THEN chr(10) || 'Copyright Example Corp'
                               || chr(10) || 'All rights reserved'
                          ELSE '' END AS t
              FROM documents
            ),
            l AS (
              SELECT doc_id, unnest(string_split(t, chr(10))) AS line
              FROM aug
            )
            SELECT line, count(DISTINCT doc_id)::BIGINT AS df
            FROM l WHERE trim(line) <> ''
            GROUP BY line HAVING count(DISTINCT doc_id) >= 2
            ORDER BY line
        """,
        "boilerplate_clean": """
            WITH aug AS (
              SELECT doc_id,
                     text || chr(10) || 'uniq ' || doc_id::VARCHAR ||
                     CASE WHEN doc_id % 2 = 0
                          THEN chr(10) || 'Copyright Example Corp'
                               || chr(10) || 'All rights reserved'
                          ELSE '' END AS t
              FROM documents
            ),
            l AS (
              SELECT doc_id,
                     unnest(string_split(t, chr(10))) AS line,
                     unnest(range(len(string_split(t, chr(10))))) AS pos
              FROM aug
            ),
            bp AS (
              SELECT line FROM (
                SELECT line, count(DISTINCT doc_id) AS df
                FROM l WHERE trim(line) <> '' GROUP BY line
              ) WHERE df >= 2
            ),
            kept AS (
              SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean
              FROM l ANTI JOIN bp USING (line)
              GROUP BY doc_id
            )
            SELECT a.doc_id, md5(coalesce(k.clean, '')) AS clean_md5
            FROM aug a LEFT JOIN kept k USING (doc_id)
            ORDER BY a.doc_id
        """,
        # PII twins: same augmented text algebra, same patterns in the
        # same order (imported from redact.PII_PATTERNS — single source of
        # truth), DuckDB regexp_replace with the 'g' flag to match Spark's
        # replace-all default.
        "pii_redact": f"""
            WITH aug AS (
              SELECT doc_id,
                     text || ' reach user' || doc_id::VARCHAR
                          || '@mail.example.com or https://example.com/p/'
                          || doc_id::VARCHAR
                          || ' ip 10.0.' || (doc_id % 256)::VARCHAR
                          || '.7 call 555-123-4567' AS t
              FROM documents
            )
            SELECT doc_id, md5({_PII_REDACT_EXPR}) AS redacted_md5
            FROM aug ORDER BY doc_id
        """,
        "pii_counts": f"""
            WITH aug AS (
              SELECT doc_id,
                     text || ' reach user' || doc_id::VARCHAR
                          || '@mail.example.com or https://example.com/p/'
                          || doc_id::VARCHAR
                          || ' ip 10.0.' || (doc_id % 256)::VARCHAR
                          || '.7 call 555-123-4567' AS t
              FROM documents
            )
            SELECT doc_id, {_PII_COUNT_COLS}
            FROM aug ORDER BY doc_id
        """,
        # sampling twins: unit hash = first 8 md5 hex chars of
        # '<seed>:<key>' over 2^32 (same identity as sampling.unit_hash)
        "sample_fraction": """
            SELECT doc_id FROM documents
            WHERE ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 8))::BIGINT
                  / 4294967296.0 < 0.1
            ORDER BY doc_id
        """,
        "sample_quota": """
            WITH h AS (
              SELECT lang, doc_id,
                     ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 8))::BIGINT
                     / 4294967296.0 AS u
              FROM documents
            )
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id,
                     row_number() OVER (
                       PARTITION BY lang ORDER BY u ASC, doc_id::VARCHAR ASC
                     ) AS rn
              FROM h
            ) WHERE rn <= 20
            ORDER BY lang, doc_id
        """,
        # cluster_split: same jaccard-pair reachability as dedup_clusters,
        # then the unit-hash split keyed on the component id (singletons =
        # their own component via the left-join coalesce)
        "cluster_split": f"""
            WITH RECURSIVE arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
                      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            pairs AS (SELECT a, b FROM inter
                      JOIN sizes sa ON sa.doc_id = a
                      JOIN sizes sb ON sb.doc_id = b
                      WHERE i / (sa.sz + sb.sz - i) >= 0.05),
            edges AS (SELECT a AS u, b AS v FROM pairs
                      UNION ALL SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, n) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.n
            ),
            comp AS (SELECT id, min(n) AS component FROM reach GROUP BY id)
            SELECT d.doc_id,
                   coalesce(c.component, d.doc_id) AS component,
                   CASE WHEN ('0x' || substr(md5('42:' ||
                               coalesce(c.component, d.doc_id)::VARCHAR), 1, 8))::BIGINT
                             / 4294967296.0 < 0.1
                        THEN 'test' ELSE 'train' END AS split
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
            ORDER BY d.doc_id
        """,
        "sample_temperature": """
            WITH c AS (
              SELECT lang, count(*)::DOUBLE AS n FROM documents GROUP BY lang
            ),
            w AS (SELECT lang, n, sqrt(n) AS wa FROM c),
            tot AS (SELECT sum(wa) AS tw FROM w),
            q AS (
              SELECT lang,
                     least(floor(150.0 * wa / tw), n)::BIGINT AS quota
              FROM w, tot
            ),
            h AS (
              SELECT lang, doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ('0x' || substr(md5('42:' || doc_id::VARCHAR), 1, 8))::BIGINT
                                / 4294967296.0 ASC,
                                doc_id::VARCHAR ASC
                     ) AS rn
              FROM documents
            )
            SELECT lang, doc_id FROM h JOIN q USING (lang)
            WHERE rn <= quota ORDER BY lang, doc_id
        """,
        # decontamination twins: 8-gram shingles, per-doc DISTINCT on both
        # sides (dedup.shingles semantics); benchmark slice doc_id % 20.
        "decontam_report": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(greatest(len(toks) - 7, 0)),
                       i -> array_to_string(toks[i+1:i+8], ' '))) AS shs
              FROM t
            ),
            bench AS (
              SELECT DISTINCT unnest(shs) AS shingle FROM sh
              WHERE doc_id % 20 = 0
            ),
            train AS (SELECT doc_id, shs FROM sh WHERE doc_id % 20 <> 0),
            m AS (
              SELECT doc_id, count(*)::BIGINT AS n_matched
              FROM (SELECT doc_id, unnest(shs) AS shingle FROM train) d
              JOIN bench USING (shingle)
              GROUP BY doc_id
            )
            SELECT d.doc_id,
                   len(d.shs)::BIGINT AS n_total,
                   coalesce(m.n_matched, 0)::BIGINT AS n_matched,
                   coalesce(m.n_matched, 0) > 0 AS contaminated
            FROM train d LEFT JOIN m USING (doc_id)
            ORDER BY d.doc_id
        """,
        "decontam_pairs": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            sh AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(greatest(len(toks) - 7, 0)),
                       i -> array_to_string(toks[i+1:i+8], ' ')))) AS shingle
              FROM t
            )
            SELECT d.doc_id, b.doc_id AS bench_id, count(*)::BIGINT AS n_shared
            FROM (SELECT * FROM sh WHERE doc_id % 20 <> 0) d
            JOIN (SELECT * FROM sh WHERE doc_id % 20 = 0) b USING (shingle)
            GROUP BY d.doc_id, b.doc_id
            ORDER BY d.doc_id, bench_id
        """,
        # training_shards: shard = first-8-md5-hex-digits int % n (pure
        # integer math, same identity as sampling.assign_shards); pos =
        # row_number within shard ordered by full digest then key
        "training_shards": """
            WITH h AS (
              SELECT doc_id, md5('7:' || doc_id::VARCHAR) AS d
              FROM documents
            )
            SELECT doc_id,
                   ('0x' || substr(d, 1, 8))::BIGINT % 8 AS shard,
                   CAST(row_number() OVER (
                       PARTITION BY ('0x' || substr(d, 1, 8))::BIGINT % 8
                       ORDER BY d ASC, doc_id::VARCHAR ASC
                   ) AS BIGINT) AS pos
            FROM h
            ORDER BY shard, pos
        """,
        # batch_bm25: mirror of search_batch's relational plan. qterms is
        # the simple-mode analysis of BATCH_QUERIES (keep in lockstep);
        # title weight 5.0 / body 1.0, dl = title+body tokens, phrase df
        # over the whole corpus BEFORE excludes, BM25(k1=1.2, b=0.75) with
        # the <=0 -> 1e-6 idf clamp, engine sign (negative-is-better),
        # rank after exclusion, ties on rowid.
        "batch_bm25": f"""
            WITH d AS (
              SELECT doc_id AS rowid,
                     list_filter(regexp_split_to_array(lower(source), '[^a-z0-9]+'),
                                 x -> length(x) >= 2) AS ta,
                     {_ARR} AS ba
              FROM documents
            ),
            qterms(query_id, pidx, excl, term, n_inc) AS (
              VALUES ('0', 0, false, 'key',   1),
                     ('1', 0, false, 'value', 1),
                     ('2', 0, false, 'key',   2),
                     ('2', 1, false, 'value', 2),
                     ('3', 0, false, 'key',   1),
                     ('3', 1, true,  'value', 1)
            ),
            stats AS (
              SELECT count(*)::DOUBLE AS n,
                     sum(len(ta) + len(ba))::DOUBLE / count(*) AS avgdl
              FROM d
            ),
            tf AS (
              SELECT q.query_id, q.pidx, q.excl, q.n_inc, d.rowid,
                     (len(ta) + len(ba))::DOUBLE AS dl,
                     (5.0 * len(list_filter(ta, x -> x = q.term))
                      + 1.0 * len(list_filter(ba, x -> x = q.term))) AS tfw
              FROM d CROSS JOIN qterms q
              WHERE len(list_filter(ta, x -> x = q.term))
                    + len(list_filter(ba, x -> x = q.term)) > 0
            ),
            ph AS (
              SELECT *, count(*) OVER (PARTITION BY query_id, pidx) AS df
              FROM tf
            ),
            docs AS (
              SELECT query_id, rowid, n_inc,
                     sum( (CASE WHEN ln((stats.n - df + 0.5)/(df + 0.5)) <= 0
                                THEN 1e-6
                                ELSE ln((stats.n - df + 0.5)/(df + 0.5)) END)
                          * tfw * 2.2
                          / (tfw + 1.2 * (0.25 + 0.75 * dl / stats.avgdl)) )
                       AS pos_score,
                     count(*) AS nph
              FROM ph CROSS JOIN stats
              WHERE NOT excl
              GROUP BY query_id, rowid, n_inc
            ),
            kept AS (
              SELECT dd.query_id, dd.rowid, -dd.pos_score AS score
              FROM docs dd
              LEFT JOIN (SELECT DISTINCT query_id, rowid FROM ph WHERE excl) e
                ON dd.query_id = e.query_id AND dd.rowid = e.rowid
              WHERE dd.nph = dd.n_inc AND e.rowid IS NULL
            ),
            ranked AS (
              SELECT query_id,
                     row_number() OVER (
                       PARTITION BY query_id ORDER BY score ASC, rowid ASC
                     )::INTEGER AS rank,
                     rowid, round(score, 6) AS score
              FROM kept
            )
            SELECT query_id, rank, rowid, score FROM ranked
            WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "bm25_topk": f"""
            WITH tok AS ({_TOK}),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                             (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents)::DOUBLE AS avgdl),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
                   WHERE term IN ({terms_in}) GROUP BY doc_id, term),
            dfreq AS (SELECT term, count(*)::DOUBLE AS dfreq FROM tf GROUP BY term)
            SELECT doc_id, round(score, 6) AS score FROM (
              SELECT tf.doc_id,
                     sum( (CASE WHEN ln((stats.n - dfreq.dfreq + 0.5)/(dfreq.dfreq + 0.5)) <= 0
                                THEN 1e-6
                                ELSE ln((stats.n - dfreq.dfreq + 0.5)/(dfreq.dfreq + 0.5)) END)
                          * tf.tf * 2.2 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS score,
                     count(*) AS nterms
              FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            ) WHERE nterms = {len(set(QUERY_TERMS))}
            ORDER BY score DESC, doc_id LIMIT 10
        """,
        "match_and": f"""
            WITH tok AS ({_TOK})
            SELECT doc_id FROM (SELECT DISTINCT doc_id, term FROM tok WHERE term IN ({terms_in}))
            GROUP BY doc_id HAVING count(*) = {len(set(QUERY_TERMS))}
        """,
        "match_not": f"""
            WITH tok AS ({_TOK})
            SELECT DISTINCT doc_id FROM tok WHERE term = 'key'
            AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'value')
        """,
        "match_prefix": f"""
            WITH tok AS ({_TOK})
            SELECT DISTINCT doc_id FROM tok WHERE term LIKE 'par%'
        """,
        "match_phrase": f"""
            SELECT doc_id FROM (
              SELECT doc_id, ' ' || array_to_string({_ARR}, ' ') || ' ' AS norm FROM documents
            ) WHERE norm LIKE '% {phrase} %'
        """,
        "match_or": f"""
            WITH tok AS ({_TOK})
            SELECT DISTINCT doc_id FROM tok WHERE term IN ({terms_in})
        """,
        "shard_assign": """
            SELECT doc_id,
                   (list_reduce(
                      list_prepend(2166136261::BIGINT,
                        list_transform(range(length(doc_id::VARCHAR)),
                          i -> ascii(substr(doc_id::VARCHAR, i+1, 1))::BIGINT)),
                      (h, b) -> (xor(h, b) * 16777619) % 4294967296
                   ) % 8)::BIGINT AS shard
            FROM documents
        """,
        "knn_batch": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id IN (0, 1, 2)),
            scored AS (SELECT q.query_id, e.vec_id,
                              list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS c
                       FROM embeddings e CROSS JOIN q),
            r AS (SELECT query_id, vec_id, c,
                         row_number() OVER (
                           PARTITION BY query_id ORDER BY c DESC, vec_id
                         )::BIGINT AS rank
                  FROM scored)
            SELECT query_id, vec_id, round(c, 6) AS cos, rank
            FROM r WHERE rank <= 3
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, count(*)::BIGINT AS n,
                   array_to_string(list_sort(list(doc_id::VARCHAR)), ',') AS members
            FROM documents GROUP BY md5(text) HAVING count(*) > 1
        """,
        "jaccard_pairs": f"""
            WITH arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
                      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id)
            SELECT a, b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE i / (sa.sz + sb.sz - i) >= 0.05
        """,
        "minhash_signatures": f"""
            WITH arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr)
            SELECT doc_id,
                   {", ".join(f"min(md5(shingle || '#' || '{i}')) AS sig_{i}" for i in range(8))}
            FROM sh GROUP BY doc_id
        """,
        "minhash_lsh_pairs": f"""
            WITH arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr),
            sig AS (SELECT doc_id,
                    {", ".join(f"min(md5(shingle || '#' || '{i}')) AS s{i}" for i in range(8))}
                    FROM sh GROUP BY doc_id),
            banded AS (SELECT doc_id, unnest([
                    md5('0' || '|' || s0 || '|' || s1),
                    md5('1' || '|' || s2 || '|' || s3),
                    md5('2' || '|' || s4 || '|' || s5),
                    md5('3' || '|' || s6 || '|' || s7)]) AS bucket FROM sig),
            cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                     FROM banded x JOIN banded y
                     ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
                      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id)
            SELECT cand.a, cand.b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM cand
            JOIN inter ON inter.a = cand.a AND inter.b = cand.b
            JOIN sizes sa ON sa.doc_id = cand.a
            JOIN sizes sb ON sb.doc_id = cand.b
            WHERE i / (sa.sz + sb.sz - i) >= 0.05
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
                      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            pairs AS (SELECT a, b FROM inter
                      JOIN sizes sa ON sa.doc_id = a
                      JOIN sizes sb ON sb.doc_id = b
                      WHERE i / (sa.sz + sb.sz - i) >= 0.05),
            edges AS (SELECT a AS u, b AS v FROM pairs
                      UNION ALL SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, n) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.n
            ),
            comp AS (SELECT id, min(n) AS component FROM reach GROUP BY id),
            -- members capped at the 128 smallest per cluster, exactly like
            -- duplicate_clusters(max_members=128)'s row_number bound
            bounded AS (SELECT id, component,
                        row_number() OVER (PARTITION BY component ORDER BY id) AS rn
                        FROM comp)
            SELECT c.component, c.size, b.members FROM
              (SELECT component, count(*)::BIGINT AS size FROM comp GROUP BY component) c
              JOIN (SELECT component,
                    array_to_string(list_sort(list(id::VARCHAR)), ',') AS members
                    FROM bounded WHERE rn <= 128 GROUP BY component) b
              USING (component)
        """,
        "near_dedup_kept": f"""
            WITH RECURSIVE arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(greatest(len(a) - 2, 0)),
                            i -> a[i+1] || ' ' || a[i+2] || ' ' || a[i+3])) AS shingle
                   FROM arr),
            sig AS (SELECT doc_id,
                    {", ".join(f"min(md5(shingle || '#' || '{i}')) AS s{i}" for i in range(8))}
                    FROM sh GROUP BY doc_id),
            banded AS (SELECT doc_id, unnest([
                    md5('0' || '|' || s0 || '|' || s1),
                    md5('1' || '|' || s2 || '|' || s3),
                    md5('2' || '|' || s4 || '|' || s5),
                    md5('3' || '|' || s6 || '|' || s7)]) AS bucket FROM sig),
            cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                     FROM banded x JOIN banded y
                     ON x.bucket = y.bucket AND x.doc_id < y.doc_id),
            sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM sh GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*)::DOUBLE AS i
                      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                      GROUP BY x.doc_id, y.doc_id),
            pairs AS (SELECT cand.a, cand.b FROM cand
                      JOIN inter ON inter.a = cand.a AND inter.b = cand.b
                      JOIN sizes sa ON sa.doc_id = cand.a
                      JOIN sizes sb ON sb.doc_id = cand.b
                      WHERE i / (sa.sz + sb.sz - i) >= 0.05),
            edges AS (SELECT a AS u, b AS v FROM pairs
                      UNION ALL SELECT b, a FROM pairs),
            nodes AS (SELECT DISTINCT u AS id FROM edges),
            reach(id, n) AS (
                SELECT id, id FROM nodes
                UNION
                SELECT r.id, e.v FROM reach r JOIN edges e ON e.u = r.n
            ),
            comp AS (SELECT id, min(n) AS component FROM reach GROUP BY id)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != component)
        """,
        "embedding_dups": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        """,
        "bpe_token_count": r"""
            SELECT doc_id,
                   len(list_filter(
                       string_split(regexp_replace(text,
                           '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])', '\1 ', 'g'), ' '),
                       x -> trim(x) <> ''))::BIGINT AS bpe_tokens
            FROM documents
        """,
        "knn_cosine": """
            SELECT b.vec_id,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id = 0 AND b.vec_id <> 0
            ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id
            LIMIT 5
        """,
        "ann_ivf": """
            WITH cents AS (
                SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                       embedding::DOUBLE[] AS cv
                FROM (SELECT vec_id, embedding FROM embeddings
                      WHERE embedding IS NOT NULL
                      ORDER BY vec_id LIMIT 8)
            ),
            assign AS (
                SELECT e.vec_id, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               e.embedding::DOUBLE[], c.cv) DESC,
                               c.cell) AS rn
                FROM embeddings e CROSS JOIN cents c
            ),
            cellof AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
            q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0),
            probe AS (
                SELECT c.cell FROM cents c CROSS JOIN q
                ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cell
                LIMIT 2
            )
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
            FROM embeddings e
            JOIN cellof USING (vec_id)
            CROSS JOIN q
            WHERE cellof.cell IN (SELECT cell FROM probe) AND e.vec_id <> 0
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
                     e.vec_id
            LIMIT 5
        """,
        "text_quality": f"""
            SELECT doc_id,
                   len(arr)::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars_measured,
                   round(CASE WHEN len(arr) > 0
                         THEN list_sum(list_transform(arr, t -> length(t)))::DOUBLE / len(arr)
                         ELSE 0.0 END, 6) AS avg_token_len,
                   round(CASE WHEN len(arr) > 0
                         THEN len(list_filter(arr, t -> list_contains([{sw['en']}], t)))::DOUBLE / len(arr)
                         ELSE 0.0 END, 6) AS stopword_ratio,
                   round(CASE WHEN len(arr) > 0
                         THEN len(list_filter(arr, t -> regexp_matches(t, '^[0-9]+$')))::DOUBLE / len(arr)
                         ELSE 0.0 END, 6) AS digit_ratio,
                   round(CASE WHEN length(text) > 0
                         THEN (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE / length(text)
                         ELSE 0.0 END, 6) AS punct_ratio
            FROM (SELECT doc_id, text, {_ARR} AS arr FROM documents)
        """,
        "lang_id": f"""
            WITH tr AS (
              SELECT doc_id,
                     unnest(flatten(list_transform(arr,
                       w -> list_transform(range(length(w)),
                              i -> substr('_' || w || '_', (i + 1)::INT, 3)))))
                       AS t
              FROM (SELECT doc_id, {_ARR} AS arr FROM documents)
            ),
            prof(lg, tri) AS (SELECT * FROM (VALUES {lang_prof_rows})),
            hits AS (
              SELECT tr.doc_id, prof.lg, count(*)::BIGINT AS c
              FROM tr JOIN prof ON tr.t = prof.tri
              GROUP BY tr.doc_id, prof.lg
            ),
            h AS (
              SELECT d.doc_id,
                     {lang_hit_cols}
              FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
              GROUP BY d.doc_id
            )
            SELECT doc_id,
                   CASE WHEN {gmax} = 0 THEN 'und'
                        {lang_case}
                        END AS lang_guess,
                   {gmax} AS trigram_hits
            FROM h
        """,
        "quality_gates": r"""
            WITH base AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
                                 w -> length(w) > 0) AS words,
                     list_filter(list_transform(string_split(text, chr(10)),
                                                l -> trim(l)),
                                 l -> length(l) > 0) AS lines
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     len(words)::DOUBLE AS n_words,
                     CASE WHEN len(words) > 0
                          THEN list_sum(list_transform(words, w -> length(w)))::DOUBLE / len(words)
                          ELSE 0.0 END AS mean_wl,
                     CASE WHEN len(words) > 0
                          THEN len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE / len(words)
                          ELSE 0.0 END AS frac_alpha,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines, l -> starts_with(l, '-') OR starts_with(l, '*')))::DOUBLE / len(lines)
                          ELSE 0.0 END AS bullet_frac,
                     CASE WHEN len(lines) > 0
                          THEN len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE / len(lines)
                          ELSE 0.0 END AS ellipsis_frac,
                     CASE WHEN len(lines) > 0
                          THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                          ELSE 0.0 END AS dup_frac
              FROM base
            )
            SELECT doc_id,
                   n_words::BIGINT AS n_words,
                   round(mean_wl, 6) AS mean_word_len,
                   round(frac_alpha, 6) AS frac_alpha_words,
                   round(bullet_frac, 6) AS bullet_line_frac,
                   round(ellipsis_frac, 6) AS ellipsis_line_frac,
                   round(dup_frac, 6) AS dup_line_frac,
                   (n_words >= 50 AND n_words <= 100000
                    AND mean_wl >= 3.0 AND mean_wl <= 10.0
                    AND frac_alpha >= 0.8 AND bullet_frac <= 0.9
                    AND ellipsis_frac <= 0.3 AND dup_frac <= 0.3) AS passes
            FROM m
        """,
        # lag+cumsum session derivation; split only when the microsecond
        # gap strictly exceeds the 30-min session_window horizon (Spark
        # merges an event exactly at last_ts + gap — inclusive boundary,
        # pinned by tests/test_streaming_pipeline.py's boundary test);
        # session_end = last event + gap, exactly as session_window.end
        "session_spans": """
            WITH m AS (
                SELECT user_id, ts, value, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                    > 1800000000
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT *, sum(new_s) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM m
            )
            SELECT CAST(min(ts) AS VARCHAR) AS session_start,
                   CAST(max(ts) + INTERVAL 30 MINUTE AS VARCHAR)
                     AS session_end,
                   user_id,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS total_value
            FROM s GROUP BY user_id, sid
        """,
        "event_hourly": """
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
                   count(*)::BIGINT AS n,
                   round(sum(value), 6) AS total_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "sessionize": """
            WITH e AS (
              SELECT user_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                  > 1800000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, sum(new_s)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM e GROUP BY user_id
        """,
        "top_users_per_type": """
            WITH agg AS (
              SELECT event_type, user_id, round(sum(value), 6) AS total_value
              FROM events GROUP BY event_type, user_id
            )
            SELECT event_type, user_id, total_value, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY total_value DESC, user_id
              )::BIGINT AS rank
              FROM agg
            ) WHERE rank <= 3
        """,
        "html_text": f"""
            SELECT doc_id,
                   md5({html_to_text_sql(f'({_HTML})')}) AS text_md5
            FROM documents ORDER BY doc_id
        """,
        "html_links": f"""
            {_HTML_LINKS_CTE},
            x AS (SELECT doc_id,
                         unnest(range(1, len(fl)+1)) - 1 AS pos,
                         unnest(fl) AS link
                  FROM c)
            SELECT doc_id, pos::INT AS pos, link,
                   {url_host_sql('link')} AS host
            FROM x ORDER BY doc_id, pos
        """,
        "html_host_counts": f"""
            {_HTML_LINKS_CTE},
            x AS (SELECT doc_id, unnest(fl) AS link FROM c),
            k AS (SELECT doc_id, {url_host_sql('link')} AS host FROM x)
            SELECT host, count(*)::BIGINT AS n_links,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM k WHERE host <> '' GROUP BY host ORDER BY host
        """,
        "html_anchors": f"""
            {_HTML_ANCHORS_CTE}
            SELECT doc_id, pos::INT AS pos, href, anchor,
                   {url_host_sql('href')} AS host
            FROM f ORDER BY doc_id, pos
        """,
        "html_anchor_agg": f"""
            {_HTML_ANCHORS_CTE}
            SELECT href, count(*)::BIGINT AS n_anchors,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   min(CASE WHEN anchor <> '' THEN anchor END)
                     AS sample_anchor
            FROM f GROUP BY href ORDER BY href
        """,
        "tfidf_keywords": f"""
            WITH tok AS ({_TOK}),
            tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
                   FROM tok GROUP BY doc_id, term),
            dfq AS (SELECT term, count(*)::BIGINT AS df
                    FROM tf GROUP BY term),
            nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
            SELECT doc_id, term, tf, score, rank FROM (
              SELECT doc_id, term, tf,
                     round(tf * ln(n::DOUBLE / df::DOUBLE), 6) AS score,
                     row_number() OVER (PARTITION BY doc_id
                         ORDER BY round(tf * ln(n::DOUBLE / df::DOUBLE), 6)
                                  DESC, term)::INT AS rank
              FROM tf JOIN dfq USING(term) CROSS JOIN nd
            ) WHERE rank <= 5 ORDER BY doc_id, rank
        """,
        "pmi_collocations": f"""
            WITH t AS (SELECT doc_id, {_ARR} AS toks FROM documents),
            bi0 AS (SELECT unnest(list_transform(
                        range(1, greatest(len(toks)-1, 0)+1),
                        i -> struct_pack(a := toks[i], b := toks[i+1])))
                        AS p FROM t),
            bi_all AS (SELECT p.a AS a, p.b AS b, count(*)::BIGINT AS n_ab
                       FROM bi0 GROUP BY p.a, p.b),
            bi AS (SELECT * FROM bi_all WHERE n_ab >= 5),
            uni AS (SELECT unnest(toks) AS t2 FROM t),
            uc AS (SELECT t2, count(*)::BIGINT AS c FROM uni GROUP BY t2),
            tt AS (SELECT sum(c)::DOUBLE AS tot_t FROM uc),
            -- p(a,b) normalizes over ALL bigram events, not just the
            -- min_count survivors (matches keywords.pmi_collocations)
            tb AS (SELECT sum(n_ab)::DOUBLE AS tot_b FROM bi_all)
            SELECT a, b, n_ab,
                   round(ln((n_ab / tot_b) /
                            ((ca.c / tot_t) * (cb.c / tot_t))), 6) AS pmi
            FROM bi JOIN uc ca ON ca.t2 = bi.a
                    JOIN uc cb ON cb.t2 = bi.b, tt, tb
            ORDER BY pmi DESC, a, b LIMIT 30
        """,
        "simhash": f"""
            WITH tok AS ({_TOK}),
            h AS (SELECT doc_id,
                         ('0x' || substr(md5(term), 1, 8))::BIGINT AS ha,
                         ('0x' || substr(md5(term), 9, 8))::BIGINT AS hb
                  FROM tok),
            bits AS (SELECT doc_id, i.range AS bit,
                            CASE WHEN (floor((CASE WHEN i.range < 32 THEN ha ELSE hb END)
                                             / power(2, i.range % 32))::BIGINT % 2) = 1
                                 THEN 1 ELSE -1 END AS contrib
                     FROM h CROSS JOIN range(64) i),
            per_bit AS (SELECT doc_id, bit, sum(contrib) AS s
                        FROM bits GROUP BY doc_id, bit),
            sh AS (SELECT doc_id,
                          sum(CASE WHEN s > 0 THEN
                                CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
                                     ELSE (1::BIGINT << bit::INTEGER) END
                              ELSE 0 END) AS simhash
                   FROM per_bit GROUP BY doc_id)
            SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
            FROM documents d LEFT JOIN sh USING (doc_id)
        """,
        "fingerprint": f"""
            WITH arr AS (SELECT doc_id, {_ARR} AS a FROM documents),
            r AS (SELECT doc_id,
              list_reduce(list_prepend(0::BIGINT, list_transform(a, t ->
                 ('0x' || substr(md5(t), 1, 8))::BIGINT % 2147483647)),
                 (acc, v) -> (acc * 31 + v) % 2147483647) AS h1,
              list_reduce(list_prepend(0::BIGINT, list_transform(a, t ->
                 ('0x' || substr(md5(t || '#2'), 1, 8))::BIGINT % 2147483647)),
                 (acc, v) -> (acc * 37 + v) % 2147483647) AS h2
              FROM arr)
            SELECT doc_id, (h1 * 2147483648 + h2)::BIGINT AS fingerprint FROM r
        """,
        "lsh_cosine": f"""
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            b AS (SELECT vec_id, {_lsh_bucket_sql(lsh_planes)} AS bucket FROM v),
            qb AS (SELECT bucket FROM b WHERE vec_id = 0),
            cand AS (SELECT b.vec_id FROM b, qb
                     WHERE b.bucket = qb.bucket AND b.vec_id <> 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS cos
            FROM embeddings e
            JOIN cand USING (vec_id)
            CROSS JOIN (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                        WHERE vec_id = 0) q
            ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
            LIMIT 5
        """,
        "lsh_embedding_dups": f"""
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            b AS (SELECT vec_id, 0 AS band, {_lsh_bucket_sql(band_planes[0])} AS bucket FROM v
                  UNION ALL
                  SELECT vec_id, 1 AS band, {_lsh_bucket_sql(band_planes[1])} AS bucket FROM v),
            cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
                     FROM b x JOIN b y
                     ON x.band = y.band AND x.bucket = y.bucket
                        AND x.vec_id < y.vec_id)
            SELECT cand.a, cand.b,
                   round(list_cosine_similarity(ea.embedding::DOUBLE[],
                                                eb.embedding::DOUBLE[]), 6) AS cos
            FROM cand
            JOIN embeddings ea ON ea.vec_id = cand.a
            JOIN embeddings eb ON eb.vec_id = cand.b
            WHERE list_cosine_similarity(ea.embedding::DOUBLE[],
                                         eb.embedding::DOUBLE[]) >= 0.3
        """,
        # engine_bm25: engine-native (stemmed BM25 + NEAR semantics) — the
        # stemmer is not ANSI-SQL expressible; correctness is covered by
        # the live-FTS5 rank-identity suites under tests/ (including a
        # pre-stemmed FTS5 scoring oracle for the default letarette mode).
        # engine_bm25_simple below IS the full engine query path (postings
        # -> NEAR -> participant tf -> BM25 -> top-k) with a value-exact
        # twin: the simple analyzer removes the stemming step, and DuckDB
        # nested list lambdas reproduce the NEAR interval algebra.
        #
        # NEAR participation for two single-word phrases (executor.py
        # _near_participants with lens = [1, 1], near = 15): instance y of
        # one phrase participates iff the other phrase has an instance z
        # with |z - y| <= near + 1; a column contributes tf only when it
        # holds a full cluster (both participant counts > 0); tf is the
        # 5.0/1.0 column-weighted participant count; dl/avgdl are
        # unweighted totals over BOTH columns; idf ln-clamped at 1e-6.
        "engine_bm25_simple": f"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(source), '[^a-z0-9]+'),
                                 x -> length(x) >= 2) AS ta,
                     {_ARR} AS ba
              FROM documents
            ),
            p AS (
              SELECT doc_id,
                     list_filter(range(len(ta)), i -> ta[i+1] = 'key')   AS t0,
                     list_filter(range(len(ta)), i -> ta[i+1] = 'value') AS t1,
                     list_filter(range(len(ba)), i -> ba[i+1] = 'key')   AS b0,
                     list_filter(range(len(ba)), i -> ba[i+1] = 'value') AS b1,
                     (len(ta) + len(ba))::DOUBLE AS dl
              FROM d
            ),
            stats AS (
              SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl,
                     (SELECT count(*) FROM p WHERE len(t0) + len(b0) > 0)::DOUBLE AS df0,
                     (SELECT count(*) FROM p WHERE len(t1) + len(b1) > 0)::DOUBLE AS df1
              FROM p
            ),
            nearc AS (
              SELECT doc_id, dl,
                len(list_filter(t0, y -> len(list_filter(t1, z -> abs(z - y) <= 16)) > 0)) AS tc0,
                len(list_filter(t1, y -> len(list_filter(t0, z -> abs(z - y) <= 16)) > 0)) AS tc1,
                len(list_filter(b0, y -> len(list_filter(b1, z -> abs(z - y) <= 16)) > 0)) AS bc0,
                len(list_filter(b1, y -> len(list_filter(b0, z -> abs(z - y) <= 16)) > 0)) AS bc1
              FROM p
            ),
            tf AS (
              SELECT doc_id, dl,
                (CASE WHEN tc0 > 0 AND tc1 > 0 THEN 5.0 * tc0 ELSE 0 END)
                  + (CASE WHEN bc0 > 0 AND bc1 > 0 THEN 1.0 * bc0 ELSE 0 END) AS tf0,
                (CASE WHEN tc0 > 0 AND tc1 > 0 THEN 5.0 * tc1 ELSE 0 END)
                  + (CASE WHEN bc0 > 0 AND bc1 > 0 THEN 1.0 * bc1 ELSE 0 END) AS tf1
              FROM nearc
              WHERE (tc0 > 0 AND tc1 > 0) OR (bc0 > 0 AND bc1 > 0)
            )
            SELECT rowid, round(score, 6) AS score FROM (
              SELECT doc_id AS rowid,
                -( (CASE WHEN ln((stats.n - stats.df0 + 0.5)/(stats.df0 + 0.5)) <= 0
                         THEN 1e-6
                         ELSE ln((stats.n - stats.df0 + 0.5)/(stats.df0 + 0.5)) END)
                     * tf0 * 2.2 / (tf0 + 1.2 * (0.25 + 0.75 * dl / stats.avgdl))
                 + (CASE WHEN ln((stats.n - stats.df1 + 0.5)/(stats.df1 + 0.5)) <= 0
                         THEN 1e-6
                         ELSE ln((stats.n - stats.df1 + 0.5)/(stats.df1 + 0.5)) END)
                     * tf1 * 2.2 / (tf1 + 1.2 * (0.25 + 0.75 * dl / stats.avgdl)) ) AS score
              FROM tf CROSS JOIN stats
              ORDER BY score, rowid LIMIT 10
            ) ORDER BY score, rowid
        """,
        # engine_wildcard_simple: the full engine wildcard path (prefix
        # aggregates -> pre-merged per-rowid instance union -> BM25 ->
        # top-k). FTS5 prefix semantics: tf is the total instance count of
        # ALL terms matching the prefix; phrase df is the count of docs
        # containing ANY matching term; stats/idf/saturation identical to
        # the single-phrase BM25 path.
        "engine_wildcard_simple": f"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(source), '[^a-z0-9]+'),
                                 x -> length(x) >= 2) AS ta,
                     {_ARR} AS ba
              FROM documents
            ),
            p AS (
              SELECT doc_id,
                     len(list_filter(ta, x -> starts_with(x, 'val'))) AS tf0,
                     len(list_filter(ba, x -> starts_with(x, 'val'))) AS tf1,
                     (len(ta) + len(ba))::DOUBLE AS dl
              FROM d
            ),
            stats AS (
              SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl,
                     (SELECT count(*) FROM p WHERE tf0 + tf1 > 0)::DOUBLE AS df0
              FROM p
            ),
            m AS (
              SELECT doc_id, dl, 5.0 * tf0 + 1.0 * tf1 AS tfw
              FROM p WHERE tf0 + tf1 > 0
            )
            SELECT rowid, round(score, 6) AS score FROM (
              SELECT doc_id AS rowid,
                -( (CASE WHEN ln((stats.n - stats.df0 + 0.5)/(stats.df0 + 0.5)) <= 0
                         THEN 1e-6
                         ELSE ln((stats.n - stats.df0 + 0.5)/(stats.df0 + 0.5)) END)
                     * tfw * 2.2 / (tfw + 1.2 * (0.25 + 0.75 * dl / stats.avgdl)) ) AS score
              FROM m CROSS JOIN stats
              ORDER BY score, rowid LIMIT 10
            ) ORDER BY score, rowid
        """,
        "semdedup_pairs": f"""
            {_SEMDEDUP_ASSIGN}
            SELECT a.vec_id AS a, b.vec_id AS b, a.cell,
                   round(list_cosine_similarity(va.v, vb.v), 6) AS cos
            FROM assign a
            JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
            JOIN v va ON va.vec_id = a.vec_id
            JOIN v vb ON vb.vec_id = b.vec_id
            WHERE list_cosine_similarity(va.v, vb.v) >= 0.3
            ORDER BY a, b
        """,
        "semdedup_kept": f"""
            {_SEMDEDUP_ASSIGN},
            dup AS (
                SELECT a.vec_id AS xa, a.ccos AS ca,
                       b.vec_id AS xb, b.ccos AS cb
                FROM assign a
                JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
                JOIN v va ON va.vec_id = a.vec_id
                JOIN v vb ON vb.vec_id = b.vec_id
                WHERE list_cosine_similarity(va.v, vb.v) >= 0.3
            ),
            losers AS (
                SELECT DISTINCT xa AS vec_id FROM dup
                WHERE cb < ca OR (cb = ca AND xb < xa)
            )
            SELECT a.vec_id FROM assign a
            WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.vec_id = a.vec_id)
            ORDER BY a.vec_id
        """,
        "dsir_weights": f"""
            {_DSIR_WEIGHTS}
            SELECT doc_id, round(log_w, 6) AS log_w FROM w ORDER BY doc_id
        """,
        "dsir_sample": f"""
            {_DSIR_WEIGHTS},
            g AS (
                SELECT doc_id, log_w,
                       log_w - ln(-ln(
                           (('0x' || substr(md5(doc_id::VARCHAR || '#42'), 1, 8))::BIGINT
                            + 1.0) / 4294967297.0)) AS gumbel
                FROM w
            )
            SELECT doc_id, round(log_w, 6) AS log_w, round(gumbel, 6) AS gumbel
            FROM g ORDER BY gumbel DESC, doc_id LIMIT 50
        """,
        "hard_negatives": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
            ),
            s AS (
                SELECT q.query_id, e.vec_id AS neg_id,
                       list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
                FROM embeddings e CROSS JOIN q
                WHERE e.vec_id <> q.query_id AND e.embedding IS NOT NULL
            ),
            r AS (
                SELECT *,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neg_id) AS rn,
                       max(cos) OVER (PARTITION BY query_id) AS pos_cos
                FROM s
            ),
            n AS (
                SELECT query_id, neg_id, cos,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, neg_id) AS rank
                -- 0.0500…44 is repr(1.0 - 0.95): the exact double the
                -- Spark side folds, so borderline rows cannot diverge
                FROM r WHERE rn > 1
                  AND cos < pos_cos - 0.050000000000000044 * abs(pos_cos)
            )
            SELECT query_id, neg_id, round(cos, 6) AS cos, rank
            FROM n WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "url_canonical": f"""
            {_URL_CANON}
            SELECT doc_id, url, canon FROM s5 ORDER BY doc_id
        """,
        "url_dup_groups": f"""
            {_URL_CANON}
            SELECT canon, count(DISTINCT url) AS n_variants,
                   count(*) AS n_docs, min(doc_id) AS keep_id
            FROM s5 WHERE url IS NOT NULL GROUP BY canon ORDER BY canon
        """,
        "bloom_dedup_kept": """
            SELECT n.doc_id FROM documents n
            WHERE n.doc_id % 3 = 0
              AND NOT EXISTS (
                  SELECT 1 FROM documents s
                  WHERE s.doc_id % 2 = 0 AND s.text = n.text
              )
            ORDER BY n.doc_id
        """,
    }
