"""Deterministic synthetic source-code corpus.

Input table per BASELINE.json input_hint:
``(repo string, path string, commit string, lang string, content string)``
plus ``content_sha256`` (per-row invariant). Document identity follows the
reference's opaque-string DocumentID (protocol.go:29-30):
``doc_id = repo || ':' || path || '@' || commit``; title <- path,
body <- content, space <- lang.

Generation is fully distributed and partition-independent: every row is
derived only from its global index ``i`` (seeded per-row), so the same
(seed, n_docs) yields byte-identical content at any parallelism — the
property that makes the two-cluster-size scaling runs comparable and the
sha256 invariant checkable.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGS = ("go", "py", "md")

# Code-ish vocabulary with controlled term classes (FIXTURES.md §1):
# head identifiers (Zipf head, stopword-derivation tests), body vocabulary,
# rare identifiers (spellfix targets), phrase n-grams (NEAR/phrase tests).
_HEAD = [
    "func", "return", "error", "string", "int", "nil", "if", "for", "var",
    "type", "struct", "range", "package", "import", "const", "interface",
]
_BODY = [
    "parser", "buffer", "token", "index", "query", "search", "document",
    "config", "handler", "client", "server", "worker", "shard", "batch",
    "stream", "cache", "merge", "encode", "decode", "filter", "result",
    "value", "count", "offset", "limit", "phrase", "match", "score",
    "rank", "field", "column", "table", "row", "page", "segment", "block",
    "list", "node", "tree", "hash", "key", "data", "byte", "file", "path",
    "line", "text", "word", "term", "stem", "language", "space", "update",
    "request", "response", "message", "channel", "context", "timeout",
]
_RARE = [
    "quixotic", "zephyr", "bandersnatch", "vorpal", "frabjous", "galumph",
    "chortle", "brillig", "slithy", "mimsy", "borogove", "outgrabe",
]
_NGRAMS = [
    ("error", "handler"),
    ("parse", "buffer"),
    ("func", "main"),
    ("new", "york"),          # the reference's harder.json query, verbatim shape
    ("holding", "pattern"),
]


def _gen_row(i: int, seed: int) -> dict:
    rng = random.Random((seed << 32) ^ i)
    repo = f"org{rng.randrange(20)}/proj{rng.randrange(50)}"
    lang = LANGS[rng.randrange(len(LANGS))]
    path = f"src/pkg{rng.randrange(40)}/mod{rng.randrange(100)}_{i}.{lang}"
    commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()

    n_lines = rng.randrange(5, 40)
    lines = []
    for _ in range(n_lines):
        n_words = rng.randrange(3, 12)
        words = []
        for _ in range(n_words):
            r = rng.random()
            if r < 0.35:
                words.append(_HEAD[rng.randrange(len(_HEAD))])
            elif r < 0.90:
                words.append(_BODY[rng.randrange(len(_BODY))])
            elif r < 0.93:
                words.append(str(rng.randrange(10000)))
            elif r < 0.96:
                a, b = _NGRAMS[rng.randrange(len(_NGRAMS))]
                words.append(a)
                words.append(b)
            else:
                words.append(_RARE[rng.randrange(len(_RARE))])
        lines.append(" ".join(words))
    content = "\n".join(lines)
    return {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
    }


CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), False),
    ]
)


def generate_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus of *n_docs* source files."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([_gen_row(int(i), seed) for i in pdf["id"]])

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def generate_corpus_local(n_docs: int, seed: int = 42) -> list[dict]:
    """Driver-side generation of the same rows (test oracle input)."""
    return [_gen_row(i, seed) for i in range(n_docs)]


def docs_from_corpus(corpus: DataFrame) -> DataFrame:
    """Map the corpus table to the engine's docs shape.

    Reference mapping (pkg/protocol/protocol.go:102-108): title <- path,
    body <- content, space <- lang; rowid is a stable 64-bit hash of the
    opaque doc_id (FTS5 tie-breaks equal scores by rowid, so it must be a
    deterministic function of the document, never monotonically_increasing_id).
    """
    return corpus.select(
        F.concat_ws("", F.col("repo"), F.lit(":"), F.col("path"), F.lit("@"), F.col("commit")).alias("doc_id"),
        F.col("lang").alias("space"),
        F.col("path").alias("title"),
        F.col("content").alias("body"),
        F.lit(True).alias("alive"),
        F.col("content_sha256"),
    ).withColumn("rowid", F.xxhash64("doc_id"))
