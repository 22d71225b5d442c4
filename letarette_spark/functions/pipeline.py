"""One-call training-data preparation — the composed hygiene pipeline a
production corpus actually runs, staged in the conventional order
(quality gates → exact dedup → near dedup → benchmark decontamination;
the Gopher/C4 and CCNet pipelines both stage this way so expensive
pairwise stages only see quality survivors).

Every stage is an already-gated primitive from this package; this module
adds the sequencing and the audit trail: each document comes back with
``kept`` and the FIRST reason that dropped it (stage order = reason
precedence). Nothing here adds a new shuffle beyond the stages' own.

Scale notes: each stage filters before the next, so the near-dedup
(LSH + verify + components) and decontamination joins run on the reduced
survivor set; the audit assembly is three left anti/semi joins keyed by
doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from letarette_spark.functions.dedup import connected_components, minhash_lsh_pairs
from letarette_spark.functions.textstats import gopher_quality_flags

REASONS = ("quality", "exact_dup", "near_dup", "contaminated")


def prepare_training_data(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    bands: int = 4,
    rows_per_band: int = 2,
    n: int = 3,
    threshold: float = 0.2,
    decontam_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    seen: DataFrame | None = None,
) -> DataFrame:
    """(id, kept, reason) for every input document.

    reason ∈ {'url_dup', 'already_seen', 'quality', 'exact_dup',
    'near_dup', 'contaminated'} (NULL when kept); a document gets the
    reason of the FIRST stage that drops it. Exact/near dedup keep each
    group's minimum id. ``benchmark`` None skips decontamination.

    Two optional incremental-ingest stages run FIRST (crawl order:
    metadata before content): ``url_col`` names a URL column to dedup by
    canonical form (functions/urls.py, keep min id), and ``seen`` is the
    already-ingested corpus — this batch drops rows whose ``text_col``
    appears there, via the Bloom prefilter + exact confirm
    (functions/bloom.py: zero-shuffle for the fresh majority).

    Survivor-id frames are persisted for the audit assembly (each is
    consumed 2-3 times: by the next stage and by the reason diff) and
    released after the result is materialized via localCheckpoint — the
    narrow (id, kept, reason) frame, linear in corpus size."""
    ids = docs.select(id_col)
    persisted = []
    reasons: list[str] = []
    survived: dict[str, DataFrame] = {}
    stage_in = docs

    # stage 0a: URL-keyed dedup (cheapest — metadata only)
    if url_col is not None:
        from letarette_spark.functions.urls import url_dedup

        s0a = url_dedup(stage_in, url_col=url_col, id_col=id_col).persist()
        persisted.append(s0a)
        reasons.append("url_dup")
        survived["url_dup"] = s0a
        stage_in = s0a

    # stage 0b: cross-batch dedup against the already-ingested corpus
    if seen is not None:
        from letarette_spark.functions.bloom import incremental_dedup

        s0b = incremental_dedup(stage_in, seen, key_col=text_col).persist()
        persisted.append(s0b)
        reasons.append("already_seen")
        survived["already_seen"] = s0b
        stage_in = s0b

    docs = stage_in

    # stage 1: quality gates (one scan, pure column exprs)
    passed = gopher_quality_flags(docs, id_col=id_col, text_col=text_col).select(
        id_col, "passes"
    )
    s1 = docs.join(passed.filter(F.col("passes")).select(id_col), id_col).persist()
    persisted.append(s1)

    # stage 2: exact dedup among quality survivors — keep min id per hash
    keep_exact = (
        s1.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("__keep"))
    )
    s2 = (
        s1.withColumn("text_hash", F.md5(F.col(text_col)))
        .join(keep_exact, "text_hash")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("text_hash", "__keep")
        .persist()
    )
    persisted.append(s2)

    # stage 3: near dedup among exact survivors — LSH candidates, exact
    # jaccard verify, connected components, keep each component's min
    pairs = minhash_lsh_pairs(
        s2, bands, rows_per_band, n, threshold, id_col, text_col
    )
    comp = connected_components(pairs)
    near_dropped = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    s3 = s2.join(near_dropped, id_col, "left_anti").persist()
    persisted.append(s3)

    # stage 4: benchmark decontamination among near survivors
    if benchmark is not None:
        from letarette_spark.functions.decontam import decontaminate

        s4 = decontaminate(
            s3, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
        )
    else:
        s4 = s3

    # audit: first-dropping stage wins
    def _mark(stage_ids: DataFrame, name: str) -> DataFrame:
        return stage_ids.select(id_col).withColumn("__r", F.lit(name))

    survived.update(
        {"quality": s1, "exact_dup": s2, "near_dup": s3, "contaminated": s4}
    )
    reasons.extend(REASONS)
    prev = ids
    # successive survivor-set differences: each doc lands in at most one
    marks = []
    for name in reasons:
        cur = survived[name].select(id_col)
        dropped_here = prev.join(cur, id_col, "left_anti")
        marks.append(_mark(dropped_here, name))
        prev = cur
    all_marks = marks[0]
    for m in marks[1:]:
        all_marks = all_marks.unionByName(m)
    out = ids.join(all_marks, [id_col], "left").select(
        id_col,
        F.col("__r").isNull().alias("kept"),
        F.col("__r").alias("reason"),
    )
    # materialize the narrow audit eagerly, then release every stage
    # cache deterministically (even when the job fails)
    try:
        return out.localCheckpoint()
    finally:
        for p in persisted:
            p.unpersist()
