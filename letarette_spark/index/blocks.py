"""Posting blocks: delta+varbyte-compressed doclist runs with block-max
metadata — the storage layer for block-max WAND pruning (query/wand.py).

Layout: one row per (term, run of <= block_size docs), built from the
row-postings table after a repartitionByRange(term, rowid) +
sortWithinPartitions — so blocks are formed inside partitions with NO
per-term groupBy. A Zipf head term's doclist simply spans many partitions,
each producing its own blocks: term-frequency skew cannot concentrate on a
single reducer (SURVEY.md §7 watch-list #5).

Columns:
  term, n, min_rowid, max_rowid         block membership + range pruning
  tf0_max, tf1_max, dl_min              block-max score-bound ingredients
  rowids, tf0s, tf1s, dls (binary)      varbyte payloads (decode on demand)

Positions are intentionally absent: phrase/NEAR queries use the row
postings; blocks serve pure BM25 scoring (the WAND path).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from letarette_spark.index.builder import Index
from letarette_spark.index.manifest import Manifest
from letarette_spark.index.varbyte import encode_ints, encode_rowids

DEFAULT_BLOCK_SIZE = 128

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("min_rowid", T.LongType(), False),
        T.StructField("max_rowid", T.LongType(), False),
        T.StructField("tf0_max", T.IntegerType(), False),
        T.StructField("tf1_max", T.IntegerType(), False),
        T.StructField("dl_min", T.IntegerType(), False),
        T.StructField("rowids", T.BinaryType(), False),
        T.StructField("tf0s", T.BinaryType(), False),
        T.StructField("tf1s", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
    ]
)


def build_blocks(index: Index, block_size: int = DEFAULT_BLOCK_SIZE) -> str:
    """Materialize the blocks table from current postings. Returns path."""

    def make(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            # rows arrive sorted by (term, rowid) within the partition
            for term, g in pdf.groupby("term", sort=False):
                rowids = g["rowid"].to_numpy(dtype=np.int64)
                tf0 = g["tf0"].to_numpy(dtype=np.int64)
                tf1 = g["tf1"].to_numpy(dtype=np.int64)
                dls = g["dl"].to_numpy(dtype=np.int64)
                for s in range(0, len(rowids), block_size):
                    e = min(s + block_size, len(rowids))
                    out.append(
                        {
                            "term": term,
                            "n": e - s,
                            "min_rowid": int(rowids[s]),
                            "max_rowid": int(rowids[e - 1]),
                            "tf0_max": int(tf0[s:e].max()),
                            "tf1_max": int(tf1[s:e].max()),
                            "dl_min": int(dls[s:e].min()),
                            "rowids": encode_rowids(rowids[s:e]),
                            "tf0s": encode_ints(tf0[s:e]),
                            "tf1s": encode_ints(tf1[s:e]),
                            "dls": encode_ints(dls[s:e]),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in BLOCKS_SCHEMA.fields])

    spark = index.spark
    par = max(2, spark.sparkContext.defaultParallelism // 2)
    blocks = (
        index.postings()
        .select("term", "rowid", "tf0", "tf1", "dl")
        .repartitionByRange(par, "term", "rowid")
        .sortWithinPartitions("term", "rowid")
        .mapInPandas(make, schema=BLOCKS_SCHEMA)
    )
    out = os.path.join(index.root, "blocks")
    tmp = out + ".tmp"
    blocks.write.mode("overwrite").parquet(tmp)
    import shutil

    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)

    man = Manifest.load(index.root)
    meta = dict(man.state, blocks={"block_size": block_size})
    meta.pop("snapshot_id", None)
    man.commit_snapshot(meta)
    index.meta = man.state
    return out


def has_blocks(index: Index) -> bool:
    return bool(index.meta.get("blocks")) and os.path.exists(
        os.path.join(index.root, "blocks")
    )


def blocks_df(index: Index):
    return index.spark.read.parquet(os.path.join(index.root, "blocks"))
