"""Deterministic docID assignment (SURVEY.md §4.2 item 6).

Rank-identity across cluster sizes forbids ``monotonically_increasing_id()``
(partition-layout-dependent). docID := dense rank of ``url`` in the corpus.

Scale path: range-partition by url, sort within partitions, then global rank
= per-partition offset + local rank. Only the per-partition counts (one long
per partition) reach the driver — no global single-partition window. The
intermediate is persisted so the sampled range boundaries are computed once
(two jobs over an unpersisted range-shuffle could legally resample).

Reference analog: AUTO_INCREMENT + LastInsertId id minting
(/root/reference/internal/db/mariadb.go:194) — a single-writer sequence that
cannot scale; dense rank over a unique natural key is the distributed
equivalent.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_doc_ids(
    pages: DataFrame,
    num_partitions: int | None = None,
    assume_unique: bool = False,
) -> DataFrame:
    """pages → pages + doc_id (long, dense, 0-based, ordered by url).

    Unless ``assume_unique``, duplicate urls are dropped first (keep an
    arbitrary-but-deterministic row via max over the remaining columns;
    reference analog: UNIQUE guards,
    /root/reference/internal/auth/auth.go:92-113). Pass ``assume_unique=True``
    when the source enforces uniqueness — it skips a full shuffle.

    Perf note: repartitionByRange SAMPLES its child to pick boundaries, i.e.
    executes the upstream plan twice. Keep expensive UDFs (extraction)
    DOWNSTREAM of this call — only url + raw columns should flow in.
    """
    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if assume_unique:
        deduped = pages
    else:
        others = [c for c in pages.columns if c != "url"]
        w = pages.groupBy("url").agg(F.max(F.struct(*others)).alias("s"))
        deduped = w.select("url", *[F.col(f"s.{c}").alias(c) for c in others])

    ranged = (
        deduped.repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url")
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["c"] for r in ranged.groupBy("_pid").count().withColumnRenamed("count", "c").collect()}
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = ranged.drop("_pid").schema.add("doc_id", "long", False)

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            base = boff.value.get(pid, 0)
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return ranged.mapInPandas(_assign, schema=out_schema)


def docs_from_documents(documents: DataFrame) -> DataFrame:
    """Driver testdata shortcut: documents.parquet already carries a dense,
    deterministic doc_id — use it verbatim so oracle SQL can join on it."""
    return documents
