"""Structured Streaming ingestion: incremental index build.

Shape: file-source stream → foreachBatch → per-batch SEGMENT build (the same
single-shuffle plan as the batch builder) → append segments keyed by batch →
periodic ``compact()`` merging segments into the serving index via the
LSM-style merge operator (operators/merge.py, property-tested equal to a
full rebuild).

Contracts:
* incoming docs carry globally-unique docIDs (disjoint across batches) — the
  streaming analog of deterministic docID assignment; violations surface as
  docID collisions in the merge.
* foreachBatch + checkpointLocation gives exactly-once segment appends per
  batch id (re-executed batches overwrite their own segment partition).

The reference has no stream processor; its nearest analogs are TTL state and
async fan-out (SURVEY.md §2.9). This module is the engine-native realization:
watermarked event metrics + incremental index segments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from bloqsenjin_spark.config import DEFAULT_CONFIG, IndexConfig
from bloqsenjin_spark.operators.merge import (
    merge_doc_lens,
    merge_postings,
    merge_term_stats,
)
from bloqsenjin_spark.plans.build import Index, build_index


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    segments_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    cfg: IndexConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream parquet files from ``input_dir``; each micro-batch becomes an
    index segment under ``segments_dir`` (postings/doc_lens/stats keyed by
    segment id = batch id, idempotent per batch)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = build_index(batch_df, cfg, cache=True)
        seg = F.lit(int(batch_id)).alias("segment")
        idx.postings.withColumn("segment", seg).repartition(F.col("shard")).write.partitionBy(
            "segment"
        ).mode("overwrite").option("partitionOverwriteMode", "dynamic").parquet(
            f"{segments_dir}/postings"
        )
        idx.doc_lens.withColumn("segment", seg).write.partitionBy("segment").mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").parquet(f"{segments_dir}/doc_lens")
        idx.term_stats.withColumn("segment", seg).coalesce(1).write.partitionBy(
            "segment"
        ).mode("overwrite").option("partitionOverwriteMode", "dynamic").parquet(
            f"{segments_dir}/term_stats"
        )
        spark.createDataFrame(
            [(int(batch_id), idx.n_docs, idx.avgdl)],
            "segment long, n_docs long, avgdl double",
        ).write.partitionBy("segment").mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(f"{segments_dir}/corpus_stats")
        idx.unpersist()

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(
    spark: SparkSession,
    segments_dir: str,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> Index:
    """Merge ALL segments into one queryable Index (lazy DataFrames)."""
    seg_post = spark.read.parquet(f"{segments_dir}/postings").drop("segment")
    seg_dl = spark.read.parquet(f"{segments_dir}/doc_lens").drop("segment")
    seg_ts = spark.read.parquet(f"{segments_dir}/term_stats").drop("segment")
    cs = spark.read.parquet(f"{segments_dir}/corpus_stats").agg(
        F.sum("n_docs").alias("n"),
        F.sum(F.col("avgdl") * F.col("n_docs")).alias("dl_total"),
    ).first()
    n_docs = int(cs["n"])
    avgdl = (float(cs["dl_total"]) / n_docs) if n_docs else 1.0
    dl = merge_doc_lens(seg_dl)
    ts = merge_term_stats(n_docs, seg_ts)
    return Index(
        postings=merge_postings(seg_post, dl, ts, avgdl, cfg),
        doc_lens=dl,
        term_stats=ts,
        n_docs=n_docs,
        avgdl=avgdl,
        cfg=cfg,
    )


def compact_to(
    spark: SparkSession,
    segments_dir: str,
    index_dir: str,
    cfg: IndexConfig = DEFAULT_CONFIG,
    refresh: bool = False,
    docs: "DataFrame | None" = None,
    facet_sources: "dict[str, tuple] | None" = None,
) -> None:
    """Persist the merged segments as the serving index (plans.build.
    write_index) — a CONTENT mutation: both ``generation`` and
    ``content_generation`` advance, so live IndexServers refresh on their
    next poll, and opt-in replicas built against the old content (doc
    store, fuzzy buckets) are REFUSED loudly by their serving paths until
    rebuilt (plans.build.stale_replicas lists them; write_doc_store /
    write_fuzzy_index re-stamp them fresh). That is the streaming → replica
    coherence contract: a compact can never make a snippet or fuzzy path
    silently serve pre-compact rows.

    ``refresh=True`` opts into ONE-CALL maintenance right after the
    compact: plans.build.refresh_replicas rebuilds exactly the replicas
    the mutation staled (the fuzzy buckets from the new term_stats at
    their previous build distance; the doc store from ``docs`` — required
    then, since segments hold index tables, not corpus rows; facet code
    replicas from ``facet_sources`` — {name: (facet_df, facet_col)},
    required then for any index with faceted serving enabled, since facet
    codes project a source relation the index layout does not hold)."""
    from bloqsenjin_spark.plans.build import refresh_replicas, write_index

    write_index(compact(spark, segments_dir, cfg), index_dir)
    if refresh:
        refresh_replicas(spark, index_dir, docs=docs, cfg=cfg,
                         facet_sources=facet_sources)


def windowed_event_metrics(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the engine-native
    form of the reference's TTL-expiring state (SURVEY.md §2.9): late rows
    beyond the watermark are dropped instead of upserted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )
