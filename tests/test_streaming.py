"""Structured Streaming: incremental segments + compaction == batch rebuild,
and watermarked windowed metrics over the events stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.plans import build as B
from bloqsenjin_spark.streaming import ingest

CFG = IndexConfig(docs_per_shard=64, block_docs=8)


def test_stream_ingest_compact_equals_batch(spark, tmp_path):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    in_dir = str(tmp_path / "in")
    seg_dir = str(tmp_path / "seg")
    ck_dir = str(tmp_path / "ck")

    # batch 1 lands, stream drains it
    docs.where(F.col("doc_id") < 250).coalesce(1).write.mode("overwrite").parquet(in_dir)
    q = ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=CFG)
    q.awaitTermination(120)

    # batch 2 lands later, stream resumes from checkpoint
    docs.where(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in_dir)
    q = ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=CFG)
    q.awaitTermination(120)

    merged = ingest.compact(spark, seg_dir, CFG)
    assert merged.n_docs == 500

    want = topk.bm25_brute_force(docs, corpus.reference_queries(spark)).orderBy(
        "query_id", "rank"
    ).collect()
    got = wand.bm25_wand_topk(
        merged.postings, merged.doc_lens, merged.term_stats, merged.avgdl,
        corpus.REFERENCE_QUERIES, CFG,
    ).orderBy("query_id", "rank").collect()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (w["query_id"], w["rank"], w["doc_id"])
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_windowed_event_metrics_batch_semantics(spark):
    events = corpus.load_table(spark, "/root/testdata/sf0.001", "events")
    got = ingest.windowed_event_metrics(events, window="1 day", watermark="1 day")
    rows = got.collect()
    assert len(rows) > 0
    total = sum(r["n"] for r in rows)
    assert total == events.count()
    # window bounds are day-aligned and half-open
    for r in rows:
        assert r["window_start"] < r["window_end"]


def test_stream_ingest_positional_phrase(spark, tmp_path):
    """Positional segments survive streaming ingest + compaction: phrase
    queries answer correctly from the compacted index with no corpus scan."""
    cfg = IndexConfig(docs_per_shard=64, block_docs=8, positions=True)
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    in_dir, seg_dir, ck_dir = (str(tmp_path / d) for d in ("in", "seg", "ck"))
    docs.where(F.col("doc_id") < 250).coalesce(1).write.mode("overwrite").parquet(in_dir)
    ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=cfg).awaitTermination(120)
    docs.where(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in_dir)
    ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=cfg).awaitTermination(120)
    merged = ingest.compact(spark, seg_dir, cfg)

    import re

    got = {
        r["doc_id"]
        for r in wand.phrase_match_positional(
            merged.postings, [(1, "the fast")], cfg
        ).collect()
    }
    want = {
        r["doc_id"] for r in docs.collect()
        if " the fast " in " " + " ".join(
            t for t in re.split("[^a-z0-9]+", r["text"].lower()) if t) + " "
    }
    assert got == want and len(got) > 0


def test_stream_ingest_idempotent_batch_replay(spark, tmp_path):
    """Re-running the drained stream (same checkpoint) adds nothing."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).where(F.col("doc_id") < 100)
    in_dir = str(tmp_path / "in")
    seg_dir = str(tmp_path / "seg")
    ck_dir = str(tmp_path / "ck")
    docs.coalesce(1).write.mode("overwrite").parquet(in_dir)
    for _ in range(2):
        q = ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=CFG)
        q.awaitTermination(120)
    merged = ingest.compact(spark, seg_dir, CFG)
    assert merged.n_docs == 100


def test_replica_coherence_after_compact(spark, tmp_path):
    """Streaming → replica coherence: a compact that rewrites index content
    must never let serving silently read pre-compact replica rows. Flow:
    build + doc-store + fuzzy replicas → serve OK; append a batch and
    compact_to the same dir → snippet/fuzzy serving REFUSES the stale
    replicas with the remedy (stale_replicas names them); rebuild the
    replicas → serving answers from the NEW corpus. Logical deletes, by
    contrast, do NOT stale replicas (tombstones mask at query time)."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans import deletes as D

    cfg = IndexConfig(docs_per_shard=64, block_docs=8, positions=True)
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx_dir = str(tmp_path / "idx")
    first = docs.where(F.col("doc_id") < 250)
    B.build_index_resumable(first, idx_dir, cfg)
    B.write_doc_store(first, idx_dir, cfg)
    B.write_fuzzy_index(spark, idx_dir, max_dist=1)
    assert B.stale_replicas(idx_dir) == []

    srv = IndexServer(idx_dir, cfg)
    qs = [(1, ["the", "fast"], "disjunctive", 5)]
    assert srv.snippet_batch(qs)  # fresh replica serves
    lazy = IndexServer(idx_dir, cfg, stats_mode="lazy")
    assert lazy.fuzzy_topk_batch([(1, "spork", 1, 5)])

    # a logical delete is NOT a content mutation for the replicas
    D.delete_docs(spark, idx_dir, [0])
    srv.refresh()
    assert B.stale_replicas(idx_dir) == []
    assert srv.snippet_batch(qs)

    # append a batch via streaming segments, compact INTO the serving dir
    in_dir, seg_dir, ck_dir = (str(tmp_path / d) for d in ("in", "seg", "ck"))
    first.coalesce(1).write.mode("overwrite").parquet(in_dir)
    ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=cfg).awaitTermination(120)
    docs.where(F.col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in_dir)
    ingest.start_ingest(spark, in_dir, seg_dir, ck_dir, cfg=cfg).awaitTermination(120)
    ingest.compact_to(spark, seg_dir, idx_dir, cfg)

    assert sorted(B.stale_replicas(idx_dir)) == ["doc_store", "fuzzy_index"]
    srv.refresh()
    with pytest.raises(ValueError, match="STALE.*write_doc_store"):
        srv.snippet_batch(qs)
    lazy.refresh()
    with pytest.raises(ValueError, match="STALE.*write_fuzzy_index"):
        lazy.fuzzy_topk_batch([(1, "spork", 1, 5)])

    # ONE-call maintenance (round 7): refresh_replicas rebuilds exactly the
    # stale set — doc_store needs the current corpus (raises without it),
    # fuzzy buckets rebuild at their PREVIOUS distance; idempotent when
    # fresh — then serving covers the NEW docs with no manual sequence
    with pytest.raises(ValueError, match="doc_store replica is stale"):
        B.refresh_replicas(spark, idx_dir)
    assert sorted(B.refresh_replicas(spark, idx_dir, docs=docs)) == [
        "doc_store", "fuzzy_index"]
    assert B.stale_replicas(idx_dir) == []
    assert B.refresh_replicas(spark, idx_dir, docs=docs) == []
    srv.refresh()
    rows = srv.snippet_batch([(1, ["the"], "disjunctive", 300)])
    assert any(doc >= 250 for _q, _r, doc, _s, _p, _sn in rows)
    lazy.refresh()
    assert lazy.fuzzy_topk_batch([(1, "spork", 1, 5)])
    # the preserved build distance still refuses ABOVE-distance queries
    # through the round-7 default (no silent vocabulary scan)
    with pytest.raises(ValueError, match="exceeds the on-disk"):
        lazy.fuzzy_topk_batch([(1, "spork", 2, 5)])

    # streaming hook: a re-compact re-stales; compact_to(refresh=True)
    # leaves every serving form servable in the one call
    ingest.compact_to(spark, seg_dir, idx_dir, cfg, refresh=True, docs=docs)
    assert B.stale_replicas(idx_dir) == []
    srv.refresh()
    lazy.refresh()
    assert srv.snippet_batch(qs)
    assert lazy.fuzzy_topk_batch([(1, "spork", 1, 5)])
