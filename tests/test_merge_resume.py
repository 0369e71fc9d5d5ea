"""M4: segment-merge property (build(A∪B) == merge(build A, build B)) and
kill-and-resume (partial build + resume == uninterrupted build)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.operators.merge import merge_indexes
from bloqsenjin_spark.plans import build as B

CFG = IndexConfig(docs_per_shard=64, block_docs=8)


def _postings_key(rows):
    return sorted(
        (
            r["term"], r["shard"], r["block_id"], r["n_docs"], r["first_doc"],
            r["last_doc"], bytes(r["doc_deltas"]), bytes(r["tfs"]), r["block_max_tf"],
        )
        for r in rows
    )


def test_merge_equals_full_build(spark):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    a = docs.where(F.col("doc_id") < 200)
    b = docs.where(F.col("doc_id") >= 200)

    full = B.build_index(docs, CFG)
    merged = merge_indexes(B.build_index(a, CFG), B.build_index(b, CFG), CFG)

    assert merged.n_docs == full.n_docs
    assert merged.avgdl == pytest.approx(full.avgdl, rel=1e-12)

    # exact: compressed binaries, counts, bounds
    assert _postings_key(merged.postings.collect()) == _postings_key(full.postings.collect())

    # block_max_score within fp tolerance (avgdl recombination)
    fm = {(r["term"], r["shard"], r["block_id"]): r["block_max_score"] for r in full.postings.collect()}
    mm = {(r["term"], r["shard"], r["block_id"]): r["block_max_score"] for r in merged.postings.collect()}
    assert fm.keys() == mm.keys()
    for k in fm:
        assert mm[k] == pytest.approx(fm[k], rel=1e-12)

    ts_f = {r["term"]: (r["df"], r["cf"]) for r in full.term_stats.collect()}
    ts_m = {r["term"]: (r["df"], r["cf"]) for r in merged.term_stats.collect()}
    assert ts_f == ts_m

    dl_f = {r["shard"]: bytes(r["dls"]) for r in full.doc_lens.collect()}
    dl_m = {r["shard"]: bytes(r["dls"]) for r in merged.doc_lens.collect()}
    assert dl_f == dl_m


def test_merged_index_rank_identical(spark):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    a = docs.where(F.col("doc_id") % 2 == 0)  # interleaved split: blocks overlap
    b = docs.where(F.col("doc_id") % 2 == 1)
    merged = merge_indexes(B.build_index(a, CFG), B.build_index(b, CFG), CFG)

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


def test_kill_and_resume(spark, tmp_path):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    full_dir = str(tmp_path / "full")
    resumed_dir = str(tmp_path / "resumed")

    # uninterrupted
    B.build_index_resumable(docs, full_dir, CFG)

    # "killed" run: only shards 0-3 completed (simulated partial output)
    partial = docs.where(F.col("doc_id") < 4 * CFG.docs_per_shard)
    B.build_index_resumable(partial, resumed_dir, CFG)
    done_before = B.completed_shards(spark, resumed_dir)
    assert done_before == {0, 1, 2, 3}

    # resume with the full snapshot
    B.build_index_resumable(docs, resumed_dir, CFG)
    assert B.completed_shards(spark, resumed_dir) == B.completed_shards(spark, full_dir)

    # NOTE: the partial run saw a smaller corpus, so its baked block_max_score
    # differ — resume's contract is same-snapshot (docstring). Compare the
    # snapshot-invariant payload: decoded postings must be identical for the
    # resumed-vs-uninterrupted runs on the shards built after resume, and the
    # full tf payload must match everywhere.
    from bloqsenjin_spark.operators.postings import decode_postings

    got = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(spark.read.parquet(f"{resumed_dir}/postings"), CFG).collect()
    )
    want = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(spark.read.parquet(f"{full_dir}/postings"), CFG).collect()
    )
    assert got == want

    # stats are rewritten on resume → identical to uninterrupted
    cs_r = spark.read.parquet(f"{resumed_dir}/corpus_stats").first()
    cs_f = spark.read.parquet(f"{full_dir}/corpus_stats").first()
    assert cs_r["n_docs"] == cs_f["n_docs"]
    assert cs_r["avgdl"] == pytest.approx(cs_f["avgdl"], rel=1e-12)


def test_resume_is_noop_when_done(spark, tmp_path):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    d = str(tmp_path / "idx")
    B.build_index_resumable(docs, d, CFG)
    ck1 = spark.read.parquet(f"{d}/checkpoints").count()
    B.build_index_resumable(docs, d, CFG)  # all shards done → no new rows
    ck2 = spark.read.parquet(f"{d}/checkpoints").count()
    assert ck1 == ck2


def test_queryable_from_disk(spark, tmp_path):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    d = str(tmp_path / "idx")
    B.build_index_resumable(docs, d, CFG)
    idx = B.read_index(spark, d, CFG)
    got = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        corpus.REFERENCE_QUERIES, CFG,
    ).orderBy("query_id", "rank").collect()
    want = topk.bm25_brute_force(docs, corpus.reference_queries(spark)).orderBy(
        "query_id", "rank"
    ).collect()
    assert [(g["query_id"], g["rank"], g["doc_id"]) for g in got] == [
        (w["query_id"], w["rank"], w["doc_id"]) for w in want
    ]


def test_merge_encode_identity(spark):
    """Round 9: the vectorized merge kernel must be byte-identical to the
    per-(term, block) reference loop on positional AND positionless merges
    of real segment rows (incl. multi-part blocks)."""
    import numpy as np
    import pandas as pd

    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.operators.merge import merge_shard_kernels
    from bloqsenjin_spark.plans.build import build_index

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    half_a = docs.where("doc_id % 2 = 0")
    half_b = docs.where("doc_id % 2 = 1")
    for positions in (False, True):
        cfg = IndexConfig(docs_per_shard=128, block_docs=16,
                          positions=positions)
        seg_rows = []
        for part in (half_a, half_b):
            idx = build_index(part, cfg)
            seg_rows.extend(idx.postings.collect())
        pl = pd.DataFrame([r.asDict() for r in seg_rows])
        full = build_index(docs, cfg)
        dl_rows = full.doc_lens.collect()
        vec, ref = merge_shard_kernels(cfg, avgdl_new=full.avgdl)
        for dlr in dl_rows:
            shard = dlr["shard"]
            sub = pl[pl["shard"] == shard]
            if sub.empty:
                continue
            dlp = pd.DataFrame([dlr.asDict()])
            a = vec(sub.reset_index(drop=True), dlp)
            b = ref(sub.reset_index(drop=True), dlp)
            a = a.sort_values(["term", "block_id"]).reset_index(drop=True)
            b = b.sort_values(["term", "block_id"]).reset_index(drop=True)
            assert len(a) == len(b)
            for ca, cb in zip(a.itertuples(index=False),
                              b.itertuples(index=False)):
                assert tuple(map(_norm, ca)) == tuple(map(_norm, cb))


def _norm(x):
    import numpy as np

    if isinstance(x, (bytes, bytearray)):
        return bytes(x)
    if isinstance(x, np.generic):
        return x.item()
    return x
