"""Deletion: tombstone masking at query time, and purge ≡ rebuild-from-scratch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.operators.postings import decode_postings
from bloqsenjin_spark.operators.serving import IndexServer
from bloqsenjin_spark.plans import build as B
from bloqsenjin_spark.plans import deletes as D

CFG = IndexConfig(docs_per_shard=128, block_docs=16)
DELETED = [0, 5, 130, 131, 340, 499]  # spans shards 0, 1, 2, 3; includes a top hit


@pytest.fixture()
def built(spark, tmp_path):
    d = str(tmp_path / "idx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    B.build_index_resumable(docs, d, CFG)
    return d, docs


def test_tombstones_masked_at_query_time(spark, built):
    d, docs = built
    D.delete_docs(spark, d, DELETED)
    tombs = D.load_tombstones(spark, d)
    assert tombs == set(DELETED)
    # per-shard bitmap table covers exactly the touched shards
    tomb_map = D.tombstone_bitmap_df(spark, d, CFG)
    assert {r["shard"] for r in tomb_map.collect()} == {x // 128 for x in DELETED}

    idx = B.read_index(spark, d)
    res = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        corpus.REFERENCE_QUERIES, CFG, tomb_map=tomb_map,
    ).collect()
    assert res and not any(r["doc_id"] in tombs for r in res)
    # doc 340 was the #1 hit for query 1 — its removal must promote #2 (49)
    q1 = sorted((r for r in res if r["query_id"] == 1), key=lambda r: r["rank"])
    assert q1[0]["doc_id"] == 49

    srv = IndexServer(d)  # auto-loads tombstones
    got = sorted(srv.query_batch(corpus.REFERENCE_QUERIES))
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in res
    )
    assert [g[:3] for g in got] == [w[:3] for w in want]


def test_tombstones_masked_in_phrase_paths(spark, tmp_path):
    """Phrase match and phrase top-k must mask logically deleted docs via the
    cogrouped per-shard bitmaps (pre-purge)."""
    cfg = IndexConfig(docs_per_shard=4, block_docs=2, positions=True)
    rows = [(i, f"pad{i} needle point tail{i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "pidx")
    B.build_index_resumable(docs, d, cfg)
    D.delete_docs(spark, d, [3, 7])
    tomb_map = D.tombstone_bitmap_df(spark, d, cfg)
    idx = B.read_index(spark, d)
    got = {
        r["doc_id"]
        for r in wand.phrase_match_positional(
            idx.postings, [(1, "needle point")], cfg, tomb_map=tomb_map
        ).collect()
    }
    assert got == {0, 1, 2, 4, 5, 6, 8, 9}
    topk_docs = {
        r["doc_id"]
        for r in wand.phrase_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, "needle point", 10)], cfg, tomb_map=tomb_map,
        ).collect()
    }
    assert topk_docs == got
    # serving tier masks from the same per-shard bitmaps
    srv = IndexServer(d)
    assert {doc for _, doc in srv.phrase_batch([(1, "needle point")])} == got

    # allow-set composes with tombstones in the phrase top-k too
    from bloqsenjin_spark.operators.bitmaps import shard_bitmap_df

    allow_map = shard_bitmap_df(
        spark.createDataFrame([(i,) for i in range(0, 10, 2)], "doc_id long"),
        cfg, bitmap_col="allow",
    )
    filt = {
        r["doc_id"]
        for r in wand.phrase_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, "needle point", 10)], cfg,
            tomb_map=tomb_map, allow_map=allow_map,
        ).collect()
    }
    assert filt == {d for d in got if d % 2 == 0}


def test_purge_equals_rebuild(spark, built):
    d, docs = built
    D.delete_docs(spark, d, DELETED)
    D.purge_deletes(spark, d)
    assert D.load_tombstones(spark, d) == set()

    # reference: fresh index over the surviving docs
    kept = docs.where(~F.col("doc_id").isin(DELETED))
    ref = B.build_index(kept, CFG)

    purged = B.read_index(spark, d)
    assert purged.n_docs == ref.n_docs == 500 - len(DELETED)
    assert purged.avgdl == pytest.approx(ref.avgdl, rel=1e-12)

    got_post = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(purged.postings, CFG).collect()
    )
    want_post = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(ref.postings, CFG).collect()
    )
    assert got_post == want_post

    ts_got = {r["term"]: (r["df"], r["cf"]) for r in purged.term_stats.collect()}
    ts_want = {r["term"]: (r["df"], r["cf"]) for r in ref.term_stats.collect()}
    assert ts_got == ts_want

    # query results identical to brute force over surviving docs
    want = topk.bm25_brute_force(kept, corpus.reference_queries(spark)).orderBy(
        "query_id", "rank"
    ).collect()
    got = wand.bm25_wand_topk(
        purged.postings, purged.doc_lens, purged.term_stats, purged.avgdl,
        corpus.REFERENCE_QUERIES, CFG,
    ).orderBy("query_id", "rank").collect()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"], w["rank"], w["doc_id"],
        )
        assert g["score"] == pytest.approx(w["score"], abs=1e-9)


def test_bogus_and_stale_tombstones_are_stat_noops(spark, built):
    """Tombstones for nonexistent or already-purged docIDs must not shift
    N/avgdl/idf (live-bitmap guard)."""
    d, _ = built
    D.delete_docs(spark, d, [340, 49])
    D.purge_deletes(spark, d)
    s1 = IndexServer(d)
    base = (s1.n_docs, s1.query(["spark"], k=3))

    D.delete_docs(spark, d, [10**9])  # never existed
    D.purge_deletes(spark, d)
    s2 = IndexServer(d)
    assert (s2.n_docs, s2.query(["spark"], k=3)) == base

    D.delete_docs(spark, d, [340])  # already purged
    D.purge_deletes(spark, d)
    s3 = IndexServer(d)
    assert (s3.n_docs, s3.query(["spark"], k=3)) == base
    assert D.load_tombstones(spark, d) == set()


def test_purge_noop_without_tombstones(spark, built):
    d, _ = built
    before = sorted(
        (r["term"], r["shard"], r["block_id"])
        for r in B.read_index(spark, d).postings.collect()
    )
    D.purge_deletes(spark, d)  # no tombstones → no-op
    after = sorted(
        (r["term"], r["shard"], r["block_id"])
        for r in B.read_index(spark, d).postings.collect()
    )
    assert before == after


def test_filtered_topk_allow_bitmaps(spark, built):
    """bm25_topk_filtered == (unbounded-rank results) ∩ allow-set, re-ranked —
    cross-plan check; composes with tombstone bitmaps."""
    d, docs = built
    idx = B.read_index(spark, d)
    allowed = docs.where(F.col("lang") == "en").select("doc_id")
    allow_ids = {r["doc_id"] for r in allowed.collect()}
    assert 0 < len(allow_ids) < 500

    kmap = {q: k for q, _, _, k in corpus.REFERENCE_QUERIES}

    def rerank(rows, keep):
        want = []
        by_q: dict = {}
        for r in rows:
            if r["doc_id"] in keep:
                by_q.setdefault(r["query_id"], []).append(
                    (-r["score"], r["doc_id"]))
        for q, lst in by_q.items():
            for rank, (neg_s, doc) in enumerate(sorted(lst)[: kmap[q]], start=1):
                want.append((q, rank, doc, -neg_s))
        return sorted(want)

    unbounded = [(q, t, m, 10**6) for q, t, m, _ in corpus.REFERENCE_QUERIES]
    full = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, unbounded, CFG
    ).collect()

    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_topk_filtered(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            corpus.REFERENCE_QUERIES, allowed, CFG,
        ).collect()
    )
    assert got == rerank(full, allow_ids)
    assert all(doc in allow_ids for _, _, doc, _ in got)

    # composition: tombstoned docs leave the filtered ranking too
    dead = sorted(allow_ids)[:3]
    D.delete_docs(spark, d, dead)
    tomb_map = D.tombstone_bitmap_df(spark, d, CFG)
    got2 = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_topk_filtered(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            corpus.REFERENCE_QUERIES, allowed, CFG, tomb_map=tomb_map,
        ).collect()
    )
    assert got2 == rerank(full, allow_ids - set(dead))


def test_purge_cleans_doc_store_and_snippets_survive(spark, tmp_path):
    """Physical purge removes the purged docs' rows from the doc-store
    replica too (byte reclamation across every index table), and serving
    snippets after the purge remain byte-identical to the Spark snippet
    path over the purged corpus."""
    cfg = IndexConfig(docs_per_shard=64, block_docs=16, positions=True)
    d = str(tmp_path / "purge_store_idx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    B.build_index_resumable(docs, d, cfg)
    B.write_doc_store(docs, d, cfg)
    victims = [int(r["doc_id"]) for r in docs.limit(40).collect()][::3]
    D.delete_docs(spark, d, victims)
    D.purge_deletes(spark, d)
    remaining = {
        int(r["doc_id"])
        for r in spark.read.parquet(f"{d}/doc_store").select("doc_id").collect()
    }
    assert not (remaining & set(victims))
    live = {int(r["doc_id"]) for r in docs.collect()} - set(victims)
    assert remaining == live  # only purged rows were dropped
    # serving snippets on the purged index == Spark path over purged corpus
    srv = IndexServer(d, cfg)
    queries = [(1, ["the", "fast"], "disjunctive", 8)]
    got = [(q, r, doc, round(s, 9), p, sn)
           for q, r, doc, s, p, sn in srv.snippet_batch(queries)]
    idx = B.read_index(spark, d, cfg)
    kept_docs = docs.where(~F.col("doc_id").isin(victims))
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9),
         r["snip_pos"], r["snippet"])
        for r in wand.topk_snippets(
            kept_docs, idx.postings, idx.doc_lens, idx.term_stats,
            idx.avgdl, queries, cfg).collect()
    )
    assert got == want and len(want) > 0
    assert not any(doc in set(victims) for _q, _r, doc, _s, _p, _sn in got)


def test_or_bitmap_maps_length_mismatch_raises(spark):
    """Round-9 guard (round-8 ADVICE): OR-merging two differently-sized
    bitmap carriers must fail loudly (naming the lengths), not with an
    opaque numpy broadcast error inside the pandas UDF."""
    import pytest

    from bloqsenjin_spark.operators.bitmaps import or_bitmap_maps

    a = spark.createDataFrame([(0, bytes(16))], "shard int, tomb binary")
    b = spark.createDataFrame([(0, bytes(8))], "shard int, tomb binary")
    with pytest.raises(Exception, match="bitmap length mismatch"):
        or_bitmap_maps(a, b).collect()
