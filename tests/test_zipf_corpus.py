"""Skewed synthetic corpus (FIXTURES.md §1): extraction invariant on noisy
html, head-term skew through the full index path, rank identity end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.functions.text import extract_text
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.operators.docids import assign_doc_ids
from bloqsenjin_spark.plans.build import build_index

N = 1200
CFG = IndexConfig(docs_per_shard=256, block_docs=32)


@pytest.fixture(scope="module")
def zdocs(spark):
    pages = corpus.gen_zipf_pages(spark, N)
    ranked = assign_doc_ids(pages.select("url", "html", "lang", "text"), assume_unique=True)
    return ranked.select(
        "doc_id", "url", extract_text("html").alias("etext"), "text"
    ).cache()


def test_generator_deterministic_across_parallelism(spark):
    a = corpus.gen_zipf_pages(spark, 300).orderBy("url").collect()
    b = (
        corpus.gen_zipf_pages(spark, 300).repartition(3).orderBy("url").collect()
    )
    assert [(r["url"], bytes(r["html"]), r["text"]) for r in a] == [
        (r["url"], bytes(r["html"]), r["text"]) for r in b
    ]


def test_extraction_invariant_on_noisy_html(spark, zdocs):
    bad = zdocs.where(F.col("etext") != F.col("text")).count()
    assert bad == 0


def test_head_term_skew_present(spark, zdocs):
    tok = topk.tokenized(zdocs.select("doc_id", F.col("text")))
    df = {
        r["term"]: r["df"]
        for r in topk.term_stats_df(topk.term_freqs(tok), N).collect()
        if r["term"] in ("the", "of", "and")
    }
    assert df["the"] > 0.45 * N  # head term really is in >~half the docs


def test_head_term_bounded_groups(spark, zdocs):
    """Doc-range sharding bounds every (term, shard) group — incl. 'the'."""
    idx = build_index(zdocs.select("doc_id", "text"), CFG)
    the_blocks = idx.postings.where(F.col("term") == "the")
    per_shard = the_blocks.groupBy("shard").agg(F.sum("n_docs").alias("n")).collect()
    assert len(per_shard) >= 4  # spread over multiple shards (the "salt")
    assert all(r["n"] <= CFG.docs_per_shard for r in per_shard)


def test_rank_identity_on_skewed_corpus(spark, zdocs):
    queries = [
        (1, ["the"], "disjunctive", 20),
        (2, ["the", "of", "and"], "conjunctive", 15),
        (3, ["term0000", "the"], "disjunctive", 10),
        (4, ["term0007", "term0042"], "conjunctive", 10),
        (5, ["solo"], "disjunctive", 5),
        (6, ["absentterm"], "disjunctive", 5),
    ]
    docs = zdocs.select("doc_id", "text")
    idx = build_index(docs, CFG)
    got = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, queries, CFG
    ).orderBy("query_id", "rank").collect()
    from bloqsenjin_spark import schemas

    qdf = spark.createDataFrame(
        [(q, sorted(set(t)), m, k) for q, t, m, k in queries], schema=schemas.QUERIES
    )
    want = topk.bm25_brute_force(docs, qdf).orderBy("query_id", "rank").collect()
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"], w["rank"], w["doc_id"],
        )
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)
    # the single-repeated-term doc must top its query (docIDs are re-ranked
    # by url, so resolve the generator's doc 17 to its assigned id)
    solo_id = zdocs.where(F.col("url").endswith("/p/17")).first()["doc_id"]
    solo = [g for g in got if g["query_id"] == 5]
    assert solo and solo[0]["doc_id"] == solo_id
