"""Faceted counts: kernel bucketing, missing bucket, cardinality cap,
serving replica identity + coherence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import wand
from bloqsenjin_spark.plans.build import build_index

SF_DIR = "/root/testdata/sf0.001"
CFG = IndexConfig(docs_per_shard=128, block_docs=16)

QUERIES = [
    (1, ["the", "fast"], "disjunctive", 10),
    (2, ["customer", "order"], "conjunctive", 10),
    (3, ["join", "hash"], "conjunctive", 10, ("merge",)),
]


@pytest.fixture(scope="module")
def env(spark):
    docs = corpus.load_table(spark, SF_DIR, "documents")
    return docs, build_index(docs, CFG)


def _facets(docs):
    return docs.select("doc_id", F.col("lang").alias("facet"))


def test_facet_counts_vs_reference(spark, env):
    """Per-bucket counts == a direct match-set recomputation, and bucket
    sums == match_counts."""
    docs, idx = env
    got = sorted(tuple(r) for r in wand.facet_counts(
        idx.postings, idx.doc_lens, QUERIES, _facets(docs), CFG).collect())
    rows = [(r["doc_id"], set((r["text"] or "").lower().split()), r["lang"])
            for r in docs.selectExpr(
                "doc_id", "array_join(regexp_extract_all(lower(text), "
                "'[a-z0-9]+', 0), ' ') AS text", "lang").collect()]
    want = {}
    for q in QUERIES:
        qid, terms, mode = q[0], set(q[1]), q[2]
        negs = set(q[4]) if len(q) > 4 else set()
        for d, toks, lang in rows:
            hit = (terms <= toks if mode == "conjunctive"
                   else bool(terms & toks))
            if hit and not (negs & toks):
                want[(qid, lang)] = want.get((qid, lang), 0) + 1
    assert got == sorted((q, f, n) for (q, f), n in want.items())
    totals = {}
    for q, _f, n in got:
        totals[q] = totals.get(q, 0) + n
    mc = {r["query_id"]: r["n_hits"] for r in wand.match_counts(
        idx.postings, idx.doc_lens, QUERIES, CFG).collect()}
    assert totals == {k: v for k, v in mc.items() if v}


def test_facet_missing_bucket_and_cap(spark, env):
    docs, idx = env
    fx = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(None)).otherwise(F.col("lang"))
        .alias("facet"))
    got = {(r["facet"]): r["n_hits"] for r in wand.facet_counts(
        idx.postings, idx.doc_lens, [QUERIES[0]], fx, CFG).collect()}
    base = {r["facet"]: r["n_hits"] for r in wand.facet_counts(
        idx.postings, idx.doc_lens, [QUERIES[0]], _facets(docs),
        CFG).collect()}
    assert got[wand.FACET_MISSING] == base["en"]
    assert all(got[k] == base[k] for k in base if k != "en")
    with pytest.raises(ValueError, match="distinct values"):
        wand.facet_counts(
            idx.postings, idx.doc_lens, [QUERIES[0]],
            docs.select("doc_id",
                        F.col("doc_id").cast("string").alias("facet")),
            CFG)


def test_facet_serving_identical_and_coherent(spark, tmp_path):
    """IndexServer.facet_count_batch over the facet replica == the Spark
    operator (both stats modes); stale replicas refuse; refresh_replicas
    rebuilds them via facet_sources."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans import build as B

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "facet_idx")
    B.build_index_resumable(docs, d, CFG)
    B.write_facet_index(_facets(docs), d, "lang", CFG, facet_col="facet")
    idx = B.read_index(spark, d, CFG)
    want = sorted(tuple(r) for r in wand.facet_counts(
        idx.postings, idx.doc_lens, QUERIES, _facets(docs), CFG).collect())
    for kw in ({}, {"stats_mode": "lazy"}):
        srv = IndexServer(d, CFG, **kw)
        assert sorted(srv.facet_count_batch(QUERIES, "lang")) == want
    srv = IndexServer(d, CFG)
    with pytest.raises(ValueError, match="no facet replica"):
        srv.facet_count_batch(QUERIES, "category")
    # content mutation → stale refusal → one-call refresh → serves again
    B.write_index_meta(spark, d, CFG)  # bump content generation
    assert "facet_lang" in B.stale_replicas(d)
    srv2 = IndexServer(d, CFG)
    with pytest.raises(ValueError, match="STALE"):
        srv2.facet_count_batch(QUERIES, "lang")
    rebuilt = B.refresh_replicas(
        spark, d, facet_sources={"lang": (_facets(docs), "facet")})
    assert "facet_lang" in rebuilt
    srv3 = IndexServer(d, CFG)
    assert sorted(srv3.facet_count_batch(QUERIES, "lang")) == want
