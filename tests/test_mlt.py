"""More-Like-This: selection rule, seed exclusion, serving twin identity."""

from __future__ import annotations

import pytest

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import mlt
from bloqsenjin_spark.plans.build import build_index

SF_DIR = "/root/testdata/sf0.001"
CFG = IndexConfig(docs_per_shard=128, block_docs=16)


@pytest.fixture(scope="module")
def env(spark):
    docs = corpus.load_table(spark, SF_DIR, "documents")
    return docs, build_index(docs, CFG)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mlt_seed_excluded_and_ranks_dense(spark, env):
    docs, idx = env
    res = _rows(mlt.more_like_this_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, docs,
        [(1, 3, 10), (2, 17, 5)], CFG, max_query_terms=10))
    assert res
    by_q = {}
    for qid, rank, doc, _s in res:
        by_q.setdefault(qid, []).append((rank, doc))
    seeds = {1: 3, 2: 17}
    for qid, rows in by_q.items():
        ranks = [r for r, _d in sorted(rows)]
        assert ranks == list(range(1, len(ranks) + 1))  # dense, renumbered
        assert seeds[qid] not in [d for _r, d in rows]  # seed never returned
        assert len(rows) <= (10 if qid == 1 else 5)


def test_mlt_selection_rule(spark, env):
    """Selection = (tf DESC, df ASC, term ASC) over the seed's tokens with
    the min-frequency gates — checked against a direct recomputation."""
    docs, idx = env
    seed = 3
    sel = mlt.mlt_select_terms(docs, idx.term_stats, [(1, seed, 10)],
                               max_query_terms=8, min_doc_freq=2)
    toks = docs.where(f"doc_id = {seed}").collect()[0]["text"]
    import re

    from bloqsenjin_spark.config import TOKEN_SPLIT_REGEX
    words = [t for t in re.split(TOKEN_SPLIT_REGEX, toks.lower()) if t]
    tf = {}
    for w in words:
        tf[w] = tf.get(w, 0) + 1
    dfs = {r["term"]: r["df"] for r in idx.term_stats.where(
        idx.term_stats.term.isin(list(tf))).collect()}
    want = [t for t, _n in sorted(
        ((t, n) for t, n in tf.items() if dfs.get(t, 0) >= 2),
        key=lambda tn: (-tn[1], dfs[tn[0]], tn[0]))][:8]
    assert sel[1] == want and len(want) == 8


def test_mlt_guards_and_empty(spark, env):
    docs, idx = env
    with pytest.raises(ValueError, match="duplicate"):
        mlt.more_like_this_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, docs,
            [(1, 3, 5), (1, 4, 5)], CFG)
    # unknown seed id → that query contributes nothing
    res = mlt.more_like_this_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, docs,
        [(1, 10 ** 9, 5)], CFG)
    assert res.count() == 0


def test_mlt_serving_identical(spark, tmp_path):
    """IndexServer.mlt_topk_batch (doc-store replica + shared selection
    rule) == the Spark operator, both stats modes."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans import build as B

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "mlt_idx")
    B.build_index_resumable(docs, d, CFG)
    B.write_doc_store(docs, d, CFG)
    idx = B.read_index(spark, d, CFG)
    queries = [(1, 3, 10), (2, 57, 5), (3, 10 ** 9, 5)]
    spark_rows = sorted(tuple(r) for r in mlt.more_like_this_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, docs,
        queries, CFG, max_query_terms=10).collect())
    for kw in ({}, {"stats_mode": "lazy"}):
        srv = IndexServer(d, CFG, **kw)
        got = sorted(srv.mlt_topk_batch(queries, max_query_terms=10))
        assert [(q, r, d_) for q, r, d_, _ in got] == \
               [(q, r, d_) for q, r, d_, _ in spark_rows]
        for a, b in zip(got, spark_rows):
            assert abs(a[3] - b[3]) < 1e-9
        assert len(got) > 0
