"""Metamorphic/property checks on seeded random corpora (SURVEY §5.2 #4):
(b) conjunctive top-k docs ⊆ disjunctive candidates, (c) WAND == brute force,
plus serving == WAND — across random corpora, query shapes and configs."""

from __future__ import annotations

import random

import pytest

from bloqsenjin_spark import schemas
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.plans.build import build_index


def _random_corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for d in range(n_docs):
        dl = rng.choice([0, 1, 2, 5, 9, 30, 80])
        docs.append((d, " ".join(rng.choices(vocab, k=dl))))
    return docs


def _random_queries(seed: int, n: int):
    rng = random.Random(seed * 31 + 7)
    out = []
    for q in range(1, n + 1):
        terms = rng.choices([f"w{i}" for i in range(55)], k=rng.randint(1, 5))  # incl. absent w50+
        out.append((q, sorted(set(terms)), rng.choice(["conjunctive", "disjunctive"]),
                    rng.choice([1, 3, 10, 50])))
    return out


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_wand_equals_brute_on_random_corpus(spark, seed):
    docs_rows = _random_corpus(seed, 400)
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    queries = _random_queries(seed, 8)
    cfg = IndexConfig(docs_per_shard=64 if seed % 2 else 128,
                      block_docs=8 if seed % 2 else 32)

    qdf = spark.createDataFrame(queries, schema=schemas.QUERIES)
    want = topk.bm25_brute_force(docs, qdf).orderBy("query_id", "rank").collect()

    idx = build_index(docs, cfg)
    got = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, queries, cfg
    ).orderBy("query_id", "rank").collect()

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"], w["rank"], w["doc_id"],
        ), (seed, g, w)
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)

    # metamorphic: every conjunctive result doc also scores in the
    # disjunctive variant of the same terms (conj ⊆ disj candidates)
    conj = [q for q in queries if q[2] == "conjunctive"]
    if conj:
        disj = [(qid, t, "disjunctive", 10**6) for qid, t, _, _ in conj]
        ddf = spark.createDataFrame(
            [(q, t, m, min(k, 2**31 - 1)) for q, t, m, k in disj], schema=schemas.QUERIES
        )
        dres = topk.bm25_brute_force(docs, ddf).collect()
        dset = {(r["query_id"], r["doc_id"]) for r in dres}
        for g in got:
            if any(g["query_id"] == q[0] for q in conj):
                assert (g["query_id"], g["doc_id"]) in dset


@pytest.mark.parametrize("seed", [11, 42])
def test_must_not_equals_python_reference_on_random_corpus(spark, seed):
    """MUST_NOT property: engine results == (unbounded WAND results minus
    docs containing any neg term), re-ranked — across random corpora,
    random neg sets, and both modes."""
    rng = random.Random(seed * 17 + 3)
    docs_rows = _random_corpus(seed, 300)
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    cfg = IndexConfig(docs_per_shard=64, block_docs=8)
    idx = build_index(docs, cfg)

    queries = []
    for q in range(1, 7):
        terms = sorted(set(rng.choices([f"w{i}" for i in range(50)],
                                       k=rng.randint(1, 4))))
        negs = sorted(set(rng.choices([f"w{i}" for i in range(55)],
                                      k=rng.randint(1, 3))))
        mode = rng.choice(["conjunctive", "disjunctive"])
        queries.append((q, terms, mode, rng.choice([3, 10, 50]), negs))

    unbounded = [(q, t, m, 10**6) for q, t, m, _, _ in queries]
    full = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, unbounded, cfg
    ).collect()
    has_term = {}
    for d, text in docs_rows:
        has_term[d] = set(text.split())
    want = []
    for q, _t, _m, k, negs in queries:
        rows = sorted(
            (-r["score"], r["doc_id"])
            for r in full
            if r["query_id"] == q and not (has_term[r["doc_id"]] & set(negs))
        )[:k]
        want.extend((q, rank, doc, -neg_s)
                    for rank, (neg_s, doc) in enumerate(rows, start=1))
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            queries, cfg,
        ).collect()
    )
    assert got == sorted(want), seed
    # serving path agrees bit-for-bit
    import shutil
    import tempfile

    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans.build import build_index_resumable

    d = tempfile.mkdtemp(prefix="prop_bool_")
    try:
        build_index_resumable(docs, d, cfg)
        assert sorted(IndexServer(d, cfg).query_batch(queries)) == got
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("seed", [11, 57])
def test_weighted_boolean_paged_equal_numpy_on_random_corpus(spark, seed):
    """Randomized 6-tuple (boost + MUST_NOT) queries == the independent
    NumPy oracle, and random pages partition the full ranking."""
    from tests import numpy_oracle

    rng = random.Random(seed * 13 + 1)
    docs_rows = _random_corpus(seed, 300)
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    cfg = IndexConfig(docs_per_shard=64, block_docs=8)
    idx = build_index(docs, cfg)
    queries = []
    for q in range(1, 7):
        terms = sorted(set(rng.choices([f"w{i}" for i in range(52)],
                                       k=rng.randint(1, 4))))
        negs = sorted(set(rng.choices([f"w{i}" for i in range(52)],
                                      k=rng.randint(0, 2))) - set(terms))
        weights = {t: rng.choice([0.25, 0.5, 1.0, 2.0, 4.0]) for t in terms
                   if rng.random() < 0.7}
        queries.append((q, terms, rng.choice(["conjunctive", "disjunctive"]),
                        rng.choice([3, 10, 25]), negs, weights))
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            queries, cfg,
        ).collect()
    )
    want = sorted(numpy_oracle.bm25_topk(dict(docs_rows), queries))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (seed, g, w)
        assert g[3] == pytest.approx(w[3], abs=1e-9)

    # paging partitions the full weighted ranking
    q1 = queries[0]
    deep = [(q1[0], q1[1], q1[2], 24) + tuple(q1[4:])]
    full = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, deep, cfg
        ).collect()
    )
    pages = []
    for off in (0, 9, 18):
        k = min(9, 24 - off)
        pq = [(q1[0], q1[1], q1[2], k) + tuple(q1[4:])]
        pages += [
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in wand.bm25_topk_paged(
                idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
                pq, {q1[0]: off}, cfg,
            ).collect()
        ]
    assert sorted(pages) == full


@pytest.mark.parametrize("seed", [5, 31])
def test_bm25f_merged_equals_python_reference_on_random_corpus(spark, seed):
    """Merged-tf BM25F on seeded random corpora: the distributed operator
    (inverse-saturation block pruning, composite-key cogroup) must equal a
    direct per-doc Python computation of
        Σ_t idf_doc(t)·(k1+1)·tf̃/(tf̃+k1),  tf̃ = Σ_f w_f·tf/(1−b+b·dl_f/avgdl_f)
    across random field splits, weights and block configs."""
    import math

    from pyspark.sql import functions as F

    from bloqsenjin_spark.config import BM25_B, BM25_K1
    from bloqsenjin_spark.functions.text import tokens
    from bloqsenjin_spark.operators import fielded

    rng = random.Random(seed * 13 + 1)
    docs_rows = _random_corpus(seed, 300)
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    head = rng.choice([3, 5, 8])
    t = tokens(F.col("text"))
    field_cols = {
        "title": F.concat_ws(" ", F.slice(t, 1, head)),
        "body": F.concat_ws(
            " ",
            F.when(F.size(t) > head, F.slice(t, head + 1, F.size(t) - head))
            .otherwise(F.array().cast("array<string>")),
        ),
    }
    weights = {"title": rng.choice([0.5, 2.0, 3.0]), "body": 1.0}
    cfg = IndexConfig(docs_per_shard=64 if seed % 2 else 128,
                      block_docs=8 if seed % 2 else 32)
    queries = [
        (q, sorted(set(rng.choices([f"w{i}" for i in range(55)],
                                   k=rng.randint(1, 4)))),
         "disjunctive", rng.choice([3, 10, 50]))
        for q in range(1, 7)
    ]

    idxs = fielded.build_fielded_index(docs, field_cols, cfg)
    tok = topk.tokenized(docs)
    dts = topk.term_stats_df(topk.term_freqs(tok), tok.count())
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in fielded.bm25f_merged_topk(
            idxs, queries, weights, dts, cfg).collect()
    )

    # direct python reference
    k1, b = BM25_K1, BM25_B
    split = {}
    for d, text in docs_rows:
        toks_ = text.split()
        split[d] = {"title": toks_[:head], "body": toks_[head:]}
    n = len(docs_rows)
    avgdl = {f: (sum(len(split[d][f]) for d in split) / n) or 1.0
             for f in ("title", "body")}
    ddf = {}
    for d, text in docs_rows:
        for t_ in set(text.split()):
            ddf[t_] = ddf.get(t_, 0) + 1
    want = []
    for qid, terms, _m, k in queries:
        scored = {}
        for d in split:
            s, hit = 0.0, False
            for t_ in terms:
                tfm = 0.0
                for f in ("body", "title"):
                    tf = split[d][f].count(t_)
                    if tf:
                        dl = len(split[d][f])
                        tfm += weights[f] * tf / (1 - b + b * dl / avgdl[f])
                if tfm > 0:
                    hit = True
                    idf = math.log((n - ddf[t_] + 0.5) / (ddf[t_] + 0.5) + 1.0)
                    s += idf * (k1 + 1.0) * tfm / (tfm + k1)
            if hit:
                scored[d] = s
        ranked = sorted(scored.items(), key=lambda x: (-x[1], x[0]))[:k]
        want += [(qid, r, d, s) for r, (d, s) in enumerate(ranked, 1)]
    want = sorted(want)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (seed, g, w)
        assert g[3] == pytest.approx(w[3], abs=1e-9)
