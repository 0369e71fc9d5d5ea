"""Phrase × loose-terms composition (round 8): the composed operator
wand.phrase_terms_bm25_topk vs the DuckDB oracle, the degenerate phrase
identity, serving-twin parity, allow/paging composition, and the DSL
routing of Lucene's BooleanQuery-with-a-phrase-clause shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus, oracle
from bloqsenjin_spark.config import SCORE_ROUND_DECIMALS, IndexConfig
from bloqsenjin_spark.operators import wand
from bloqsenjin_spark.plans.build import build_index
from bloqsenjin_spark.sources import querylang as ql

SF_DIR = "/root/testdata/sf0.001"
CFG = IndexConfig(docs_per_shard=64, block_docs=16, positions=True)

QUERIES = [
    (1, "the fast", ["customer"], "disjunctive", 10),
    (2, "the fast", ["customer"], "conjunctive", 10),
    (3, "customer order", ["the", "fast"], "disjunctive", 8, ("merge",)),
    (4, "the fast", ["customer", "order"], "conjunctive", 10, (),
     {"customer": 2.0}),
    (5, "customer order", [], "disjunctive", 10, ("merge",)),  # phrase −term
    (6, "customer order", ["fast"], "disjunctive", 10, (), {}, 1),  # slop 1
    (7, "the", ["fast"], "disjunctive", 10),  # 1-token phrase
]


@pytest.fixture(scope="module")
def idx(spark):
    docs = corpus.load_table(spark, SF_DIR, "documents")
    return build_index(docs, CFG)


def _oracle_rows(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_phrase_terms_vs_oracle(spark, idx):
    got = _rows(
        wand.phrase_terms_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            QUERIES, CFG,
        ).withColumn("score", F.round("score", SCORE_ROUND_DECIMALS))
    )
    want = _oracle_rows(oracle.phrase_terms_topk_sql(QUERIES))
    assert got == want and len(got) > 0


def test_phrase_terms_unordered_vs_oracle(spark, idx):
    q = [(21, "fast the", ["customer"], "disjunctive", 10, (), {}, 1)]
    got = _rows(
        wand.phrase_terms_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, q, CFG,
            ordered=False,
        ).withColumn("score", F.round("score", SCORE_ROUND_DECIMALS))
    )
    want = _oracle_rows(oracle.phrase_terms_topk_sql(q, ordered=False))
    assert got == want and len(got) > 0


def test_phrase_terms_degenerates_to_phrase(spark, idx):
    """loose=[] ≡ phrase_bm25_topk (and with slop ≡ near_bm25_topk)."""
    pq = [(11, "customer order", 10), (12, "the fast", 10)]
    a = _rows(wand.phrase_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, pq, CFG))
    b = _rows(wand.phrase_terms_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        [(q, p, [], "disjunctive", k) for q, p, k in pq], CFG))
    assert [(r[0], r[1], r[2]) for r in a] == [(r[0], r[1], r[2]) for r in b]
    assert all(abs(x[3] - y[3]) < 1e-9 for x, y in zip(a, b))
    assert len(a) > 0


def test_phrase_terms_serving_parity(spark, tmp_path_factory):
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index
    from bloqsenjin_spark.operators.serving import IndexServer

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path_factory.mktemp("pt") / "idx")
    build_index_resumable(docs, d, CFG)
    idx = read_index(spark, d, CFG)
    sp = _rows(wand.phrase_terms_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, QUERIES[:6],
        CFG))
    srv = IndexServer(d, CFG)
    sv = sorted(srv.phrase_terms_topk_batch(QUERIES[:6]))
    assert [(q, r, dd) for q, r, dd, _ in sp] == \
           [(q, r, dd) for q, r, dd, _ in sv]
    assert all(abs(a[3] - b[3]) < 1e-9 for a, b in zip(sp, sv))
    assert len(sp) > 0

    # allow-set + deep paging compose identically on both tiers
    from bloqsenjin_spark.operators.bitmaps import shard_bitmap_df

    evens = docs.where("doc_id % 2 = 0").select("doc_id")
    am = shard_bitmap_df(evens, CFG, bitmap_col="allow")
    allow_ids = [r.doc_id for r in evens.collect()]
    sp2 = _rows(wand.phrase_terms_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, QUERIES[:4],
        CFG, allow_map=am, offsets={1: 3}))
    sv2 = sorted(srv.phrase_terms_topk_batch(
        QUERIES[:4], allowed_doc_ids=allow_ids, offsets={1: 3}))
    assert [(q, r, dd) for q, r, dd, _ in sp2] == \
           [(q, r, dd) for q, r, dd, _ in sv2]
    assert all(abs(a[3] - b[3]) < 1e-9 for a, b in zip(sp2, sv2))
    assert all(d % 2 == 0 for _q, _r, d, _s in sv2)

    # lazy stats mode serves identically
    srvl = IndexServer(d, CFG, stats_mode="lazy")
    assert sorted(srvl.phrase_terms_topk_batch(QUERIES[:6])) == sv


def test_phrase_terms_validation(spark, idx):
    args = (idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl)
    with pytest.raises(ValueError, match="duplicate"):
        wand.phrase_terms_bm25_topk(
            *args, [(1, "a b", [], "disjunctive", 5),
                    (1, "c d", [], "disjunctive", 5)], CFG)
    with pytest.raises(ValueError, match="empty phrase"):
        wand.phrase_terms_bm25_topk(
            *args, [(1, "!!", ["a"], "disjunctive", 5)], CFG)
    with pytest.raises(ValueError, match="negative"):
        wand.phrase_terms_bm25_topk(
            *args, [(1, "a b", ["c"], "disjunctive", 5, (), {"c": -1.0})],
            CFG)
    with pytest.raises(ValueError, match="mode"):
        wand.phrase_terms_bm25_topk(
            *args, [(1, "a b", ["c"], "both", 5)], CFG)


def test_dsl_phrase_terms_compile():
    c = ql.compile_query(1, ql.parse('"the fast" customer -merge'), k=10)
    assert c.kind == "phrase_terms"
    assert c.payload == (1, "the fast", ["customer"], "disjunctive", 10,
                         ("merge",))
    c = ql.compile_query(2, ql.parse('"the fast" customer order',
                                     default_op="and"), k=5)
    assert c.payload == (2, "the fast", ["customer", "order"],
                         "conjunctive", 5)
    c = ql.compile_query(3, ql.parse('"customer order"~1 fast^2'), k=5)
    assert c.payload == (3, "customer order", ["fast"], "disjunctive", 5,
                         (), {"fast": 2.0}, 1)
    assert c.ordered
    c = ql.compile_query(4, ql.parse('"customer order" -merge'), k=5)
    assert c.kind == "phrase_terms"
    assert c.payload == (4, "customer order", [], "disjunctive", 5,
                         ("merge",))
    # pure phrase stays on the dedicated (verified) phrase path
    assert ql.compile_query(5, ql.parse('"the fast"'), k=5).kind == "phrase"
    # field-qualified variant routes to that field's index
    c = ql.compile_query(6, ql.parse('title:"the fast" title:customer'), k=5)
    assert c.kind == "phrase_terms" and c.field == "title"
    c = ql.compile_query(7, ql.parse('"fast the"~1u customer'), k=5)
    assert not c.ordered and c.payload[7] == 1
    for bad in ['"the fast" pre*', '"the fast" wrod~1', '"a b" title:c',
                '"a b" (c d)', '"a b" "c d"']:
        with pytest.raises(ql.UnsupportedQueryError):
            ql.compile_query(9, ql.parse(bad))


MNP_Q = [(1, ["the", "fast"], "disjunctive", 10),
         (2, ["customer", "order"], "conjunctive", 10, ("merge",))]
MNP_NEG = ["customer order", ("the fast", 1)]


def test_must_not_phrase_vs_oracle(spark, idx):
    """spark -"data engine": the phrase match set rides as a per-shard
    exclusion bitmap OR-merged into the tombstone side-input — exact
    (masked before per-shard k-truncation), vs an ANTI-JOIN + re-rank
    oracle."""
    got = _rows(
        wand.bm25_topk_must_not_phrase(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            MNP_Q, MNP_NEG, CFG,
        ).withColumn("score", F.round("score", SCORE_ROUND_DECIMALS))
    )
    neg_map = {qid: [("customer order", 0, True), ("the fast", 1, True)]
               for qid in (1, 2)}
    want = _oracle_rows(oracle.must_not_phrase_topk_sql(MNP_Q, neg_map))
    assert got == want and len(got) > 0
    # the exclusion demonstrably bites
    base = _rows(wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, MNP_Q, CFG))
    assert [(r[0], r[2]) for r in got] != [(r[0], r[2]) for r in base]


def test_must_not_phrase_dsl_and_serving(spark, tmp_path_factory):
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    c = ql.compile_query(1, ql.parse('spark -"data engine"'), k=5)
    assert c.kind == "plain"
    assert c.must_not_phrases == (("data engine", 0, True),)
    c = ql.compile_query(
        2, ql.parse('spark engine -"fast the"~1u -nsfw', default_op="and"),
        k=5)
    assert c.must_not_phrases == (("fast the", 1, False),)
    assert c.payload[4] == ("nsfw",)
    for bad in ['"a b" -"c d"', '(a b) -"c d"', 'a* -"c d"',
                # routed × neg-phrase: the exclusion bitmap is per-index
                'title:a body:b -"c d"',
                'title:a title:b -x -title:"c d"']:
        with pytest.raises(ql.UnsupportedQueryError):
            ql.compile_query(9, ql.parse(bad, default_op="and"))
    with pytest.raises(ql.QueryParseError):
        ql.parse('-"a b"')  # pure MUST_NOT cannot rank
    # round-8 review fixes: field-qualified MUST_NOT must not silently
    # widen on the phrase×terms / nested paths
    with pytest.raises(ql.UnsupportedQueryError, match="SAME"):
        ql.compile_query(9, ql.parse('"data engine" spark -title:nsfw'))
    with pytest.raises(ql.UnsupportedQueryError, match="field"):
        ql.compile_query(9, ql.parse('(a AND (b OR c)) -title:x',
                                     default_op="and"))
    # +required terms beside a phrase: the documented AND-mode form works
    c = ql.compile_query(9, ql.parse('"data engine" +x'))
    assert c.kind == "phrase_terms" and c.mode == "conjunctive"
    c = ql.compile_query(9, ql.parse('+x +y -"data engine"'))
    assert c.kind == "plain" and c.mode == "conjunctive"
    assert c.must_not_phrases == (("data engine", 0, True),)

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path_factory.mktemp("mnp") / "idx")
    build_index_resumable(docs, d, CFG)
    idx = read_index(spark, d, CFG)
    compiled = ql.compile_batch([
        (1, 'the OR fast -"customer order"', 10),
        (2, 'customer order -"fast the"~1u', 10),
    ], default_op="and")
    sp = _rows(ql.run_query_batch(idx, compiled))
    srv = IndexServer(d, CFG)
    sv = sorted(ql.serve_query_batch(srv, compiled))
    assert [(q, r, dd) for q, r, dd, _ in sp] == \
           [(q, r, dd) for q, r, dd, _ in sv]
    assert all(abs(a[3] - b[3]) < 1e-9 for a, b in zip(sp, sv))
    assert len(sp) > 0


def test_dsl_phrase_terms_dispatch(spark, idx):
    compiled = ql.compile_batch([
        (1, '"the fast" customer', 10),
        (2, '"customer order"~1u fast', 10),
        (3, '"customer order" -merge', 10),
    ], default_op="and")
    got = _rows(ql.run_query_batch(idx, compiled))
    args = (idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl)
    want = sorted(
        _rows(wand.phrase_terms_bm25_topk(
            *args, [(1, "the fast", ["customer"], "conjunctive", 10)], CFG))
        + _rows(wand.phrase_terms_bm25_topk(
            *args,
            [(2, "customer order", ["fast"], "conjunctive", 10, (), {}, 1)],
            CFG, ordered=False))
        + _rows(wand.phrase_terms_bm25_topk(
            *args, [(3, "customer order", [], "disjunctive", 10,
                     ("merge",))], CFG))
    )
    assert got == want and len(got) > 0
