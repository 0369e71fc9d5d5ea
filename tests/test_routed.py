"""Per-term field routing (round 8): fielded.bm25f_routed_topk vs the
DuckDB oracle, the single-field identity, serving-twin parity, and the DSL
routing of Lucene's 'title:spark body:fast' shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus, oracle
from bloqsenjin_spark.config import SCORE_ROUND_DECIMALS, IndexConfig
from bloqsenjin_spark.functions.text import tokens
from bloqsenjin_spark.operators import fielded, wand
from bloqsenjin_spark.sources import querylang as ql

SF_DIR = "/root/testdata/sf0.001"
CFG = IndexConfig(docs_per_shard=64, block_docs=16)
FIELD_TOKS = {"title": "list_slice(toks, 1, 5)",
              "body": "list_slice(toks, 6, len(toks))"}

RQ = [
    (1, [("title", "the"), ("body", "customer")], "disjunctive", 10),
    (2, [("title", "the"), ("body", "customer")], "conjunctive", 10),
    (3, [("title", "fast"), ("body", "order")], "disjunctive", 8,
     [(None, "merge")]),
    (4, [("title", "the"), ("body", "fast")], "conjunctive", 10,
     [("body", "merge")], {("title", "the"): 2.0}),
    (5, [("title", "customer"), ("title", "order")], "conjunctive", 10),
]


@pytest.fixture(scope="module")
def fidxs(spark):
    docs = corpus.load_table(spark, SF_DIR, "documents")
    t = tokens(F.col("text"))
    return fielded.build_fielded_index(docs, {
        "title": F.concat_ws(" ", F.slice(t, 1, 5)),
        "body": F.concat_ws(
            " ", F.when(F.size(t) > 5, F.slice(t, 6, F.size(t) - 5))
            .otherwise(F.array().cast("array<string>"))),
    }, CFG)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _oracle_rows(sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_routed_vs_oracle(spark, fidxs):
    got = _rows(
        fielded.bm25f_routed_topk(fidxs, RQ, CFG)
        .withColumn("score", F.round("score", SCORE_ROUND_DECIMALS))
    )
    want = _oracle_rows(oracle.bm25f_routed_topk_sql(RQ, FIELD_TOKS))
    assert got == want and len(got) > 0


def test_routed_single_field_identity(spark, fidxs):
    """All clauses on ONE field ≡ bm25_wand_topk on that field's index."""
    ti = fidxs["title"]
    a = _rows(fielded.bm25f_routed_topk(
        fidxs, [(9, [("title", "the"), ("title", "fast")],
                 "conjunctive", 10)], CFG))
    b = _rows(wand.bm25_wand_topk(
        ti.postings, ti.doc_lens, ti.term_stats, ti.avgdl,
        [(9, ["the", "fast"], "conjunctive", 10)], CFG))
    assert [(r[0], r[1], r[2]) for r in a] == [(r[0], r[1], r[2]) for r in b]
    assert all(abs(x[3] - y[3]) < 1e-9 for x, y in zip(a, b))
    assert len(a) > 0


def test_routed_validation(spark, fidxs):
    with pytest.raises(ValueError, match="duplicate"):
        fielded.bm25f_routed_topk(
            fidxs, [(1, [("title", "a")], "disjunctive", 5),
                    (1, [("body", "b")], "disjunctive", 5)], CFG)
    with pytest.raises(ValueError, match="unknown fields"):
        fielded.bm25f_routed_topk(
            fidxs, [(1, [("abstract", "a")], "disjunctive", 5)], CFG)
    with pytest.raises(ValueError, match="negative"):
        fielded.bm25f_routed_topk(
            fidxs, [(1, [("title", "a")], "disjunctive", 5, (),
                     {("title", "a"): -1.0})], CFG)
    with pytest.raises(ValueError, match="no .field, term. clauses"):
        fielded.bm25f_routed_topk(fidxs, [(1, [], "disjunctive", 5)], CFG)


def test_routed_serving_parity(spark, fidxs, tmp_path_factory):
    from bloqsenjin_spark.operators.serving import FieldedIndexServer
    from bloqsenjin_spark.plans.build import write_index

    base = tmp_path_factory.mktemp("routed")
    dirs = {}
    for f, idx in fidxs.items():
        d = str(base / f)
        write_index(idx, d)
        dirs[f] = d
    fsrv = FieldedIndexServer(dirs, CFG)
    want = _rows(fielded.bm25f_routed_topk(fidxs, RQ, CFG))
    got = sorted(fsrv.routed_batch(RQ))
    assert [(q, r, d) for q, r, d, _ in got] == \
           [(q, r, d) for q, r, d, _ in want]
    assert all(abs(a[3] - b[3]) < 1e-9 for a, b in zip(got, want))

    # allow-set + paging compose on both tiers
    docs = corpus.load_table(spark, SF_DIR, "documents")
    evens = docs.where("doc_id % 2 = 0").select("doc_id")
    from bloqsenjin_spark.operators.bitmaps import shard_bitmap_df

    am = shard_bitmap_df(evens, CFG, bitmap_col="allow")
    allow_ids = [r.doc_id for r in evens.collect()]
    sp = _rows(fielded.bm25f_routed_topk(
        fidxs, RQ[:2], CFG, allow_map=am, offsets={1: 2}))
    sv = sorted(fsrv.routed_batch(RQ[:2], allowed_doc_ids=allow_ids,
                                  offsets={1: 2}))
    assert [(q, r, d) for q, r, d, _ in sp] == \
           [(q, r, d) for q, r, d, _ in sv]
    assert all(d % 2 == 0 for _q, _r, d, _s in sv)


def test_dsl_routed_compile():
    c = ql.compile_query(1, ql.parse("title:the body:customer",
                                     default_op="and"), k=10)
    assert c.kind == "routed"
    assert c.payload == (1, [("title", "the"), ("body", "customer")],
                         "conjunctive", 10)
    c = ql.compile_query(2, ql.parse("title:fast^2 OR body:order -merge"),
                         k=5)
    assert c.payload == (2, [("title", "fast"), ("body", "order")],
                         "disjunctive", 5, ((None, "merge"),),
                         {("title", "fast"): 2.0})
    # field-qualified neg beside a single positive field is ALSO routing
    c = ql.compile_query(3, ql.parse("title:a -body:x", default_op="and"),
                         k=5)
    assert c.kind == "routed"
    assert c.payload == (3, [("title", "a")], "conjunctive", 5,
                         (("body", "x"),))
    for bad in ["title:a body:b*", "title:a b", "title:a body:b (c d)",
                'title:a body:b "p q"']:
        with pytest.raises(ql.UnsupportedQueryError):
            ql.compile_query(9, ql.parse(bad, default_op="and"))


def test_dsl_routed_dispatch(spark, fidxs, tmp_path_factory):
    from bloqsenjin_spark.operators.serving import FieldedIndexServer
    from bloqsenjin_spark.plans.build import write_index

    compiled = ql.compile_batch([
        (1, "title:the body:customer", 10),
        (2, "title:fast^2 OR body:order -merge", 10),
    ], default_op="and")
    got = _rows(ql.run_query_batch(None, compiled, fielded_indexes=fidxs))
    want = _rows(fielded.bm25f_routed_topk(fidxs, [
        (1, [("title", "the"), ("body", "customer")], "conjunctive", 10),
        (2, [("title", "fast"), ("body", "order")], "disjunctive", 10,
         ((None, "merge"),), {("title", "fast"): 2.0}),
    ], CFG))
    assert got == want and len(got) > 0
    with pytest.raises(ql.UnsupportedQueryError, match="fielded_indexes"):
        ql.run_query_batch(None, compiled)

    base = tmp_path_factory.mktemp("routed_dsl")
    dirs = {}
    for f, idx in fidxs.items():
        d = str(base / f)
        write_index(idx, d)
        dirs[f] = d
    fsrv = FieldedIndexServer(dirs, CFG)
    sv = sorted(ql.serve_query_batch(fsrv, compiled))
    assert [(q, r, d) for q, r, d, _ in sv] == \
           [(q, r, d) for q, r, d, _ in want]
