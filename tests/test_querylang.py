"""Query-language front end: parser, printer round-trip, loud errors,
compile targets, and dispatch identity (Spark router == hand-written
operator calls; serving router == Spark router)."""

from __future__ import annotations

import pytest

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import wand
from bloqsenjin_spark.plans.build import build_index
from bloqsenjin_spark.sources import querylang as ql
from bloqsenjin_spark.sources.querylang import (
    Compiled,
    ParsedQuery,
    Phrase,
    QueryParseError,
    Term,
    UnsupportedQueryError,
    compile_batch,
    compile_query,
    parse,
    to_string,
)

SF_DIR = "/root/testdata/sf0.001"
CFG = IndexConfig(docs_per_shard=128, block_docs=16, positions=True)


# ---- parser ------------------------------------------------------------------

def test_parse_plain_default_or():
    q = parse("spark engine")
    assert q == ParsedQuery((Term("spark"), Term("engine")), "or")
    assert parse("spark engine", default_op="and").op == "and"


def test_parse_explicit_operators():
    assert parse("spark OR engine").op == "or"
    assert parse("spark AND engine").op == "and"
    # lowercase or/and are terms, not operators
    q = parse("spark or engine")
    assert [t.text for t in q.clauses] == ["spark", "or", "engine"]


def test_parse_modifiers():
    q = parse("data -nsfw fast^2.5 pre* wrod~1 plain~")
    t = q.clauses
    assert t[1].prohibited and t[1].text == "nsfw"
    assert t[2].boost == 2.5
    assert t[3].prefix
    assert t[4].fuzzy == 1
    assert t[5].fuzzy == 2  # bare ~ defaults to Lucene's distance


def test_parse_required_terms_force_and():
    q = parse("+spark +engine")
    assert q.op == "and" and all(t.required for t in q.clauses)


def test_parse_phrases():
    q = parse('"data engine"')
    assert q.clauses == (Phrase(("data", "engine")),)
    q = parse('"data engine"~2')
    assert q.clauses[0].slop == 2 and q.clauses[0].ordered
    q = parse('"engine data"~3u')
    assert q.clauses[0].slop == 3 and not q.clauses[0].ordered


def test_parse_field_and_normalization():
    q = parse("title:Spark title:FAST!")
    assert q.clauses[0] == Term("spark", field="title")
    assert q.clauses[1].text == "fast"
    assert parse('title:"Big Data"').clauses[0] == Phrase(
        ("big", "data"), field="title")


@pytest.mark.parametrize("bad", [
    "", "   ", "OR spark", "spark OR AND engine", '-',
    '"unbalanced', '""', "title: spark", "foo.bar", "spark^x",
    "-nsfw",                      # no positive clause
    "+must optional",             # mixed required/optional
    "+must OR other",             # + contradicts OR
])
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse(bad)


@pytest.mark.parametrize("bad", [
    '+"a phrase"',
])
def test_parse_unsupported(bad):
    with pytest.raises(UnsupportedQueryError):
        parse(bad)


def test_parse_neg_phrase():
    """-"a b" parses as a MUST_NOT phrase clause (round 8); pure MUST_NOT
    still cannot rank."""
    q = parse('spark -"data engine"')
    assert q.clauses[1] == Phrase(("data", "engine"), prohibited=True)
    q2 = parse(to_string(q), default_op=q.op)
    assert q2 == q
    with pytest.raises(QueryParseError):
        parse('-"a phrase"')


ROUND_TRIP = [
    "spark",
    "spark OR engine",
    "spark engine fast",
    "+spark +engine",
    "-nsfw spark^2.5",
    "data^0.25 OR big^2",
    '"data engine"',
    '"data engine"~2',
    '"engine data"~0u',
    "title:spark OR title:fast",
    "pre*",
    "wrod~1",
    "helo~1 OR wrold~1",
    "helo~1 wrold~1",
    'body:"big data"~1u',
]


@pytest.mark.parametrize("s", ROUND_TRIP)
def test_round_trip(s):
    q = parse(s, default_op="and")
    assert parse(to_string(q), default_op=q.op) == q


# ---- compiler ----------------------------------------------------------------

def test_compile_plain_forms():
    c = compile_query(1, parse("spark engine", default_op="and"), k=7)
    assert c.kind == "plain" and c.payload == (1, ["spark", "engine"],
                                               "conjunctive", 7)
    c = compile_query(2, parse("spark OR engine -nsfw"), k=5)
    assert c.payload == (2, ["spark", "engine"], "disjunctive", 5, ("nsfw",))
    c = compile_query(3, parse("the^0.25 OR fast^2"), k=3)
    assert c.payload == (3, ["the", "fast"], "disjunctive", 3, (),
                         {"the": 0.25, "fast": 2.0})


def test_compile_phrase_near_prefix_fuzzy():
    assert compile_query(1, parse('"the fast"'), k=4) == Compiled(
        1, "phrase", (1, "the fast", 4))
    c = compile_query(2, parse('"the fast"~2u'), k=4)
    assert c.kind == "near" and c.payload == (2, "the fast", 4, 2)
    assert not c.ordered
    assert compile_query(3, parse("s*"), k=9).payload == (3, "s", 9)
    assert compile_query(4, parse("spork~1"), k=9).payload == (4, "spork", 1, 9)
    c = compile_query(5, parse("helo~1 wrold~1", default_op="and"), k=9)
    assert c.kind == "fuzzy_multi" and c.payload == (5, ["helo", "wrold"], 1, 9)
    assert c.mode == "conjunctive"  # implicit-AND default carried through
    assert compile_query(6, parse("helo~1 OR wrold~1")).mode == "disjunctive"


def test_compile_field_routing():
    c = compile_query(1, parse("title:spark title:fast"), k=5)
    assert c.field == "title" and c.kind == "plain"
    assert compile_query(2, parse('title:"big data"')).field == "title"


@pytest.mark.parametrize("bad", [
    '"one phrase" "two phrase"',
    "title:spark body:fast*",     # expansion × per-term routing
    "a* b*",                      # multi-prefix
    "pre* loose",
    "pre*^2",                     # boost on expansion (scanner allows, compiler refuses)
    "wrod~1 exact",               # mixed fuzzy/exact
    "wrod~1^2",
    "a~1 b~2",                    # differing distances
    "-pre* spark",                # MUST_NOT expansion
])
def test_compile_unsupported(bad):
    with pytest.raises(UnsupportedQueryError):
        compile_query(1, parse(bad))


def test_compile_batch_duplicate_qids():
    with pytest.raises(ValueError, match="duplicate"):
        compile_batch([(1, "a"), (1, "b")])


# ---- dispatch identity -------------------------------------------------------

@pytest.fixture(scope="module")
def idx(spark):
    docs = corpus.load_table(spark, SF_DIR, "documents")
    return build_index(docs, CFG)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dispatch_matches_direct_operators(spark, idx):
    """One mixed DSL batch == the hand-written per-operator calls."""
    compiled = compile_batch([
        (1, "the OR fast", 10),
        (2, "customer order", 5),          # implicit AND (default below)
        (3, "join hash -merge", 10),
        (4, "the^0.25 OR fast^2", 10),
        (5, '"the fast"', 10),
        (6, '"customer order"~1', 10),
        (7, "s*", 10),
        (8, "spork~1", 10),
        (9, "spork~1 OR quary~1", 10),
    ], default_op="and")
    got = _rows(ql.run_query_batch(idx, compiled, max_expansions=4,
                                   distance_decay=0.5))

    args = (idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl)
    want = []
    want += _rows(wand.bm25_wand_topk(args[0], args[1], args[2], args[3], [
        (1, ["the", "fast"], "disjunctive", 10),
        (2, ["customer", "order"], "conjunctive", 5),
        (3, ["join", "hash"], "conjunctive", 10, ("merge",)),
        (4, ["the", "fast"], "disjunctive", 10, (),
         {"the": 0.25, "fast": 2.0}),
    ], CFG))
    want += _rows(wand.phrase_bm25_topk(*args, [(5, "the fast", 10)], CFG))
    want += _rows(wand.near_bm25_topk(*args, [(6, "customer order", 10, 1)],
                                      CFG))
    want += _rows(wand.prefix_bm25_topk(*args, [(7, "s", 10)], CFG,
                                        max_expansions=4))
    want += _rows(wand.fuzzy_bm25_topk(*args, [(8, "spork", 1, 10)], CFG,
                                       max_expansions=4))
    want += _rows(wand.fuzzy_multi_bm25_topk(
        *args, [(9, ["spork", "quary"], 1, 10)], CFG, max_expansions=4,
        distance_decay=0.5))
    assert got == sorted(want)


def test_dispatch_field_routing(spark, idx):
    """field: queries run on that field's index (single-field forms apply
    to a field index directly)."""
    from pyspark.sql import functions as F

    from bloqsenjin_spark.functions.text import tokens
    from bloqsenjin_spark.operators import fielded

    docs = corpus.load_table(spark, SF_DIR, "documents")
    t = tokens(F.col("text"))
    fidxs = fielded.build_fielded_index(docs, {
        "title": F.concat_ws(" ", F.slice(t, 1, 5)),
        "body": F.concat_ws(
            " ", F.when(F.size(t) > 5, F.slice(t, 6, F.size(t) - 5))
            .otherwise(F.array().cast("array<string>"))),
    }, CFG)
    compiled = compile_batch(
        [(1, "title:the title:fast", 10), (2, 'title:"the fast"', 10)],
        default_op="or")
    got = _rows(ql.run_query_batch(idx, compiled, fielded_indexes=fidxs))
    ti = fidxs["title"]
    want = _rows(wand.bm25_wand_topk(
        ti.postings, ti.doc_lens, ti.term_stats, ti.avgdl,
        [(1, ["the", "fast"], "disjunctive", 10)], CFG))
    want += _rows(wand.phrase_bm25_topk(
        ti.postings, ti.doc_lens, ti.term_stats, ti.avgdl,
        [(2, "the fast", 10)], CFG))
    assert got == sorted(want)
    with pytest.raises(UnsupportedQueryError, match="field"):
        ql.run_query_batch(idx, compiled)  # no fielded_indexes passed


def test_serving_dispatch_identical(spark, tmp_path):
    """Serving router == Spark router, row for row, on the same index."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "dsl_idx")
    build_index_resumable(docs, d, CFG)
    idx = read_index(spark, d, CFG)
    compiled = compile_batch([
        (1, "the OR fast", 10),
        (2, "customer order", 5),
        (3, "join hash -merge", 10),
        (4, '"the fast"', 10),
        (5, '"customer order"~1u', 10),
        (6, "s*", 10),
        (7, "spork~1", 10),
        (8, "spork~1 OR quary~1", 10),
    ], default_op="and")
    spark_rows = sorted(
        tuple(r) for r in ql.run_query_batch(
            idx, compiled, max_expansions=4, distance_decay=0.5).collect()
    )
    srv = IndexServer(d, CFG)
    serve_rows = sorted(ql.serve_query_batch(
        srv, compiled, max_expansions=4, distance_decay=0.5))
    assert [(q, r, d_) for q, r, d_, _ in serve_rows] == \
           [(q, r, d_) for q, r, d_, _ in spark_rows]
    for a, b in zip(serve_rows, spark_rows):
        assert abs(a[3] - b[3]) < 1e-9


# ---- fielded profile (unqualified queries rank ACROSS weighted fields) -------

FIELD_WEIGHTS = {"title": 2.0, "body": 1.0}


def _field_cols():
    from pyspark.sql import functions as F

    from bloqsenjin_spark.functions.text import tokens

    t = tokens(F.col("text"))
    return {
        "title": F.concat_ws(" ", F.slice(t, 1, 5)),
        "body": F.concat_ws(
            " ", F.when(F.size(t) > 5, F.slice(t, 6, F.size(t) - 5))
            .otherwise(F.array().cast("array<string>"))),
    }


@pytest.fixture(scope="module")
def fidxs(spark):
    from bloqsenjin_spark.operators import fielded

    docs = corpus.load_table(spark, SF_DIR, "documents")
    return fielded.build_fielded_index(docs, _field_cols(), CFG)


PROFILE_BATCH = [
    (1, "the OR fast", 10),
    (2, "customer order", 5),            # implicit AND → document-level conj
    (3, "join hash -merge", 10),
    (4, "the^0.25 OR fast^2", 10),       # ^boosts multiply into field weights
    (5, "s*", 10),                       # cross-field prefix expansion
    (6, "spork~1", 10),                  # single fuzzy → 1-word multi identity
    (7, "spork~1 OR quary~1", 10),       # cross-field fuzzy, disjunctive
    (8, "spork~1 quary~1", 10),          # cross-field fuzzy, word-level AND
    (9, "title:the title:fast", 10),     # qualified → that field's index
    (10, '"the fast"', 10),              # cross-field phrase (weighted sum)
    (11, '"customer order"~1', 10),      # cross-field ordered proximity
    (12, '"fast the"~1u', 10),           # cross-field unordered proximity
]


def test_fielded_profile_dispatch(spark, fidxs):
    """With ``field_weights`` set, unqualified queries route to the
    cross-field operators (bm25f_topk / bm25f_prefix_topk /
    bm25f_fuzzy_topk) and field-qualified ones still run on their field's
    index — the mixed batch equals the hand-written per-operator calls."""
    from bloqsenjin_spark.operators import fielded

    compiled = compile_batch(PROFILE_BATCH, default_op="and")
    got = _rows(ql.run_query_batch(
        None, compiled, fielded_indexes=fidxs, field_weights=FIELD_WEIGHTS,
        max_expansions=4, distance_decay=0.5))

    w = FIELD_WEIGHTS
    want = _rows(fielded.bm25f_topk(fidxs, [
        (1, ["the", "fast"], "disjunctive", 10),
        (2, ["customer", "order"], "conjunctive", 5),
        (3, ["join", "hash"], "conjunctive", 10, ("merge",)),
        (4, ["the", "fast"], "disjunctive", 10, (),
         {"the": 0.25, "fast": 2.0}),
    ], w, CFG))
    want += _rows(fielded.bm25f_prefix_topk(
        fidxs, [(5, "s", 10)], w, CFG, max_expansions=4))
    want += _rows(fielded.bm25f_fuzzy_topk(
        fidxs, [(6, ["spork"], 1, 10)], w, CFG, max_expansions=4))
    want += _rows(fielded.bm25f_fuzzy_topk(
        fidxs, [(7, ["spork", "quary"], 1, 10)], w, CFG, max_expansions=4,
        distance_decay=0.5, mode="disjunctive"))
    want += _rows(fielded.bm25f_fuzzy_topk(
        fidxs, [(8, ["spork", "quary"], 1, 10)], w, CFG, max_expansions=4,
        distance_decay=0.5, mode="conjunctive"))
    ti = fidxs["title"]
    want += _rows(wand.bm25_wand_topk(
        ti.postings, ti.doc_lens, ti.term_stats, ti.avgdl,
        [(9, ["the", "fast"], "disjunctive", 10)], CFG))
    want += _rows(fielded.bm25f_phrase_topk(
        fidxs, [(10, "the fast", 10), (11, "customer order", 10, 1)], w,
        CFG))
    want += _rows(fielded.bm25f_phrase_topk(
        fidxs, [(12, "fast the", 10, 1)], w, CFG, ordered=False))
    assert got == sorted(want)
    assert len(got) > 0


def test_fielded_profile_refusals(spark, fidxs):
    with pytest.raises(ValueError, match="fielded_indexes"):
        ql.run_query_batch(None, compile_batch([(1, "a", 5)]),
                           field_weights=FIELD_WEIGHTS)


def test_fielded_profile_serving_identical(spark, tmp_path):
    """Serving router under a fielded profile (FieldedIndexServer) ==
    Spark router on the same per-field indexes, row for row — including a
    field-qualified query defaulting onto the profile's per-field
    servers."""
    from bloqsenjin_spark.operators import fielded
    from bloqsenjin_spark.operators.serving import FieldedIndexServer
    from bloqsenjin_spark.plans import build as B

    docs = corpus.load_table(spark, SF_DIR, "documents")
    field_cols = _field_cols()
    dirs = {}
    for f, expr in field_cols.items():
        d = str(tmp_path / f"qlf_{f}")
        B.build_index_resumable(
            docs.select("doc_id", expr.alias("text")), d, CFG)
        dirs[f] = d
    fidxs = fielded.build_fielded_index(docs, field_cols, CFG)
    fsrv = FieldedIndexServer(dirs, CFG)

    compiled = compile_batch(PROFILE_BATCH, default_op="and")
    spark_rows = sorted(
        tuple(r) for r in ql.run_query_batch(
            None, compiled, fielded_indexes=fidxs,
            field_weights=FIELD_WEIGHTS, max_expansions=4,
            distance_decay=0.5).collect())
    serve_rows = sorted(ql.serve_query_batch(
        fsrv, compiled, field_weights=FIELD_WEIGHTS, max_expansions=4,
        distance_decay=0.5))
    assert [(q, r, d_) for q, r, d_, _ in serve_rows] == \
           [(q, r, d_) for q, r, d_, _ in spark_rows]
    for a, b in zip(serve_rows, spark_rows):
        assert abs(a[3] - b[3]) < 1e-9


# ---- grouped boolean queries ((a b) (c d) → kernel group map) ---------------


def test_parse_groups():
    from bloqsenjin_spark.sources.querylang import Group

    q = parse("(the fast) (customer order)", default_op="and")
    assert all(isinstance(c, Group) for c in q.clauses)
    assert [m.text for m in q.clauses[0].members] == ["the", "fast"]
    q = parse("-(nsfw spam) spark", default_op="and")
    assert q.clauses[0].prohibited
    q = parse("+(a b) +(c d)")
    assert q.op == "and" and all(g.required for g in q.clauses)
    assert parse("(a b^2.5) OR (c d)").clauses[0].members[1].boost == 2.5


@pytest.mark.parametrize("bad", [
    "(a",               # unbalanced
    "()",               # empty
    "(a b))",           # stray close → unexpected char
    "+(a b) optional",  # mixed required/optional
    "(a OR)",           # dangling operator inside a group
])
def test_parse_group_errors(bad):
    with pytest.raises(QueryParseError):
        parse(bad, default_op="and")


# ---- nested boolean expressions (round 8) ------------------------------------

def test_parse_nested_boolean():
    from bloqsenjin_spark.sources.querylang import BoolNode, Group

    q = parse("a AND (b OR (c AND d))")
    assert q.op == "and" and isinstance(q.clauses[1], BoolNode)
    inner = q.clauses[1]
    assert inner.op == "or" and isinstance(inner.children[1], BoolNode)
    assert inner.children[1].op == "and"
    # same-op nesting flattens by associativity: (a (b c)) IS the flat
    # OR-group a ∨ b ∨ c (implicit op inside parens is OR)
    q = parse("(a (b c)) spark", default_op="and")
    assert isinstance(q.clauses[0], Group)
    assert [m.text for m in q.clauses[0].members] == ["a", "b", "c"]
    # single-term parens collapse to the term
    assert parse("(a) b", default_op="and").clauses[0] == Term("a")
    # explicit AND inside parens
    q = parse("(a AND b) OR c")
    assert isinstance(q.clauses[0], BoolNode) and q.clauses[0].op == "and"


def test_parse_hardening():
    """Dangling/consecutive operators and sign-eating normalization refuse
    loudly (round-7 ADVICE)."""
    for bad in ["a OR", "a AND", "a OR OR b", "a OR AND b", "OR a",
                "c)", "a)", "title:-x", "title:+x"]:
        with pytest.raises(QueryParseError):
            parse(bad)


def test_parse_nested_unsupported():
    # MUST_NOT over an AND sub-expression is an OR of exclusions — refused
    with pytest.raises(UnsupportedQueryError):
        parse("-(a AND b) spark")
    # leaves must be plain terms at any depth
    for bad in ["(a AND b*)", "(a AND (b~1 c))", '(a AND "p q")',
                "(a AND title:b)"]:
        with pytest.raises(UnsupportedQueryError):
            parse(bad)


def _group_sets(payload):
    """Normalize a grouped-conjunctive payload's gmap to a set of term-set
    groups (group ids are arbitrary labels)."""
    gmap = payload[6]
    groups: dict = {}
    for t, gids in gmap.items():
        for g in gids:
            groups.setdefault(g, set()).add(t)
    return frozenset(frozenset(v) for v in groups.values())


def test_compile_nested_cnf():
    # a AND (b OR (c AND d))  ≡  a (b c) (b d)  by distributivity
    c = compile_query(1, parse("a AND (b OR (c AND d))"), k=7)
    assert c.kind == "plain" and c.mode == "conjunctive"
    assert c.payload[1] == ["a", "b", "c", "d"]
    flat = compile_query(1, parse("a (b c) (b d)", default_op="and"), k=7)
    assert _group_sets(c.payload) == _group_sets(flat.payload)
    # (a AND b) OR c  ≡  (a c) (b c)
    c = compile_query(2, parse("(a AND b) OR c"), k=5)
    flat = compile_query(2, parse("(a c) (b c)", default_op="and"), k=5)
    assert _group_sets(c.payload) == _group_sets(flat.payload)
    # degenerate shapes collapse to the plain forms
    c = compile_query(3, parse("(a AND b)"), k=5)
    assert c.payload == (3, ["a", "b"], "conjunctive", 5)
    c = compile_query(4, parse("((a b) OR c)"), k=5)
    assert c.payload == (4, ["a", "b", "c"], "disjunctive", 5)
    # negs and boosts ride through
    c = compile_query(5, parse("a^2 AND (b OR (c AND d)) -nsfw"), k=5)
    assert c.payload[4] == ("nsfw",) and c.payload[5] == {"a": 2.0}


def test_compile_nested_cap():
    # 2^7 = 128 CNF groups > 63 — loud refusal naming the cap
    q = " AND ".join(f"(t{i}a AND t{i}b)" for i in range(2))
    # build an OR of ANDs that distributes past the cap: OR over 7
    # two-term AND-nodes → 2^7 = 128 groups
    q = " OR ".join(f"(x{i} AND y{i})" for i in range(7))
    with pytest.raises(UnsupportedQueryError, match="63"):
        compile_query(1, parse(f"({q})", default_op="and"))


NESTED_ROUND_TRIP = [
    "a AND (b OR (c AND d))",
    "(a AND b) OR c",
    "spark (a (b c))",
    "+(a AND b) +c",
]


@pytest.mark.parametrize("s", NESTED_ROUND_TRIP)
def test_nested_round_trip(s):
    q = parse(s, default_op="and")
    assert parse(to_string(q), default_op=q.op) == q


def test_cnf_truth_table_equivalence():
    """Property: for random nested boolean trees, the compiled CNF groups
    are satisfied by EXACTLY the same term-subsets as direct tree
    evaluation — distributivity preserved the boolean function."""
    import itertools
    import random

    from bloqsenjin_spark.sources.querylang import _cnf_of, BoolNode, Group

    terms = ["t0", "t1", "t2", "t3", "t4"]

    def rand_tree(rng, depth):
        if depth == 0 or rng.random() < 0.4:
            return Term(rng.choice(terms))
        op = rng.choice(["and", "or"])
        kids = tuple(rand_tree(rng, depth - 1)
                     for _ in range(rng.randint(2, 3)))
        return BoolNode(kids, op)

    def eval_tree(node, present):
        if isinstance(node, Term):
            return node.text in present
        if isinstance(node, Group):
            return any(m.text in present for m in node.members)
        hits = (eval_tree(c, present) for c in node.children)
        return all(hits) if node.op == "and" else any(hits)

    rng = random.Random(8)
    for _ in range(60):
        tree = rand_tree(rng, 3)
        if isinstance(tree, Term):
            continue
        groups = _cnf_of(tree)
        for r in range(len(terms) + 1):
            for subset in itertools.combinations(terms, r):
                present = set(subset)
                want = eval_tree(tree, present)
                got = all(any(t in present for t in g) for g in groups)
                assert got == want, (tree, sorted(present), groups)


@pytest.mark.parametrize("bad", [
    '("a phrase" b)', "(title:a b)", "(a* b)", "(a~1 b)", "(+a b)",
    "(-a b)",
])
def test_parse_group_unsupported(bad):
    with pytest.raises(UnsupportedQueryError):
        parse(bad, default_op="and")


@pytest.mark.parametrize("bad", [
    '(a b) "a phrase"',   # group × phrase
    "(a b) pre*",         # group × expansion
    "(a b) wrod~1",
    "(a b) title:c",      # group × fielded term
    "(a^1 b) a^2",        # conflicting boosts on one term
])
def test_compile_group_unsupported(bad):
    with pytest.raises(UnsupportedQueryError):
        compile_query(1, parse(bad, default_op="and"))


def test_compile_groups():
    c = compile_query(1, parse("(the fast) (customer order)",
                               default_op="and"), k=10)
    assert c.kind == "plain" and c.mode == "conjunctive"
    assert c.payload == (1, ["customer", "fast", "order", "the"],
                         "conjunctive", 10, (), {},
                         {"customer": (1,), "fast": (0,), "order": (1,),
                          "the": (0,)})
    # OR flattens groups into one disjunction
    c = compile_query(2, parse("(a b) OR (c d^2)"), k=5)
    assert c.payload == (2, ["a", "b", "c", "d"], "disjunctive", 5, (),
                         {"d": 2.0})
    # prohibited group = MUST_NOT term list
    c = compile_query(3, parse("-(nsfw spam) spark", default_op="and"), k=5)
    assert c.payload == (3, ["spark"], "conjunctive", 5, ("nsfw", "spam"))
    # loose positive terms become singleton groups; shared members satisfy
    # both groups
    c = compile_query(4, parse("(a b) c", default_op="and"), k=5)
    assert c.payload[6] == {"a": (0,), "b": (0,), "c": (1,)}
    c = compile_query(5, parse("(a b) (a c)", default_op="and"), k=5)
    assert c.payload[6] == {"a": (0, 1), "b": (0,), "c": (1,)}


GROUP_ROUND_TRIP = ["(a b) (c d)", "-(nsfw spam) spark", "+(a b) +(c d)",
                    "(a b^2.5) OR (c d)"]


@pytest.mark.parametrize("s", GROUP_ROUND_TRIP)
def test_group_round_trip(s):
    q = parse(s, default_op="and")
    assert parse(to_string(q), default_op=q.op) == q


def test_grouped_dispatch_and_serving(spark, tmp_path):
    """Grouped queries dispatch through the plain kernel's 7-slot form on
    BOTH tiers: Spark == hand-built bm25_wand_topk call; serving ==
    Spark; a singleton-group query == the ungrouped conjunctive."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "grp_idx")
    build_index_resumable(docs, d, CFG)
    idx = read_index(spark, d, CFG)
    compiled = compile_batch([
        (1, "(the fast) (customer order)", 10),
        (2, "(the customer) order -merge", 10),
        (3, "(the fast^2) OR (customer order)", 10),
    ], default_op="and")
    got = _rows(ql.run_query_batch(idx, compiled))
    want = _rows(wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, [
            (1, ["customer", "fast", "order", "the"], "conjunctive", 10, (),
             {}, {"customer": (1,), "fast": (0,), "order": (1,),
                  "the": (0,)}),
            (2, ["customer", "order", "the"], "conjunctive", 10, ("merge",),
             {}, {"customer": (0,), "order": (1,), "the": (0,)}),
            (3, ["customer", "fast", "order", "the"], "disjunctive", 10, (),
             {"fast": 2.0}),
        ], CFG))
    assert got == sorted(want) and len(got) > 0

    srv = IndexServer(d, CFG)
    serve_rows = sorted(ql.serve_query_batch(srv, compiled))
    spark_rows = sorted(tuple(r) for r in ql.run_query_batch(
        idx, compiled).collect())
    assert [(q, r, d_) for q, r, d_, _ in serve_rows] == \
           [(q, r, d_) for q, r, d_, _ in spark_rows]
    for a, b in zip(serve_rows, spark_rows):
        assert abs(a[3] - b[3]) < 1e-9

    # singleton groups ≡ ungrouped document-level conjunctive
    g = _rows(ql.run_query_batch(idx, compile_batch(
        [(1, "(customer) (order)", 10)], default_op="and")))
    u = _rows(ql.run_query_batch(idx, compile_batch(
        [(1, "customer order", 10)], default_op="and")))
    assert g == u and len(g) > 0


def test_grouped_fielded_profile(spark, fidxs):
    """Grouped queries under a fielded profile ride bm25f_topk's 7-slot
    group-map tuples: every group must match in SOME field."""
    from bloqsenjin_spark.operators import fielded

    compiled = compile_batch([(1, "(the fast) (customer order)", 10)],
                             default_op="and")
    got = _rows(ql.run_query_batch(
        None, compiled, fielded_indexes=fidxs, field_weights=FIELD_WEIGHTS))
    want = _rows(fielded.bm25f_topk(fidxs, [
        (1, ["customer", "fast", "order", "the"], "conjunctive", 10, (), {},
         {"customer": (1,), "fast": (0,), "order": (1,), "the": (0,)}),
    ], FIELD_WEIGHTS, CFG))
    assert got == sorted(want) and len(got) > 0


def test_nested_boolean_fielded_profile(spark, fidxs):
    """NESTED boolean expressions under a fielded profile (round 8): the
    CNF groups ride the same 7-slot bm25f path — every CNF group must
    match in SOME field."""
    from bloqsenjin_spark.operators import fielded

    compiled = compile_batch(
        [(1, "the AND (customer OR (order AND fast))", 10)],
        default_op="and")
    got = _rows(ql.run_query_batch(
        None, compiled, fielded_indexes=fidxs, field_weights=FIELD_WEIGHTS))
    want = _rows(fielded.bm25f_topk(fidxs, [
        (1, ["customer", "fast", "order", "the"], "conjunctive", 10, (), {},
         {"customer": (1, 2), "fast": (1,), "order": (2,), "the": (0,)}),
    ], FIELD_WEIGHTS, CFG))
    assert got == sorted(want) and len(got) > 0


# ---- wildcard terms (Lucene WildcardQuery: ? = one char, * = any run) -------


def test_parse_wildcards():
    c = parse("or?er", default_op="and").clauses[0]
    assert c.wild and c.text == "or?er"
    c = parse("c**tom*", default_op="and").clauses[0]
    assert c.wild and c.text == "c*tom*"   # '*' runs collapse
    c = parse("pre*", default_op="and").clauses[0]
    assert c.prefix and not c.wild         # trailing-only '*' stays prefix
    c = parse("title:or?er", default_op="and").clauses[0]
    assert c.wild and c.field == "title"
    with pytest.raises(QueryParseError):
        parse("a.b*c")                     # dirty literal segment
    with pytest.raises(QueryParseError):
        parse("pre*~1")                    # expansion × fuzzy stays refused


@pytest.mark.parametrize("bad", [
    "*rder", "?rder",                      # leading wildcard
    "or?er extra",                         # wildcard × loose term
    "or?er pre*",                          # wildcard × prefix
    "or?er^2",                             # boost on expansion
    "-or?er spark",                        # MUST_NOT expansion
    "(or?er b)",                           # wildcard inside a group
    "(a b) or?er",                         # group × wildcard
])
def test_compile_wildcard_unsupported(bad):
    with pytest.raises(UnsupportedQueryError):
        compile_query(1, parse(bad, default_op="and"))


def test_wildcard_round_trip():
    for s in ["or?er", "c*tom*", "t?e*r?s"]:
        q = parse(s, default_op="and")
        assert parse(to_string(q), default_op="and") == q


def test_wildcard_dispatch_and_serving(spark, tmp_path):
    """Wildcard queries == hand-written wildcard_bm25_topk; serving twin
    row-identical; 'pre*'-equivalent patterns match prefix results; the
    engine refuses leading wildcards on both tiers."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path / "wc_idx")
    build_index_resumable(docs, d, CFG)
    idx = read_index(spark, d, CFG)
    args = (idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl)
    compiled = compile_batch([
        (1, "or?er", 10),
        (2, "c*tom*", 10),
        (3, "t?e", 10),
    ], default_op="and")
    got = _rows(ql.run_query_batch(idx, compiled, max_expansions=8))
    want = _rows(wand.wildcard_bm25_topk(
        *args, [(1, "or?er", 10), (2, "c*tom*", 10), (3, "t?e", 10)],
        CFG, max_expansions=8))
    assert got == sorted(want) and len(got) > 0

    # a trailing-* pattern with an inner wildcard ranks like the matching
    # prefix expansion when the regex accepts the same term set
    wc = _rows(wand.wildcard_bm25_topk(*args, [(9, "custome*", 10)], CFG,
                                       max_expansions=8))
    pf = _rows(wand.prefix_bm25_topk(*args, [(9, "custome", 10)], CFG,
                                     max_expansions=8))
    assert wc == pf and len(wc) > 0

    srv = IndexServer(d, CFG)
    serve_rows = sorted(ql.serve_query_batch(srv, compiled,
                                             max_expansions=8))
    spark_rows = sorted(tuple(r) for r in ql.run_query_batch(
        idx, compiled, max_expansions=8).collect())
    assert [(q, r, d_) for q, r, d_, _ in serve_rows] == \
           [(q, r, d_) for q, r, d_, _ in spark_rows]
    for a, b in zip(serve_rows, spark_rows):
        assert abs(a[3] - b[3]) < 1e-9

    with pytest.raises(ValueError, match="leading wildcard"):
        wand.wildcard_bm25_topk(*args, [(1, "*rder", 5)], CFG)
    with pytest.raises(ValueError, match="leading wildcard"):
        srv.wildcard_topk_batch([(1, "*rder", 5)])
    # lazy stats mode: same pruned-read machinery, identical rows
    lazy = IndexServer(d, CFG, stats_mode="lazy")
    assert sorted(lazy.wildcard_topk_batch(
        [(1, "or?er", 10), (2, "c*tom*", 10)], max_expansions=8)) == \
        sorted(srv.wildcard_topk_batch(
            [(1, "or?er", 10), (2, "c*tom*", 10)], max_expansions=8))


def test_wildcard_fielded_profile(spark, fidxs):
    """Unqualified wildcards under a fielded profile expand on the
    cross-field vocabulary and rank with bm25f; single-field identity."""
    from bloqsenjin_spark.operators import fielded

    compiled = compile_batch([(1, "f?st*", 10)], default_op="and")
    got = _rows(ql.run_query_batch(
        None, compiled, fielded_indexes=fidxs, field_weights=FIELD_WEIGHTS,
        max_expansions=8))
    want = _rows(fielded.bm25f_wildcard_topk(
        fidxs, [(1, "f?st*", 10)], FIELD_WEIGHTS, CFG, max_expansions=8))
    assert got == sorted(want) and len(got) > 0
    # weights {all: 1} over one whole index ≡ the single-index operator
    docs = corpus.load_table(spark, SF_DIR, "documents")
    idx = build_index(docs, CFG)
    one = _rows(fielded.bm25f_wildcard_topk(
        {"all": idx}, [(2, "or?er", 10)], {"all": 1.0}, CFG,
        max_expansions=8))
    single = _rows(wand.wildcard_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        [(2, "or?er", 10)], CFG, max_expansions=8))
    assert one == single and len(one) > 0
