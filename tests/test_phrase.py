"""Phrase search: positional index (position-intersection verify, no corpus
scan) + the positionless two-stage fallback — both must agree with the
substring-on-normalized-text reference semantics."""

from __future__ import annotations

import numpy as np
import pytest

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.functions.codec import (
    segmented_delta_decode,
    segmented_delta_encode,
)
from bloqsenjin_spark.operators import wand
from bloqsenjin_spark.plans.build import build_index

CFG = IndexConfig(docs_per_shard=128, block_docs=16)
CFG_POS = IndexConfig(docs_per_shard=128, block_docs=16, positions=True)
# tiny blocks/shards so phrase hits straddle block AND shard boundaries
CFG_POS_TINY = IndexConfig(docs_per_shard=4, block_docs=2, positions=True)


def _run_twostage(spark, docs, phrases, cfg=CFG):
    idx = build_index(docs, cfg)
    return {
        (r["query_id"], r["doc_id"])
        for r in wand.phrase_match_twostage(
            docs, idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            phrases, cfg,
        ).collect()
    }


def _run_positional(spark, docs, phrases, cfg=CFG_POS):
    idx = build_index(docs, cfg)
    return {
        (r["query_id"], r["doc_id"])
        for r in wand.phrase_match_positional(idx.postings, phrases, cfg).collect()
    }


def _reference(docs_rows, phrases):
    import re

    want = set()
    for r in docs_rows:
        text = r["text"] or ""
        norm = " " + " ".join(t for t in re.split("[^a-z0-9]+", text.lower()) if t) + " "
        for qid, p in phrases:
            pn = " " + " ".join(t for t in re.split("[^a-z0-9]+", p.lower()) if t) + " "
            if pn.strip() and pn in norm:
                want.add((qid, r["doc_id"]))
    return want


SEMANTICS_DOCS = [
    (0, "alpha beta gamma"),
    (1, "beta alpha gamma"),          # terms present, order wrong
    (2, "x alpha beta y"),
    (3, "Alpha... BETA!"),            # normalization
    (4, "alpha x beta"),              # not adjacent
    (5, "alpha"),                     # missing term
    (6, ""),
]


@pytest.mark.parametrize("runner", [_run_twostage, _run_positional])
def test_phrase_semantics(spark, runner):
    docs = spark.createDataFrame(SEMANTICS_DOCS, "doc_id long, text string")
    got = runner(spark, docs, [(1, "alpha beta")])
    assert got == {(1, 0), (1, 2), (1, 3)}


def test_phrase_repeated_term_and_long(spark):
    docs = spark.createDataFrame(
        [
            (0, "the the end"),
            (1, "the end the"),         # 'the the' not adjacent
            (2, "a b a b a"),
            (3, "b a b"),
            (4, "one two three four"),
        ],
        "doc_id long, text string",
    )
    phrases = [(1, "the the"), (2, "a b a b"), (3, "two three four")]
    got = _run_positional(spark, docs, phrases)
    assert got == {(1, 0), (2, 2), (3, 4)}


def test_phrase_across_block_and_shard_boundaries(spark):
    # 10 docs, docs_per_shard=4, block_docs=2 → matches in shards 0,1,2 and
    # several distinct blocks; also a doc long enough that positions span
    # multiple varint bytes (positions > 127)
    rows = []
    for d in range(10):
        filler = " ".join(f"w{d}x{i}" for i in range(130))
        text = f"{filler} needle point {filler}" if d % 3 == 0 else f"{filler} needle x point"
        rows.append((d, text))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    phrases = [(7, "needle point")]
    got = _run_positional(spark, docs, phrases, cfg=CFG_POS_TINY)
    assert got == {(7, d) for d in range(10) if d % 3 == 0}


@pytest.mark.parametrize("runner", [_run_twostage, _run_positional])
def test_phrase_vs_python_reference(spark, runner):
    docs_df = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    phrases = [(1, "the fast"), (2, "customer order"), (3, "zebra stripes")]
    got = runner(spark, docs_df, phrases)
    want = _reference(docs_df.collect(), phrases)
    assert got == want
    assert any(q == 1 for q, _ in got)  # corpus really contains 'the fast'
    assert not any(q == 3 for q, _ in got)


def test_positional_plan_never_scans_corpus(spark):
    """The physical plan of the positional phrase query must read ONLY the
    postings relation — no documents scan, no second tokenize."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    out = wand.phrase_match_positional(idx.postings, [(1, "the fast")], CFG_POS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the documents parquet appears only via the build subtree feeding
    # postings; the phrase query side is FlatMapGroupsInPandas over the
    # postings relation. Assert no scan of the documents table text column
    # above the posting construction: the two-stage plan contained a
    # BroadcastHashJoin against a tokenized corpus projection.
    assert "FlatMapGroupsInPandas" in plan
    assert "contains(" not in plan  # two-stage verify predicate is gone


def test_phrase_positional_survives_merge(spark):
    """merge(build(A), build(B)) must carry positions: phrase results on the
    merged index == reference over A ∪ B."""
    from bloqsenjin_spark.operators.merge import merge_indexes

    rows = [(d, f"pad{d} needle point tail{d}" if d % 2 else f"pad{d} needle tail{d}")
            for d in range(10)]
    a = spark.createDataFrame(rows[:5], "doc_id long, text string")
    b = spark.createDataFrame(rows[5:], "doc_id long, text string")
    merged = merge_indexes(
        build_index(a, CFG_POS_TINY), build_index(b, CFG_POS_TINY), CFG_POS_TINY
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in wand.phrase_match_positional(
            merged.postings, [(1, "needle point")], CFG_POS_TINY
        ).collect()
    }
    assert got == {(1, d) for d in range(10) if d % 2}


def test_phrase_positional_survives_purge(spark, tmp_path):
    """Tombstone purge rewrites shards; surviving docs' positions must stay
    intact and deleted docs must stop matching."""
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index
    from bloqsenjin_spark.plans.deletes import delete_docs, purge_deletes

    rows = [(d, f"pad{d} needle point tail{d}") for d in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = str(tmp_path / "posidx")
    build_index_resumable(docs, d, CFG_POS_TINY)
    delete_docs(spark, d, [2, 5])
    purge_deletes(spark, d)
    idx = read_index(spark, d)
    assert idx.cfg.positions
    got = {
        r["doc_id"]
        for r in wand.phrase_match_positional(
            idx.postings, [(1, "needle point")], idx.cfg
        ).collect()
    }
    assert got == {0, 1, 3, 4, 6, 7}


def test_phrase_bm25_topk_composition(spark):
    """phrase_bm25_topk == (exact phrase matches) ∩ (brute-force BM25 over the
    phrase terms), re-ranked — verified against the independent brute scorer."""
    import pytest as _pt

    from bloqsenjin_spark.operators import topk

    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    phrases = [(1, "the fast", 5), (2, "customer order", 3)]
    got = wand.phrase_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, phrases, CFG_POS
    ).collect()
    matches = _reference(docs.collect(), [(q, p) for q, p, _ in phrases])
    conj = [(q, sorted({t for t in p.lower().split()}), "conjunctive", 10**6)
            for q, p, _ in phrases]
    brute = topk.bm25_brute_force(
        docs, spark.createDataFrame(conj, "query_id long, terms array<string>, "
                                    "mode string, k int"))
    scores = {(r["query_id"], r["doc_id"]): r["score"] for r in brute.collect()}
    want = {}
    for (q, d), s in scores.items():
        if (q, d) in matches:
            want.setdefault(q, []).append((-s, d))
    expect = []
    for q, _, k in phrases:
        for rank, (neg_s, d) in enumerate(sorted(want.get(q, []))[:k], start=1):
            expect.append((q, rank, d, -neg_s))
    got_t = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in got)
    assert len(got_t) == len(expect) > 0
    for g, w in zip(got_t, sorted(expect)):
        assert g[:3] == w[:3]
        assert g[3] == _pt.approx(w[3], abs=1e-9)


def test_phrase_topk_window_input_is_match_bounded(spark, tmp_path):
    """Scale property of the single-pass phrase top-k plan: the global rank
    window reads ONLY per-shard-k-truncated PHRASE-MATCH partials — bounded by
    min(|phrase matches|, shards × k) — never the conjunctive match set of
    the phrase's terms (the round-2 plan scored every doc containing {the,
    fast} with k=2^30 before filtering; that set is corpus-scale for common
    terms)."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    phrases = [(1, "the fast", 3), (2, "customer order", 2)]
    partial = wand.phrase_score_partials(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, phrases, CFG_POS
    ).collect()
    matches = _reference(docs.collect(), [(q, p) for q, p, _ in phrases])
    assert len(matches) > 5  # non-degenerate fixture
    # every partial row IS a phrase match…
    assert {(r["query_id"], r["doc_id"]) for r in partial} <= matches
    # …and per (query, shard) the partial is k-truncated
    from collections import Counter

    per = Counter(
        (r["query_id"], r["doc_id"] // CFG_POS.docs_per_shard) for r in partial
    )
    kmap = {q: k for q, _, k in phrases}
    assert all(c <= kmap[q] for (q, _s), c in per.items())
    # conjunctive candidates of {the, fast} are corpus-scale vs the match set:
    # the window input must be ≤ |matches| (strictly smaller here thanks to
    # the per-shard truncation)
    assert len(partial) <= len(matches)
    # plan shape over a persisted index (no build subtree in the plan): ONE
    # cogrouped pass feeding the window — no separate match pass, no join
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    d = str(tmp_path / "pidx")
    build_index_resumable(docs, d, CFG_POS)
    ridx = read_index(spark, d)
    out = wand.phrase_bm25_topk(
        ridx.postings, ridx.doc_lens, ridx.term_stats, ridx.avgdl, phrases, ridx.cfg
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapCoGroupsInPandas") == 1
    assert "FlatMapGroupsInPandas" not in plan  # no separate match pass
    assert "Join" not in plan


def test_wand_scan_prunes_positions(spark, tmp_path):
    """BM25 scoring over a positional index must not read the positional
    payload: the postings FileScan schema excludes `positions` and the
    term IN (...) filter reaches the scan."""
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    d = str(tmp_path / "pidx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs, d, CFG_POS)
    idx = read_index(spark, d)
    out = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        corpus.REFERENCE_QUERIES, idx.cfg,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the postings scan is the FileScan carrying doc_deltas (plan lines
    # truncate before the file path)
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l and "doc_deltas" in l]
    assert scan_lines, plan
    assert all("positions" not in l for l in scan_lines)
    assert "INSET" in plan or "In(term" in plan  # pushed term filter


def test_positional_postings_roundtrip(spark):
    """decode(build(docs, positions=True)) returns the exact (term, doc_id,
    tf, positions) relation — positions must equal the tokenizer's ground
    truth for every posting."""
    import re

    from bloqsenjin_spark.operators.postings import decode_postings

    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    got = {
        (r["term"], r["doc_id"]): list(r["pos"])
        for r in decode_postings(idx.postings, CFG_POS, positions=True).collect()
    }
    want: dict = {}
    for r in docs.collect():
        toks = [t for t in re.split("[^a-z0-9]+", (r["text"] or "").lower()) if t]
        for i, t in enumerate(toks):
            want.setdefault((t, r["doc_id"]), []).append(i)
    assert got == want


def test_segmented_codec_roundtrip():
    rng = np.random.RandomState(7)
    for _ in range(50):
        n_seg = rng.randint(1, 9)
        segs = [
            np.sort(rng.choice(20000, size=rng.randint(1, 40), replace=False))
            for _ in range(n_seg)
        ]
        flat = np.concatenate(segs)
        lens = np.array([len(s) for s in segs])
        blob = segmented_delta_encode(flat, lens)
        back = segmented_delta_decode(blob, lens)
        assert np.array_equal(back, flat)
    # empty
    assert segmented_delta_decode(b"", np.array([])).size == 0


def test_topk_highlights_positions_and_plan(spark, tmp_path):
    """topk_highlights returns, for every ranked doc, exactly the tokenizer
    ground-truth positions of the query terms — from the positional index
    only (no documents scan), with the decode pruned to the ranked docs'
    blocks."""
    import re

    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    d = str(tmp_path / "hidx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs, d, CFG_POS)
    idx = read_index(spark, d)
    queries = [(1, ["the", "fast"], "disjunctive", 3),
               (2, ["customer"], "conjunctive", 2)]
    out = wand.topk_highlights(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, queries, idx.cfg
    )
    rows = out.collect()
    tk = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            queries, idx.cfg,
        ).collect()
    }
    text = {r["doc_id"]: (r["text"] or "") for r in docs.collect()}
    want = set()
    for (q, doc), rank in tk.items():
        toks = [t for t in re.split("[^a-z0-9]+", text[doc].lower()) if t]
        qts = set(dict(((1, ["the", "fast"]), (2, ["customer"])))[q])
        for i, t in enumerate(toks):
            if t in qts:
                want.add((q, rank, doc, t, i))
    got = {(r["query_id"], r["rank"], r["doc_id"], r["term"], r["pos"])
           for r in rows}
    assert got == want and len(got) > 0
    # plan: positional decode only — the documents table is never read
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "documents" not in plan
    # the decode-side postings scan is block-pruned via the broadcast join
    assert "BroadcastHashJoin" in plan


# ---- ordered proximity (slop) -------------------------------------------------

def _near_ref(docs_rows, queries):
    """Python reference: ordered windowed matching (gap ≤ slop between
    consecutive tokens), chained existentially over all position combos."""
    import re

    want = set()
    for doc_id, text in docs_rows:
        toks = [t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t]
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        for qid, phrase, slop in queries:
            q = [t for t in re.split("[^a-z0-9]+", phrase.lower()) if t]
            if not q or any(t not in pos for t in q):
                continue
            S = set(pos[q[0]])
            for t in q[1:]:
                P = set(pos[t])
                S = {s + d for s in S for d in range(1, slop + 2) if s + d in P}
                if not S:
                    break
            if S:
                want.add((qid, doc_id))
    return want


NEAR_DOCS = [
    (0, "a b c d"),
    (1, "a x b"),
    (2, "a x x b"),
    (3, "b a"),
    (4, "a b a b"),
    (5, "a x x x b c"),
    (6, ""),
]
NEAR_QS = [
    (1, "a b", 0),
    (2, "a b", 1),
    (3, "a b", 2),
    (4, "a b c", 1),
    (5, "b a", 0),
    (6, "a c", 4),
    (7, "zebra stripes", 3),
]


@pytest.mark.parametrize("cfg", [CFG_POS, CFG_POS_TINY])
def test_near_match_semantics_vs_python_reference(spark, cfg):
    docs = spark.createDataFrame(NEAR_DOCS, "doc_id long, text string")
    idx = build_index(docs, cfg)
    got = {
        (r["query_id"], r["doc_id"])
        for r in wand.near_match_positional(idx.postings, NEAR_QS, cfg).collect()
    }
    assert got == _near_ref(NEAR_DOCS, NEAR_QS)
    # hand-pinned spot checks (the reference itself could be wrong)
    assert (1, 0) in got and (1, 4) in got and (1, 1) not in got
    assert (2, 1) in got and (2, 2) not in got
    assert (3, 2) in got and (3, 5) not in got
    assert (5, 3) in got and (5, 4) in got and (5, 0) not in got


def test_near_slop_zero_equals_phrase_and_monotone(spark):
    """near(slop=0) ≡ phrase_match_positional, and widening slop only ever
    ADDS matches (monotone supersets) — on the real sf0.001 corpus."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    phrases = [(1, "the fast"), (2, "customer order"), (3, "spark group query")]
    want = {
        (r["query_id"], r["doc_id"])
        for r in wand.phrase_match_positional(idx.postings, phrases, CFG_POS).collect()
    }
    prev: set = set()
    for slop in (0, 1, 3):
        got = {
            (r["query_id"], r["doc_id"])
            for r in wand.near_match_positional(
                idx.postings, [(q, p, slop) for q, p in phrases], CFG_POS
            ).collect()
        }
        if slop == 0:
            assert got == want and len(got) > 0
        assert got >= prev
        prev = got
    assert prev > want  # wider slop really finds extra ordered matches here


def test_near_topk_slop_zero_equals_phrase_topk_and_vs_reference(spark):
    """near_bm25_topk(slop=0) is bit-identical to phrase_bm25_topk; at wider
    slop the ranked set equals BM25 over the windowed match set (checked via
    near_match_positional + brute BM25 restriction)."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    base = [(1, "the fast", 5), (2, "customer order", 5)]
    want0 = sorted(
        tuple(r) for r in wand.phrase_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            base, CFG_POS,
        ).collect()
    )
    got0 = sorted(
        tuple(r) for r in wand.near_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(q, p, k, 0) for q, p, k in base], CFG_POS,
        ).collect()
    )
    assert got0 == want0 and len(got0) > 0

    near = [(1, "the fast", 5, 2), (2, "customer order", 5, 1)]
    got = sorted(
        (r["query_id"], r["doc_id"], round(r["score"], 9))
        for r in wand.near_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            near, CFG_POS,
        ).collect()
    )
    # reference: windowed match set, then BM25 restricted to it
    matches = {
        (r["query_id"], r["doc_id"])
        for r in wand.near_match_positional(
            idx.postings, [(q, p, s) for q, p, _k, s in near], CFG_POS
        ).collect()
    }
    assert {(q, d) for q, d, _ in got} <= matches
    full = wand.wand_score_partials(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        [(q, sorted(set(p.split())), "conjunctive", 1 << 30) for q, p, _k, _s in near],
        CFG_POS,
    ).collect()
    scores = {(r["query_id"], r["doc_id"]): round(r["score"], 9) for r in full}
    ranked = {}
    for q, _p, k, _s in near:
        rows = sorted(
            ((scores[(q, d)], d) for (qq, d) in matches if qq == q),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        ranked[q] = {(q, d, s) for s, d in rows}
    assert set(got) == ranked[1] | ranked[2]
    # wider slop really admits more matches (the ranked k saturates, so
    # strictness shows at the match-set level)
    m0 = {
        (r["query_id"], r["doc_id"])
        for r in wand.near_match_positional(
            idx.postings, [(q, p, 0) for q, p, _k, _s in near], CFG_POS
        ).collect()
    }
    assert matches > m0


def test_topk_snippets_rule_and_shape(spark):
    """Snippets start AT a query-term occurrence (the result's first), span
    ≤ window tokens of the normalized stream, and ride on the same ranking
    as bm25_wand_topk."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    queries = [(1, ["the", "fast"], "disjunctive", 5),
               (2, ["customer", "order"], "conjunctive", 4)]
    rows = wand.topk_snippets(
        docs, idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        queries, CFG_POS, window=8,
    ).collect()
    tk = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            queries, CFG_POS,
        ).collect()
    }
    assert len(rows) == len(tk) > 0
    qterms = {q[0]: set(q[1]) for q in queries}
    import re
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        assert tk[(r["query_id"], r["doc_id"])] == (r["rank"], r["score"])
        toks = r["snippet"].split(" ")
        assert 1 <= len(toks) <= 8
        assert toks[0] in qterms[r["query_id"]]  # starts at a term hit
        # the snippet is a verbatim window of the doc's normalized stream
        norm = [t for t in re.split("[^a-z0-9]+", texts[r["doc_id"]].lower()) if t]
        p = int(r["snip_pos"])
        assert norm[p:p + 8] == toks
        assert not any(t in qterms[r["query_id"]] for t in norm[:p])  # FIRST hit


# ---- unordered proximity -----------------------------------------------------

def _near_unordered_ref(docs_rows, queries):
    """Independent reference: all distinct terms within a window of width
    (n_tokens − 1)·(slop + 1), any order (anchor containment)."""
    import re as _re

    want = set()
    for doc_id, text in docs_rows:
        toks = [t for t in _re.split("[^a-z0-9]+", (text or "").lower()) if t]
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        for qid, phrase, slop in queries:
            q = [t for t in _re.split("[^a-z0-9]+", phrase.lower()) if t]
            uniq = sorted(set(q))
            w = (len(q) - 1) * (slop + 1)
            if any(t not in pos for t in uniq):
                continue
            anchors = sorted(p for t in uniq for p in pos[t])
            if any(
                all(any(a <= p <= a + w for p in pos[t]) for t in uniq)
                for a in anchors
            ):
                want.add((qid, doc_id))
    return want


@pytest.mark.parametrize("cfg", [CFG_POS, CFG_POS_TINY])
def test_near_unordered_semantics_vs_python_reference(spark, cfg):
    docs = spark.createDataFrame(NEAR_DOCS, "doc_id long, text string")
    idx = build_index(docs, cfg)
    got = {
        (r["query_id"], r["doc_id"])
        for r in wand.near_match_positional(
            idx.postings, NEAR_QS, cfg, ordered=False).collect()
    }
    assert got == _near_unordered_ref(NEAR_DOCS, NEAR_QS)
    # hand-pinned: "b a" slop 0 (window 1) now ALSO matches docs where the
    # pair appears as "a b" adjacent — the defining unordered behavior
    assert (5, 0) in got and (5, 1) not in got
    # ordered q1 "a b" slop0: same doc set as q5 under unordered symmetry
    q1 = {d for q, d in got if q == 1}
    q5 = {d for q, d in got if q == 5}
    assert q1 == q5


def test_near_unordered_superset_of_ordered(spark):
    """unordered ⊇ ordered at equal slop — on the real corpus, for several
    slops, including a case where the containment is strict."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, CFG_POS)
    phrases = [(1, "the fast"), (2, "customer order"), (3, "spark group query")]
    strict = False
    for slop in (0, 1, 3):
        qs = [(q, p, slop) for q, p in phrases]
        ordered = {
            (r["query_id"], r["doc_id"])
            for r in wand.near_match_positional(idx.postings, qs, CFG_POS).collect()
        }
        unordered = {
            (r["query_id"], r["doc_id"])
            for r in wand.near_match_positional(
                idx.postings, qs, CFG_POS, ordered=False).collect()
        }
        assert unordered >= ordered and len(unordered) > 0
        strict = strict or unordered > ordered
    assert strict  # the relaxation finds genuinely extra docs somewhere


def test_near_unordered_serving_twin(spark, tmp_path):
    """IndexServer.near_batch(ordered=False) ≡ the Spark operator."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans import build as B

    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    d = str(tmp_path / "pidx_unord")
    B.build_index_resumable(docs, d, CFG_POS)
    idx = B.read_index(spark, d, CFG_POS)
    qs = [(1, "fast the", 0), (2, "order customer", 1), (3, "query spark", 3)]
    want = sorted(
        (r["query_id"], r["doc_id"])
        for r in wand.near_match_positional(
            idx.postings, qs, CFG_POS, ordered=False).collect()
    )
    got = IndexServer(d, CFG_POS).near_batch(qs, ordered=False)
    assert got == want and len(got) > 0


def test_near_unordered_topk_and_serving_twin(spark, tmp_path):
    """Ranked unordered proximity: BM25 over the symmetric window match set,
    serving twin rank-identical, and the match-set relationship holds (the
    ranked unordered doc set ⊇ ranked ordered doc set at equal slop & k=∞)."""
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans import build as B

    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    d = str(tmp_path / "pidx_unord_topk")
    B.build_index_resumable(docs, d, CFG_POS)
    idx = B.read_index(spark, d, CFG_POS)
    qs = [(1, "fast the", 1 << 20, 1), (2, "order customer", 1 << 20, 1),
          (3, "query spark", 1 << 20, 3)]
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in wand.near_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            qs, CFG_POS, ordered=False).collect()
    )
    got = [
        (q, r, dd, round(s, 9))
        for q, r, dd, s in IndexServer(d, CFG_POS).near_topk_batch(
            qs, ordered=False)
    ]
    assert sorted(got) == want and len(want) > 0
    # ranked-set ⊇: ordered matches at the same slop are a subset
    ordered_docs = {
        (r["query_id"], r["doc_id"])
        for r in wand.near_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            qs, CFG_POS, ordered=True).collect()
    }
    unordered_docs = {(q, dd) for q, _r, dd, _s in want}
    assert ordered_docs <= unordered_docs
