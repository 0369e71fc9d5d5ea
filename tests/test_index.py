"""M2/M3: index build + block-max query — rank identity vs brute force.

Block size forced tiny (FIXTURES.md §3) so multi-block/multi-shard paths are
exercised even on micro corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import postings as P
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.plans.build import build_index
from tests.test_bm25_brute import MICRO_QUERIES, _mk_queries

TINY = IndexConfig(docs_per_shard=4, block_docs=2)  # 8 docs → 2 shards × 2 blocks
SMALL = IndexConfig(docs_per_shard=128, block_docs=16)  # 500 docs → 4 shards


def _wand_result(docs_df, queries, cfg):
    idx = build_index(docs_df, cfg)
    return wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, queries, cfg
    )


def test_postings_micro_fixture(spark, micro_docs):
    """FIXTURES.md §3: postings for 'a' = [(0,1),(2,3),(5,1),(7,1)], block=2."""
    idx = build_index(micro_docs, TINY)
    rows = P.decode_postings(idx.postings.where(F.col("term") == "a"), TINY).collect()
    got = sorted((r["doc_id"], r["tf"]) for r in rows)
    assert got == [(0, 1), (2, 3), (5, 1), (7, 1)]
    # block structure: shard 0 holds docs 0-3, blocks {0:[0,2(wait 2 in block1)]}
    blocks = {
        (r["shard"], r["block_id"]): (r["n_docs"], r["first_doc"], r["last_doc"])
        for r in idx.postings.where(F.col("term") == "a").collect()
    }
    # doc 0 → shard 0 block 0; doc 2 → shard 0 block 1; docs 5,7 → shard 1 blocks 0,1
    assert blocks == {
        (0, 0): (1, 0, 0),
        (0, 1): (1, 2, 2),
        (1, 0): (1, 5, 5),
        (1, 1): (1, 7, 7),
    }


def test_decode_roundtrip_equals_brute_postings(spark, micro_docs):
    """decode(build(x)) == brute-force tf table (SURVEY §7.1 M2 property)."""
    idx = build_index(micro_docs, TINY)
    got = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in P.decode_postings(idx.postings, TINY).collect()
    )
    want = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in topk.term_freqs(topk.tokenized(micro_docs)).collect()
    )
    assert got == want


def test_block_max_is_max_over_block(spark, micro_docs):
    """block_max_tf == max(decoded tfs) per block (SURVEY §5.2 item 3)."""
    idx = build_index(micro_docs, TINY)
    import numpy as np

    from bloqsenjin_spark.functions.codec import varint_decode

    for r in idx.postings.collect():
        tfs = varint_decode(bytes(r["tfs"]))
        assert int(tfs.max()) == r["block_max_tf"]
        assert len(tfs) == r["n_docs"]


def test_doc_lens_packing(spark, micro_docs):
    import numpy as np

    from bloqsenjin_spark.functions.codec import varint_decode

    idx = build_index(micro_docs, TINY)
    dl = {r["shard"]: varint_decode(bytes(r["dls"])) for r in idx.doc_lens.collect()}
    assert list(dl[0]) == [3, 4, 3, 1]
    assert list(dl[1]) == [0, 3, 5, 2]


@pytest.mark.parametrize("cfg", [TINY, IndexConfig(docs_per_shard=8, block_docs=8)])
def test_wand_rank_identical_micro(spark, micro_docs, cfg):
    qs = _mk_queries(spark, MICRO_QUERIES)
    want = topk.bm25_brute_force(micro_docs, qs).orderBy("query_id", "rank").collect()
    got = (
        _wand_result(micro_docs, [(q, sorted(set(t)), m, k) for q, t, m, k in MICRO_QUERIES], cfg)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"],
            w["rank"],
            w["doc_id"],
        )
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)


def test_wand_rank_identical_sf0001(spark):
    docs_df = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    qs = corpus.reference_queries(spark)
    want = topk.bm25_brute_force(docs_df, qs).orderBy("query_id", "rank").collect()
    got = (
        _wand_result(docs_df, corpus.REFERENCE_QUERIES, SMALL)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"],
            w["rank"],
            w["doc_id"],
        ), (g, w)
        assert g["score"] == pytest.approx(w["score"], abs=1e-12)


def test_prefix_topk_expansion_semantics(spark):
    """prefix_bm25_topk == disjunctive bm25_wand_topk over the df-ranked,
    capped expansion set; empty expansions yield no rows."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    cfg = IndexConfig(docs_per_shard=128, block_docs=16)
    idx = build_index(docs, cfg)
    cap = 3
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.prefix_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, "s", 5), (2, "zzz", 5)], cfg, max_expansions=cap,
        ).collect()
    )
    # manual expansion with the same rule
    ts = {r["term"]: r["df"] for r in idx.term_stats.collect()}
    exp = sorted(
        (t for t in ts if t.startswith("s")),
        key=lambda t: (-ts[t], t),
    )[:cap]
    assert len(exp) == cap  # the cap really binds on this corpus
    want = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, exp, "disjunctive", 5)], cfg,
        ).collect()
    )
    assert got == want and len(got) == 5
    assert not any(q == 2 for q, _, _, _ in got)  # no expansion ⇒ no rows


def test_boolean_and_filtered_plan_shape(spark, tmp_path):
    """Plan audit of the round-3 query forms over a persisted index: the
    postings scan pushes `term IN (...)` INCLUDING the MUST_NOT terms (their
    postings drive the exclusion), and the filtered path's allow bitmap
    joins only the one-row-per-shard doc_lens side — the postings relation
    is never joined or re-shuffled."""
    from bloqsenjin_spark.operators.bitmaps import shard_bitmap_df
    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    cfg = IndexConfig(docs_per_shard=128, block_docs=16)
    d = str(tmp_path / "idx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs, d, cfg)
    idx = read_index(spark, d)

    out = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        [(1, ["the"], "disjunctive", 5, ["fast"])], cfg,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l and "doc_deltas" in l]
    assert scan and "the" in scan[0] and "fast" in scan[0]  # pushed, incl. neg

    allow_map = shard_bitmap_df(
        docs.where(F.col("lang") == "en").select("doc_id"), cfg,
        bitmap_col="allow",
    )
    out2 = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        [(1, ["the"], "disjunctive", 5)], cfg, allow_map=allow_map,
    )
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    scan2 = [l for l in plan2.splitlines() if "FileScan" in l and "doc_deltas" in l]
    # single-term query: Catalyst simplifies the IN to EqualTo — still pushed
    assert scan2 and ("EqualTo(term,the)" in scan2[0] or "In(term" in scan2[0])
    # exactly one cogroup (the scorer); the allow join must not touch it
    assert plan2.count("FlatMapCoGroupsInPandas") == 1


def test_match_counts_semantics_and_plan(spark, tmp_path):
    """match_counts == python-reference hit counts (conj/disj/MUST_NOT,
    zero-hit queries report 0), with NO rank window in the plan."""
    import re

    from bloqsenjin_spark.plans.build import build_index_resumable, read_index

    cfg = IndexConfig(docs_per_shard=128, block_docs=16)
    d = str(tmp_path / "cidx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs, d, cfg)
    idx = read_index(spark, d)
    queries = [
        (1, ["the", "fast"], "disjunctive", 10),
        (2, ["customer", "order"], "conjunctive", 10),
        (3, ["zebra"], "disjunctive", 10),                     # zero hits
        (4, ["join", "hash"], "conjunctive", 10, ["merge"]),   # MUST_NOT
    ]
    out = wand.match_counts(idx.postings, idx.doc_lens, queries, cfg)
    got = {r["query_id"]: r["n_hits"] for r in out.collect()}
    toksets = {
        r["doc_id"]: set(
            t for t in re.split("[^a-z0-9]+", (r["text"] or "").lower()) if t
        )
        for r in docs.collect()
    }

    def ref(q):
        terms, mode = set(q[1]), q[2]
        negs = set(q[4]) if len(q) > 4 else set()
        n = 0
        for ts in toksets.values():
            pos = terms <= ts if mode == "conjunctive" else bool(terms & ts)
            if pos and not (negs & ts):
                n += 1
        return n

    assert got == {q[0]: ref(q) for q in queries}
    assert got[3] == 0 and got[1] > 0 and got[4] > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # counting is an aggregation, never a rank
    assert "HashAggregate" in plan
    # column pruning reaches the scan: counting reads doc_deltas only —
    # neither tf payloads nor block-max metadata
    scan = [l for l in plan.splitlines()
            if "FileScan" in l and "doc_deltas" in l]
    assert scan and "block_max_score" not in scan[0] and "tfs" not in scan[0]


def test_prefix_expansion_is_one_batch_job(spark):
    """A P-prefix batch must not cost P sequential dictionary-scan jobs:
    expand_prefix_terms runs the SAME number of Spark jobs for 1 prefix as
    for 6 (one broadcast-join + rank-window action; AQE may split an action
    into a few stage-materialization jobs, hence count equality rather than
    a literal 1)."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)
    ts = idx.term_stats.persist()
    ts.count()  # materialize so both measurements see identical lineage
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs_for(prefix_queries, group):
        sc.setJobGroup(group, group)
        try:
            exp = wand.expand_prefix_terms(ts, prefix_queries, max_expansions=3)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return exp, len(tracker.getJobIdsForGroup(group))

    exp1, n1 = jobs_for([(1, "s", 5)], "exp_one")
    exp6, n6 = jobs_for(
        [(i, p, 5) for i, p in enumerate(["s", "c", "t", "d", "f", "g"])],
        "exp_six",
    )
    assert n1 >= 1 and n6 == n1, (n1, n6)
    assert exp6[0] == sorted(
        (t for t in {r["term"] for r in ts.collect()} if t.startswith("s")),
        key=lambda t: (-{r["term"]: r["df"] for r in ts.collect()}[t], t),
    )[:3] == exp1[1]
    ts.unpersist()


def test_match_count_partials_rows_bounded_by_queries_x_shards(spark):
    """The counting kernel must emit per-(query, shard) counts across the
    Arrow boundary — never one row per matching doc (round-3 shape). Bound:
    rows ≤ queries × shards, even for head-term queries matching most of the
    corpus."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)
    queries = [
        (1, ["the"], "disjunctive", 10),           # head term: huge hit count
        (2, ["the", "a", "of"], "disjunctive", 10),
        (3, ["customer", "order"], "conjunctive", 10),
    ]
    n_shards = idx.doc_lens.count()
    partial = wand.match_count_partials(idx.postings, idx.doc_lens, queries, SMALL)
    rows = partial.collect()
    assert 0 < len(rows) <= len(queries) * n_shards
    got = {}
    for r in rows:
        got[r["query_id"]] = got.get(r["query_id"], 0) + r["n"]
    # per-shard counts sum to the true totals
    want = {
        r["query_id"]: r["n_hits"]
        for r in wand.match_counts(idx.postings, idx.doc_lens, queries, SMALL).collect()
        if r["n_hits"] > 0
    }
    assert got == want and got[1] > SMALL.docs_per_shard  # really match-heavy


def test_fuzzy_topk_expansion_semantics(spark):
    """fuzzy_bm25_topk == disjunctive bm25_wand_topk over the
    (distance ASC, df DESC, term ASC)-ranked, capped expansion set; no
    expansion ⇒ no rows."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)
    fuzzy = [(1, "sow", 1, 5), (2, "xyzzy", 1, 5)]  # sow → {row, slow}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    ts = {r["term"]: r["df"] for r in idx.term_stats.collect()}
    cands = sorted(
        ((lev(t, "sow"), -ts[t], t) for t in ts if lev(t, "sow") <= 1)
    )
    assert len(cands) == 2  # real multi-term expansion on this corpus
    for cap in (1, 2):  # cap binds at 1, full expansion at 2
        got = sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in wand.fuzzy_bm25_topk(
                idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
                fuzzy, SMALL, max_expansions=cap,
            ).collect()
        )
        exp = [t for _d, _ndf, t in cands[:cap]]
        want = sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in wand.bm25_wand_topk(
                idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
                [(1, exp, "disjunctive", 5)], SMALL,
            ).collect()
        )
        assert got == want and len(got) == 5
        assert not any(q == 2 for q, _, _, _ in got)  # no expansion ⇒ no rows


def test_fuzzy_multi_composition(spark):
    """fuzzy_multi_bm25_topk: a 1-word multi query with no decay ≡ today's
    fuzzy_bm25_topk (the property the operator is defined by); a 2-word
    query with decay ≡ a manual boosted disjunctive query over the union of
    per-word expansions with boost = decay ** min-distance."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
            for r in df.collect()
        )

    # (a) 1-word equivalence, incl. the zero-expansion guard word
    single = [(1, "sow", 1, 5), (2, "xyzzy", 1, 5)]
    multi = [(qid, [w], d, k) for qid, w, d, k in single]
    assert rows(
        wand.fuzzy_multi_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            multi, SMALL, max_expansions=2,
        )
    ) == rows(
        wand.fuzzy_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            single, SMALL, max_expansions=2,
        )
    )

    # (b) 2-word decay ≡ manual union + min-dist boosts ("sow" and "row"
    # expand to overlapping sets, so the per-term MIN-distance rule binds:
    # 'row' is dist 1 from "sow" but dist 0 from "row")
    exp = wand.expand_fuzzy_terms_with_dist(
        idx.term_stats, [(0, "sow", 1, 5), (1, "row", 1, 5)], 50
    )
    best: dict[str, int] = {}
    for pairs in exp.values():
        for t, d in pairs:
            best[t] = min(best.get(t, 99), d)
    assert best["row"] == 0 and best["slow"] == 1  # min-dist rule exercised
    boosted = [(7, sorted(best), "disjunctive", 6, (),
                {t: 0.5 ** d for t, d in best.items()})]
    assert rows(
        wand.fuzzy_multi_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(7, ["sow", "row"], 1, 6)], SMALL, distance_decay=0.5,
        )
    ) == rows(
        wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            boosted, SMALL,
        )
    ) != []


def test_weighted_queries_match_numpy_oracle(spark):
    """6-tuple per-term boosts: kernel == independent NumPy oracle; a boost
    dict of all-1.0 (or None) is bit-identical to the plain 4-tuple query."""
    from tests import numpy_oracle

    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)
    wq = [
        (1, ["the", "fast"], "disjunctive", 8, [], {"the": 0.25, "fast": 2.0}),
        (2, ["customer", "order"], "conjunctive", 8, [], {"order": 1.5}),
        (3, ["join", "hash", "row"], "disjunctive", 8, ["merge"],
         {"join": 2.0, "hash": 0.5}),
    ]
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, wq, SMALL
        ).collect()
    )
    dmap = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = sorted(numpy_oracle.bm25_topk(dmap, wq))
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        assert g[3] == pytest.approx(w[3], abs=1e-9)
    # boosts really reorder: q1 down-weights the head term 8x vs plain
    plain = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, ["the", "fast"], "disjunctive", 8)], SMALL,
        ).collect()
    }
    assert any(plain[(1, rk)] != d for _q, rk, d, _s in got
               if _q == 1 and (1, rk) in plain)

    one = sorted(
        tuple(r) for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(9, ["the", "fast"], "disjunctive", 6, [], {"the": 1.0})], SMALL,
        ).collect()
    )
    base = sorted(
        tuple(r) for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(9, ["the", "fast"], "disjunctive", 6)], SMALL,
        ).collect()
    )
    assert one == base  # weight 1.0 is the identity, bit-exact


def test_paged_topk_pages_partition_the_ranking(spark):
    """Pages (0,7], (7,14], (14,20] concatenate to exactly the full top-20
    with identical global ranks."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)
    q = [(1, ["the", "fast"], "disjunctive", 20)]
    full = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, q, SMALL
        ).collect()
    )
    assert len(full) == 20
    pages = []
    for off, k in ((0, 7), (7, 7), (14, 6)):
        pages += [
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in wand.bm25_topk_paged(
                idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
                [(1, ["the", "fast"], "disjunctive", k)], {1: off}, SMALL,
            ).collect()
        ]
    assert sorted(pages) == full


def test_negative_boost_rejected_spark_path(spark):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    idx = build_index(docs, SMALL)
    with pytest.raises(ValueError, match="negative term boosts"):
        wand.bm25_wand_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, ["the"], "disjunctive", 5, [], {"the": -2.0})], SMALL,
        )
    with pytest.raises(ValueError, match="duplicate query_ids"):
        wand.near_bm25_topk(
            idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            [(1, "the fast", 5, 0), (1, "customer order", 5, 1)], SMALL,
        )
