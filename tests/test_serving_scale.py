"""Distributed serving fan-out (round-8 verdict #3): N slice-owner
IndexServers — each owning a doc-range shard slice, running in a SEPARATE
OS process (no shared state, the multi-server deployment shape) — answer
ranked/count/phrase batches, and serving.merge_topk / merge_counts
reproduce the single-server results row for row. Doc-range slices
partition the corpus, so every global winner wins its own slice (merge
exactness) and counts add exactly."""

from __future__ import annotations

import multiprocessing as mp

import pyarrow.dataset as ds
import pytest

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators.serving import (
    IndexServer,
    merge_counts,
    merge_topk,
)

SF_DIR = "/root/testdata/sf0.001"
CFG_KW = dict(docs_per_shard=64, block_docs=16, positions=True)

QS = [(1, ["the", "fast"], "disjunctive", 10),
      (2, ["customer", "order"], "conjunctive", 10),
      (3, ["the", "customer"], "disjunctive", 7, ("merge",)),
      (4, ["fast", "order"], "disjunctive", 10, (), {"fast": 2.0})]
CQS = [(1, ["the", "fast"], "disjunctive", 10),
       (2, ["customer", "order"], "conjunctive", 10)]
PQS = [(1, "the fast", 10), (2, "customer order", 10)]


def _slice_worker(args):
    """Runs in a spawned child process: pyarrow-only slice owner."""
    index_dir, cfg_kw, shard_slice = args
    srv = IndexServer(index_dir, IndexConfig(**cfg_kw),
                      shards=shard_slice)
    return (
        srv.query_batch(QS),
        srv.count_batch(CQS),
        srv.phrase_topk_batch(PQS),
    )


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    from bloqsenjin_spark.plans.build import build_index_resumable

    docs = corpus.load_table(spark, SF_DIR, "documents")
    d = str(tmp_path_factory.mktemp("fanout") / "idx")
    build_index_resumable(docs, d, IndexConfig(**CFG_KW))
    return d


def _shard_slices(index_dir: str, n: int) -> list[list[int]]:
    tbl = ds.dataset(f"{index_dir}/doc_lens", format="parquet",
                     partitioning="hive").to_table(columns=["shard"])
    shards = sorted({int(s.as_py()) for s in tbl["shard"]})
    assert len(shards) >= n, "need more shards than slices for the test"
    # contiguous doc-range slices — the deployment split
    size = (len(shards) + n - 1) // n
    return [shards[i * size:(i + 1) * size] for i in range(n)]


def test_slice_fanout_across_processes(spark, index_dir):
    cfg = IndexConfig(**CFG_KW)
    full = IndexServer(index_dir, cfg)
    want_q = full.query_batch(QS)
    want_c = full.count_batch(CQS)
    want_p = full.phrase_topk_batch(PQS)
    assert want_q and want_c and want_p

    slices = _shard_slices(index_dir, 4)
    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        parts = pool.map(
            _slice_worker,
            [(index_dir, CFG_KW, sl) for sl in slices],
        )
    merged_q = merge_topk([p[0] for p in parts], QS)
    merged_c = merge_counts([p[1] for p in parts])
    merged_p = merge_topk(
        [p[2] for p in parts],
        [(int(q[0]), [], "", int(q[2])) for q in PQS],
    )
    # exact: same doc → same slice → same float ops; merge re-ranks the
    # union with the kernel tie-break
    assert merged_q == want_q
    assert merged_c == sorted(want_c)
    assert merged_p == want_p


def test_slice_fanout_expansion_forms(spark, index_dir):
    """Prefix/fuzzy fan-out is exact too: term_stats (df/idf and so the
    expansion sets + caps) are corpus-wide in every slice owner — only
    postings/doc_lens are slice-filtered — so each slice expands to the
    IDENTICAL term set and merge_topk reproduces the full ranking."""
    cfg = IndexConfig(**CFG_KW)
    full = IndexServer(index_dir, cfg)
    pq = [(1, "th", 10), (2, "cust", 10)]
    fq = [(1, "spork", 1, 10), (2, "custmer", 1, 10)]
    want_p = full.prefix_topk_batch(pq, max_expansions=8)
    want_f = full.fuzzy_topk_batch(fq, max_expansions=8)
    assert want_p and want_f
    slices = _shard_slices(index_dir, 3)
    owners = [IndexServer(index_dir, cfg, shards=sl) for sl in slices]
    merged_p = merge_topk(
        [o.prefix_topk_batch(pq, max_expansions=8) for o in owners],
        [(q[0], [], "", q[2]) for q in pq])
    merged_f = merge_topk(
        [o.fuzzy_topk_batch(fq, max_expansions=8) for o in owners],
        [(q[0], [], "", q[3]) for q in fq])
    assert merged_p == want_p
    assert merged_f == want_f


def test_slice_union_covers_every_doc(spark, index_dir):
    """Slice partials are disjoint and their doc union equals the full
    server's match set (counts prove no doc is owned twice or dropped)."""
    cfg = IndexConfig(**CFG_KW)
    slices = _shard_slices(index_dir, 3)
    parts = [
        IndexServer(index_dir, cfg, shards=sl).count_batch(CQS)
        for sl in slices
    ]
    assert merge_counts(parts) == sorted(
        IndexServer(index_dir, cfg).count_batch(CQS))
