"""Fielded (multi-field) BM25 search — the BM25F-style "field boost" model:

    score(d, q) = Σ_field  w_field · BM25_field(d, q)

where BM25_field uses that field's OWN statistics (df, avgdl, dl) from a
per-field index. This is the per-field-sum variant of fielded ranking (the
weighted-sum model used by e.g. Lucene's multi-field boolean dismax-less
combination); true BM25F (weighted tf merged before saturation) would need
per-field tf in one posting row and is a deliberate non-goal here.

Scale shape: the per-field indexes share the doc-range sharding AND the
doc-range-aligned blocks, so a doc's complete fielded score lives in ONE
block of one shard group of the union relation. The combiner cogroups the
fields' (term-filtered) posting rows and packed doc-length rows by shard and
runs a fielded variant of the block-max kernel: blocks are processed in
COMBINED upper-bound order, ub[block] = Σ_{(field, term)} w_field ·
block_max_field(term, block), with the usual top-k early exit — exact for
w ≥ 0 (each doc's combined score is bounded by the block's combined ub), so
fielded queries prune exactly like single-field ones. Per-(query, shard)
partials are k-truncated; the Arrow boundary carries O(shards · Σk) rows.

No reference analog (the reference has no text search); this is the standard
next query form after single-field ranking.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bloqsenjin_spark.config import DEFAULT_CONFIG, IndexConfig
from bloqsenjin_spark.functions.codec import varint_decode
from bloqsenjin_spark.plans.build import Index, build_index


def build_fielded_index(
    docs: DataFrame,
    fields: dict[str, Column],
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
) -> dict[str, Index]:
    """One index per field, built over ``fields[name]`` (a Column producing
    that field's text) — identical layout/config so the doc-range shards
    align across fields (what makes the per-shard combine exact)."""
    return {
        name: build_index(
            docs.select(F.col(id_col).alias("doc_id"), expr.alias("text")), cfg
        )
        for name, expr in fields.items()
    }


def _score_shard_fielded(
    shard: int,
    fields_col: np.ndarray,
    terms_col: np.ndarray,
    bids: np.ndarray,
    bmax_col: np.ndarray,
    deltas_col: np.ndarray,
    tfs_col: np.ndarray,
    dls_by_field: dict[str, np.ndarray],
    queries: list,
    idf_maps: dict[str, dict[str, float]],
    avgdls: dict[str, float],
    weights: dict[str, float],
    cfg: IndexConfig,
):
    """Fielded block-max scorer for ONE shard: the single-field kernel's
    loop with (field, term) keys and a COMBINED per-block upper bound
    ub = Σ w_f · bmax_f(t, block) — exact pruning for w ≥ 0 because blocks
    are doc-range aligned across fields, so a doc's whole fielded score
    lives in the one block being bounded. Contributions accumulate in
    sorted (field, term) order (deterministic float sums); matching is
    disjunctive across fields."""
    from bloqsenjin_spark.functions import bm25
    from bloqsenjin_spark.functions.codec import delta_decode

    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    k1, b = cfg.k1, cfg.b
    shard_base = shard * dps

    term_blocks: dict[tuple, dict[int, int]] = {}
    term_bmax: dict[tuple, dict[int, float]] = {}
    for i in range(len(terms_col)):
        key = (fields_col[i], terms_col[i])
        term_blocks.setdefault(key, {})[int(bids[i])] = i
        term_bmax.setdefault(key, {})[int(bids[i])] = float(bmax_col[i])

    decoded: dict[int, tuple] = {}

    def block_postings(row_idx: int, block_base: int):
        got = decoded.get(row_idx)
        if got is None:
            ids = delta_decode(bytes(deltas_col[row_idx]), base=block_base)
            tfs = varint_decode(bytes(tfs_col[row_idx])).astype(np.float64)
            got = decoded[row_idx] = (ids, tfs)
        return got

    out_q: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    for q in queries:
        qid, terms, _mode, k = q[:4]
        present = sorted(
            key for key in (
                (f, t) for f in dls_by_field for t in set(terms)
            ) if key in term_blocks
        )
        if not present:
            continue
        cand: set[int] = set()
        for key in present:
            cand.update(term_blocks[key])
        ubs = {
            bi: sum(
                term_bmax[key].get(bi, 0.0) * weights[key[0]]
                for key in present
            )
            for bi in cand
        }
        ordered = sorted(cand, key=lambda bi: (-ubs[bi], bi))

        scores_acc: list[np.ndarray] = []
        docs_acc: list[np.ndarray] = []
        n_found = 0
        threshold = -np.inf
        for bi in ordered:
            if n_found >= k and ubs[bi] < threshold - 1e-12:
                break
            block_base = shard_base + bi * bdocs
            acc = np.zeros(bdocs, dtype=np.float64)
            matched = np.zeros(bdocs, dtype=bool)
            for f, t in present:  # sorted (field, term) = deterministic sums
                ri = term_blocks[(f, t)].get(bi)
                if ri is None:
                    continue
                ids, tfs = block_postings(ri, block_base)
                off = ids - block_base
                contrib = (idf_maps[f][t] * weights[f]) * bm25.tf_component_np(
                    tfs, dls_by_field[f][ids - shard_base], avgdls[f], k1, b
                )
                acc[off] += contrib
                matched[off] = True
            offs = np.flatnonzero(matched)
            if offs.size == 0:
                continue
            docs_acc.append(offs + block_base)
            scores_acc.append(acc[offs])
            n_found += offs.size
            if n_found >= k:
                allx = np.concatenate(scores_acc)
                threshold = np.partition(allx, allx.size - k)[allx.size - k]
        if not docs_acc:
            continue
        docs = np.concatenate(docs_acc)
        scs = np.concatenate(scores_acc)
        if docs.size > k:
            order = np.lexsort((docs, -scs))[:k]
            docs, scs = docs[order], scs[order]
        out_q.append(np.full(docs.size, qid, dtype=np.int64))
        out_d.append(docs)
        out_s.append(scs)
    return out_q, out_d, out_s


def bm25f_topk(
    indexes: dict[str, Index],
    queries: list[tuple[int, list[str], str, int]],
    field_weights: dict[str, float],
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """→ (query_id, rank, doc_id, score): fielded top-k, score = Σ_field
    w_field · BM25_field. Disjunctive queries only (cross-field conjunctive
    semantics are ambiguous — all-terms-in-one-field vs anywhere — so the
    operator refuses rather than guessing). Weights must be ≥ 0 (pruning/
    rank-safety contract shared with per-term boosts)."""
    fields = sorted(indexes)
    for q in queries:
        if q[2] != "disjunctive":
            raise ValueError(
                "bm25f_topk supports disjunctive queries only; conjunctive "
                "cross-field semantics must be decided by the caller "
                "(all-in-one-field == per-field bm25_wand_topk conjunctive)"
            )
    weights = {f: float(field_weights.get(f, 1.0)) for f in fields}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative field weights are not rankable: {weights}")
    all_terms = sorted({t for q in queries for t in q[1]})
    idf_maps = {
        f: {
            r["term"]: float(r["idf"])
            for r in indexes[f].term_stats.where(
                F.col("term").isin(all_terms)
            ).collect()
        }
        for f in fields
    }
    avgdls = {f: float(indexes[f].avgdl) for f in fields}

    pq = reduce(
        lambda a, b: a.unionByName(b),
        [
            indexes[f].postings.select(
                "term", "shard", "block_id", "block_max_score",
                "doc_deltas", "tfs",
            )
            .where(F.col("term").isin(all_terms))
            .withColumn("field", F.lit(f))
            for f in fields
        ],
    )
    dl = reduce(
        lambda a, b: a.unionByName(b),
        [
            indexes[f].doc_lens.select("shard", "dls").withColumn(
                "field", F.lit(f)
            )
            for f in fields
        ],
    )

    def combine(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        shard = int(pl["shard"].iloc[0])
        dls_by_field = {
            str(r.field): varint_decode(bytes(r.dls)).astype(np.float64)
            for r in dl_pdf.itertuples(index=False)
        }
        out_q, out_d, out_s = _score_shard_fielded(
            shard,
            pl["field"].to_numpy(),
            pl["term"].to_numpy(),
            pl["block_id"].to_numpy(),
            pl["block_max_score"].to_numpy(),
            pl["doc_deltas"].to_numpy(),
            pl["tfs"].to_numpy(),
            dls_by_field, queries, idf_maps, avgdls, weights, cfg,
        )
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    partial = pq.groupby("shard").cogroup(dl.groupby("shard")).applyInPandas(
        combine, schema="query_id long, doc_id long, score double"
    )
    kmap = F.create_map(
        *[x for q in queries for x in (F.lit(int(q[0])), F.lit(int(q[3])))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kmap[F.col("query_id")])
        .select("query_id", "rank", "doc_id", "score")
    )
