"""Fielded (multi-field) BM25 search — the BM25F-style "field boost" model:

    score(d, q) = Σ_field  w_field · BM25_field(d, q)

where BM25_field uses that field's OWN statistics (df, avgdl, dl) from a
per-field index. This is the per-field-sum variant of fielded ranking (the
weighted-sum model used by e.g. Lucene's multi-field boolean dismax-less
combination); true BM25F (weighted tf merged before saturation) would need
per-field tf in one posting row and is a deliberate non-goal here.

Scale shape: the per-field indexes share the doc-range sharding, so a doc's
complete fielded score lives in ONE shard group of the union relation —
the combiner cogroups the fields' (term-filtered) posting rows and packed
doc-length rows by shard, scores each field with the SHARED kernel
(functions.scoring.score_shard_blocks, per-field stats), sums the weighted
per-field scores in one NumPy array bounded by docs_per_shard, and emits a
per-(query, shard) top-k partial. The Arrow boundary carries O(shards · Σk)
rows; per-shard work is bounded by the shard size, never the corpus. Fielded
queries don't block-max prune (the per-field pass scores every query-term
match in the shard — the same bound as match counting); a combined
cross-field upper bound is future work.

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
    dps = cfg.docs_per_shard
    # per-shard pass scores every match (bounded by the shard, not the
    # corpus); k-truncation happens on the COMBINED score below
    unb = [(int(q[0]), q[1], "disjunctive", dps) for q in queries]
    kmap_py = {int(q[0]): int(q[3]) for q in queries}

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
        from bloqsenjin_spark.functions.scoring import score_shard_blocks

        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        shard = int(pl["shard"].iloc[0])
        shard_base = shard * dps
        acc: dict[int, np.ndarray] = {}
        seen: dict[int, np.ndarray] = {}
        for f in fields:  # sorted field order = deterministic summation
            m = (pl["field"] == f).to_numpy()
            if not m.any():
                continue
            dl_rows = dl_pdf[dl_pdf["field"] == f]
            if dl_rows.empty:
                continue
            dls = varint_decode(bytes(dl_rows["dls"].iloc[0])).astype(np.float64)
            sub = pl[m]
            oq, od, os_ = score_shard_blocks(
                shard,
                sub["term"].to_numpy(),
                sub["block_id"].to_numpy(),
                sub["block_max_score"].to_numpy(),
                sub["doc_deltas"].to_numpy(),
                sub["tfs"].to_numpy(),
                dls, unb, idf_maps[f], avgdls[f], cfg,
            )
            w = weights[f]
            for qa, da, sa in zip(oq, od, os_):
                qid = int(qa[0])
                a = acc.get(qid)
                if a is None:
                    a = acc[qid] = np.zeros(dps, dtype=np.float64)
                    seen[qid] = np.zeros(dps, dtype=bool)
                local = da - shard_base
                a[local] += w * sa
                seen[qid][local] = True
        if not acc:
            return empty
        out_q, out_d, out_s = [], [], []
        for qid in sorted(acc):
            local = np.flatnonzero(seen[qid])
            scs = acc[qid][local]
            docs = local + shard_base
            k = kmap_py[qid]
            if docs.size > k:  # exact: every global winner wins its shard
                order = np.lexsort((docs, -scs))[:k]
                docs, scs = docs[order], scs[order]
            out_q.append(np.full(docs.size, qid, dtype=np.int64))
            out_d.append(docs)
            out_s.append(scs)
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
