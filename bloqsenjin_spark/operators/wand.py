"""M3: index-backed top-k BM25 with exact block-max pruning (BMW family).

Distributed shape:

  postings (term ∈ query terms — predicate pushed to the scan)
    ⟂ cogroup by shard with the packed doc-length table
    → applyInPandas block-max scorer (NumPy, no per-row Python)
    → per-(query, shard) partial top-k (tiny)
    → global window rank ≤ k  (score DESC, doc_id ASC)

Correctness of the pruning: blocks are doc-range aligned across terms and a
doc lives in exactly one block, so its complete score is computable from that
block alone. For a query, ub[block] = Σ_t block_max_score(t, block) bounds
every doc score in the block; processing blocks in ub-descending order and
stopping when ub < (k-th best so far) is therefore EXACT, not approximate.
Per-partition top-k then global top-k is exact because every global winner is
a winner in its own partition.

Rank-identity with the brute-force oracle: term contributions are accumulated
in lexicographic term order — the same float64 operation sequence as
operators/topk.py's sorted fold — so scores match bit-for-bit, and ties break
on doc_id ASC in both. The pruning stop uses strict inequality with a 1e-12
guard so upper-bound ties can never drop an equal-scored lower-docID doc.

The intersection/union duality mirrors the reference's permission masks:
conjunctive = subset test (/root/reference/internal/auth/token.go:89),
disjunctive = OR-fold (/root/reference/pkg/auth/http/log.go:170-196).
"""

from __future__ import annotations

import re as _re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloqsenjin_spark.config import DEFAULT_CONFIG, IndexConfig
from bloqsenjin_spark.functions import bm25
from bloqsenjin_spark.functions.codec import delta_decode, varint_decode

_PARTIAL_SCHEMA = "query_id long, doc_id long, score double"


def _shard_scorer(queries, idf_map, avgdl, cfg: IndexConfig, tombstones=None):
    from bloqsenjin_spark.functions.scoring import score_shard_blocks

    def score(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        if pl.empty or dl_pdf.empty:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        shard = int(pl["shard"].iloc[0])
        dls = varint_decode(bytes(dl_pdf["dls"].iloc[0])).astype(np.float64)
        out_q, out_d, out_s = score_shard_blocks(
            shard,
            pl["term"].to_numpy(),
            pl["block_id"].to_numpy(),
            pl["block_max_score"].to_numpy(),
            pl["doc_deltas"].to_numpy(),
            pl["tfs"].to_numpy(),
            dls,
            queries,
            idf_map,
            avgdl,
            cfg,
            tombstones=tombstones,
        )
        if not out_q:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    return score


def phrase_match(
    docs: DataFrame,
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    phrases: list[tuple[int, str]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search → (query_id, doc_id).

    Two-stage positionless-index plan: (1) the inverted index prunes to the
    CONJUNCTIVE candidates of the phrase's terms (posting intersection — at
    web scale this is the 99.9% reduction), (2) candidates verify exactly by
    token-sequence containment against the source text (token-normalized, so
    punctuation/case don't break matches). A positional index is the
    round-2 upgrade path; the two-stage plan is the standard fallback and is
    exact either way.
    """
    from bloqsenjin_spark.functions.text import tokens

    conj = []
    phrase_norm: dict[int, str] = {}
    for qid, phrase in phrases:
        toks = [t for t in _re.split("[^a-z0-9]+", phrase.lower()) if t]
        phrase_norm[qid] = " ".join(toks)
        conj.append((qid, sorted(set(toks)), "conjunctive", 2**31 - 1))
    cand = bm25_wand_topk(postings, doc_lens, term_stats, avgdl, conj, cfg).select(
        "query_id", "doc_id"
    )
    norm = F.concat(F.lit(" "), F.concat_ws(" ", tokens(F.col(text_col))), F.lit(" "))
    src = docs.select(F.col(id_col).alias("doc_id"), norm.alias("_norm"))
    pmap = F.create_map(
        *[x for qid, p in phrase_norm.items()
          for x in (F.lit(qid), F.lit(f" {p} "))]
    )
    return (
        cand.join(src, "doc_id")
        .where(F.col("_norm").contains(pmap[F.col("query_id")]))
        .select("query_id", "doc_id")
    )


def decorate_topk(topk_results: DataFrame, docs: DataFrame,
                  id_col: str = "doc_id") -> DataFrame:
    """Join doc metadata onto top-k results in ONE broadcast pass — the
    engine-native form of the reference's N+1 per-row enrichment Selects
    (/root/reference/internal/models/bloq.go:385-432). The top-k side is tiny
    (Σ query k's), so IT is broadcast against the docs table and Catalyst
    prunes the docs scan to the joined columns."""
    meta = docs.select(
        F.col(id_col).alias("doc_id"),
        *[c for c in docs.columns if c != id_col],
    )
    return F.broadcast(topk_results).join(meta, "doc_id").select(
        "query_id", "rank", "doc_id", "score",
        *[c for c in meta.columns if c != "doc_id"],
    )


def bm25_wand_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list[tuple[int, list[str], str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tombstones: "set[int] | list[int] | None" = None,
) -> DataFrame:
    """→ TOPK_RESULT. ``queries`` is the (small) reference query set — its
    terms and per-term idf are broadcast with the scorer closure; postings are
    filtered to query terms so only the needed term shards are ever scanned
    (predicate pushdown on the postings table's ``term`` column)."""
    all_terms = sorted({t for _, ts, _, _ in queries for t in ts})
    idf_map = {
        r["term"]: float(r["idf"])
        for r in term_stats.where(F.col("term").isin(all_terms)).collect()
    }
    import numpy as np

    tomb = (
        np.sort(np.asarray(sorted(tombstones), dtype=np.int64))
        if tombstones else None
    )
    pq = postings.where(F.col("term").isin(all_terms))
    partial = pq.groupby("shard").cogroup(doc_lens.groupby("shard")).applyInPandas(
        _shard_scorer(queries, idf_map, float(avgdl), cfg, tombstones=tomb),
        schema=_PARTIAL_SCHEMA,
    )
    kmap = F.create_map(
        *[x for qid, _, _, k in queries for x in (F.lit(qid), F.lit(k))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kmap[F.col("query_id")])
        .select("query_id", "rank", "doc_id", "score")
    )
