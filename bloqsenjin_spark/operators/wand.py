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

from bloqsenjin_spark.config import DEFAULT_CONFIG, TOKEN_SPLIT_REGEX, IndexConfig
from bloqsenjin_spark.functions import bm25
from bloqsenjin_spark.functions.codec import delta_decode, varint_decode

_PARTIAL_SCHEMA = "query_id long, doc_id long, score double"


def _unpack_tomb(pdf: pd.DataFrame) -> "np.ndarray | None":
    """Shard-local tombstone mask from a cogrouped/joined ``tomb`` bitmap
    column (None column or missing column = no deletes in this shard)."""
    from bloqsenjin_spark.operators.bitmaps import unpack_bitmap

    if "tomb" not in pdf.columns or pdf.empty:
        return None
    return unpack_bitmap(pdf["tomb"].iloc[0])


def _effective_mask(dl_pdf: pd.DataFrame, has_allow: bool):
    """→ (mask, skip_shard): combine the tombstone bitmap with the optional
    allow bitmap into ONE shard-local exclusion mask (True = excluded).
    With an allow-set in force, a shard whose allow row is absent has zero
    eligible docs — skip it without decoding anything."""
    from bloqsenjin_spark.operators.bitmaps import unpack_bitmap

    tomb = _unpack_tomb(dl_pdf)
    if not has_allow:
        return tomb, False
    allow = (
        unpack_bitmap(dl_pdf["allow"].iloc[0])
        if "allow" in dl_pdf.columns else None
    )
    if allow is None:
        return None, True
    mask = ~allow
    if tomb is not None:
        mask = mask | tomb
    return mask, False


def _with_tomb(doc_lens: DataFrame, tomb_map: "DataFrame | None",
               allow_map: "DataFrame | None" = None) -> DataFrame:
    """Attach the per-shard tombstone / allow bitmaps beside doc_lens: left
    joins on shard (all sides one-row-per-shard; co-partitioned with the
    cogroup) — the scale-safe replacement for collecting doc sets to the
    driver and shipping them inside the scorer closure."""
    out = doc_lens
    if tomb_map is not None:
        out = out.join(tomb_map, "shard", "left")
    if allow_map is not None:
        out = out.join(allow_map, "shard", "left")
    return out


def _shard_cogroup_apply(left: DataFrame, right: DataFrame, fn, schema: str):
    """Round-9 shared shard-cogroup runner for every query-path kernel.

    ``X.groupby("shard").cogroup(Y.groupby("shard"))`` ships ONE Arrow group
    per shard, and because a query batch's filtered postings are byte-tiny,
    AQE coalesces the exchange to a single task — serializing hundreds of
    per-group dispatches (~5 ms each) AND the per-shard kernel work on one
    core (measured: an identity function over 245 shards at sf1.0 costs
    2.1 s; the real scorer 2.2 s). Instead the cogroup key is
    ``pmod(shard, 4·parallelism)`` — every shard's rows still meet in one
    group — with an EXPLICIT repartition(parallelism) that AQE cannot
    coalesce (guide §2.6: fill the idle cores), and a wrapper applies ``fn``
    per shard inside each coarse group, over the union of both sides' shard
    keys — exactly the per-shard cogroup contract, so results are identical
    by construction. Measured at sf1.0: single-query partials 2.08 → 0.75 s,
    12-query batch 2.21 → 0.56–1.5 s (OPTIMIZATION_r09.md §cogroup).

    The parallelism is the session default (cluster-sized, not a local
    constant); override with spark.default.parallelism on a cluster.
    """
    spark = left.sparkSession
    p = max(1, spark.sparkContext.defaultParallelism)

    def per_shard(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        lp = lp.drop(columns=["_g"])
        rp = rp.drop(columns=["_g"])
        lg = {k: v for k, v in lp.groupby("shard", sort=False)} if len(lp) else {}
        rg = {k: v for k, v in rp.groupby("shard", sort=False)} if len(rp) else {}
        el, er = lp.head(0), rp.head(0)
        outs = []
        for sh in sorted(set(lg) | set(rg)):
            out = fn(lg.get(sh, el), rg.get(sh, er))
            if out is not None and len(out):
                outs.append(out)
        if not outs:
            return fn(el, er)  # every kernel returns its typed empty frame
        return pd.concat(outs, ignore_index=True)

    key = F.pmod(F.col("shard").cast("long"), F.lit(4 * p))
    lk = left.withColumn("_g", key).repartition(p, "_g")
    rk = right.withColumn("_g", key).repartition(p, "_g")
    return lk.groupby("_g").cogroup(rk.groupby("_g")).applyInPandas(
        per_shard, schema=schema
    )


def _shard_group_apply(left: DataFrame, fn, schema: str):
    """Single-input sibling of _shard_cogroup_apply (same coarse-group +
    pinned-parallelism rationale) for per-shard kernels with no side
    input — e.g. the tombstone-free phrase verify path."""
    spark = left.sparkSession
    p = max(1, spark.sparkContext.defaultParallelism)

    def per_shard(lp: pd.DataFrame) -> pd.DataFrame:
        lp = lp.drop(columns=["_g"])
        outs = []
        for _sh, sub in lp.groupby("shard", sort=False):
            out = fn(sub)
            if out is not None and len(out):
                outs.append(out)
        if not outs:
            return fn(lp.head(0))
        return pd.concat(outs, ignore_index=True)

    key = F.pmod(F.col("shard").cast("long"), F.lit(4 * p))
    return left.withColumn("_g", key).repartition(p, "_g").groupBy(
        "_g"
    ).applyInPandas(per_shard, schema=schema)


def _shard_scorer(queries, idf_map, avgdl, cfg: IndexConfig,
                  has_allow: bool = False):
    from bloqsenjin_spark.functions.scoring import score_shard_blocks

    def score(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        if pl.empty or dl_pdf.empty:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int64", "doc_id": "int64", "score": "float64"}
            )
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
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
            tomb_mask=tomb_mask,
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


def _parse_phrases(phrases: list[tuple[int, str]]) -> list[tuple[int, list[str]]]:
    """Normalize phrases with THE tokenizer regex; empty phrases drop out
    (the positionless oracle would match everything on ''; callers must not
    pass empty phrases — both engine paths return no rows for them)."""
    out = []
    for qid, phrase in phrases:
        toks = [t for t in _re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        if toks:
            out.append((qid, toks))
    return out


def _positional_ctx(pdf: pd.DataFrame, shard: int, dps: int, bdocs: int):
    """Shared scaffolding for the positional-verify passes: per-(term, block)
    row lookup plus a memoizing decoder → (doc_ids, flat_positions, offsets).
    One decode per consulted block, reused across phrases and (in the top-k
    variant) between verification and scoring."""
    from bloqsenjin_spark.functions.codec import segmented_delta_decode

    by_term: dict[str, dict[int, int]] = {}
    for i, (t, b) in enumerate(zip(pdf["term"], pdf["block_id"])):
        by_term.setdefault(t, {})[int(b)] = i
    dd = pdf["doc_deltas"].to_numpy()
    tfb = pdf["tfs"].to_numpy()
    ps = pdf["positions"].to_numpy()
    cache: dict[int, tuple] = {}

    def decode(i: int, block_id: int):
        if i not in cache:
            if ps[i] is None:
                raise ValueError(
                    "postings row has no positions payload — build the "
                    "index with IndexConfig(positions=True) for phrase "
                    "queries, or use phrase_match_twostage"
                )
            base = shard * dps + block_id * bdocs
            ids = delta_decode(bytes(dd[i]), base=base)
            tfs_ = varint_decode(bytes(tfb[i])).astype(np.int64)
            flat = segmented_delta_decode(bytes(ps[i]), tfs_)
            offs = np.concatenate(([0], np.cumsum(tfs_)))
            cache[i] = (ids, flat, offs)
        return cache[i]

    return by_term, decode


def near_match_positional(
    postings: DataFrame,
    near_queries: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """Proximity search → (query_id, doc_id): ``(query_id, phrase, slop)``.

    ``ordered=True`` (default): tokens occur IN ORDER with at most ``slop``
    intervening positions between consecutive tokens — near(slop=0) ≡ exact
    phrase (property-tested). ``ordered=False``: the other standard NEAR
    semantics — all distinct terms occur in ANY order within a position
    window of width (len(tokens)−1)·(slop+1), the ordered chain's maximum
    span, so unordered ⊇ ordered at equal slop (property-tested).

    Same plan either way (phrase_match_positional IS this operator at
    slop 0, ordered): postings-only scan filtered to the query terms,
    block-aligned candidate intersection, whole-block vectorized verify
    (functions.scoring.phrase_verify_block / near_verify_block_unordered)."""
    return _positional_match(postings, near_queries, cfg, tomb_map,
                             ordered=ordered)


def phrase_match_positional(
    postings: DataFrame,
    phrases: list[tuple[int, str]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
) -> DataFrame:
    """Exact phrase search → (query_id, doc_id), entirely inside the index.

    ``tomb_map``: optional (shard, tomb-bitmap) table
    (plans.deletes.tombstone_bitmap_df) cogrouped in by shard — logically
    deleted docs never match; no tombstone set crosses the driver.

    Requires an index built with ``IndexConfig(positions=True)``. The plan
    touches ONLY the postings table, filtered to the phrases' terms (predicate
    pushed to the parquet scan) — no corpus scan, no re-tokenization; at
    10^12 docs the scan cost is proportional to the phrase terms' posting
    lists, not the corpus. Per shard (one applyInPandas group, NumPy inside):

      1. candidate docs = block-aligned posting intersection of the phrase's
         unique terms (blocks are doc-range aligned across terms, so the
         intersection never leaves a block);
      2. verify by position intersection: S := pos(t0); S := (S+1) ∩ pos(t1);
         ... — nonempty S after the last token ⇒ the exact token sequence
         occurs. Repeated-term phrases fall out naturally (same posting list
         consulted at both offsets).

    Replaces the round-1 two-stage plan (kept as ``phrase_match_twostage``)
    whose verify stage re-scanned and re-tokenized the documents table.
    """
    return _positional_match(
        postings, [(qid, p, 0) for qid, p in phrases], cfg, tomb_map
    )


def _positional_match(
    postings: DataFrame,
    queries_with_slop: list[tuple[int, str, int]],
    cfg: IndexConfig,
    tomb_map: "DataFrame | None",
    ordered: bool = True,
) -> DataFrame:
    """Shared phrase/proximity matcher (see phrase_match_positional /
    near_match_positional for the contract)."""
    slops = {int(qid): int(s) for qid, _p, s in queries_with_slop}
    if len(slops) != len(queries_with_slop):
        raise ValueError("duplicate query_ids in a phrase/proximity batch")
    parsed = [
        (qid, toks, slops[qid])
        for qid, toks in _parse_phrases([(q, p) for q, p, _s in queries_with_slop])
    ]
    all_terms = sorted({t for _, ts, _ in parsed for t in ts})
    pq = postings.where(F.col("term").isin(all_terms)).select(
        "term", "shard", "block_id", "doc_deltas", "tfs", "positions"
    )
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs

    def verify(pdf: pd.DataFrame, tomb_pdf: "pd.DataFrame | None" = None) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_id": []}).astype(
            {"query_id": "int64", "doc_id": "int64"}
        )
        if pdf.empty:
            return empty
        shard = int(pdf["shard"].iloc[0])
        shard_base = shard * dps
        tomb_mask = _unpack_tomb(tomb_pdf) if tomb_pdf is not None else None
        by_term, decode = _positional_ctx(pdf, shard, dps, bdocs)

        from bloqsenjin_spark.functions.scoring import (
            near_verify_block_unordered,
            phrase_verify_block,
        )

        verify_fn = phrase_verify_block if ordered else near_verify_block_unordered
        out_q: list[int] = []
        out_d: list[int] = []
        for qid, toks, slop in parsed:
            uniq = list(dict.fromkeys(toks))
            maps = [by_term.get(t) for t in uniq]
            if any(m is None for m in maps):
                continue  # some term absent from this shard ⇒ no match here
            blocks = set(maps[0])
            for m in maps[1:]:
                blocks &= set(m)
            for bid in sorted(blocks):
                per_term = {t: decode(m[bid], bid) for t, m in zip(uniq, maps)}
                base = shard * dps + bid * bdocs
                # whole-block vectorized verify — no per-candidate-doc loop
                hits = verify_fn(per_term, toks, base, slop)
                if tomb_mask is not None and hits.size:
                    hits = hits[~tomb_mask[hits - shard_base]]
                out_q.extend([qid] * hits.size)
                out_d.extend(int(d) for d in hits)
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, dtype=np.int64),
                "doc_id": np.asarray(out_d, dtype=np.int64),
            }
        )

    if tomb_map is None:
        return _shard_group_apply(pq, verify, "query_id long, doc_id long")
    return _shard_cogroup_apply(pq, tomb_map, verify,
                                "query_id long, doc_id long")


def phrase_score_partials(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    phrases: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
    truncate: bool = True,
) -> DataFrame:
    """Per-shard (query_id, doc_id, score) partials for phrase-filtered BM25
    top-k, in ONE pass over the phrase terms' postings.

    ``truncate=False`` keeps EVERY phrase match instead of the per-(query,
    shard) top-k — required when partials are combined ACROSS indexes
    before ranking (fielded.bm25f_phrase_topk: a doc outside one field's
    shard top-k can still win on the cross-field sum). Still match-bounded:
    the output is exactly the phrase-match set, never conjunctive- or
    corpus-scale.

    Verification and scoring happen in the same cogrouped Arrow group: the
    positional intersection finds the exact phrase matches of a block, and
    BM25 is computed for just those matches from the SAME decoded block (the
    position offsets double as the tf arrays), summed in sorted-unique-term
    order — the exact float64 operation sequence of the brute-force oracle,
    so scores are bit-identical to bm25_wand_topk / operators/topk.py.

    Each per-(query, shard) partial is truncated to that query's k, so the
    downstream global rank window reads at most shards × Σk rows — and never
    more than the phrase-match count. This replaces the round-2 composition
    (unbounded k=2^30 conjunctive scoring pass + corpus-scale window before
    the match join), which was correct but a plan-level scale killer for
    phrases made of common terms.
    """
    # items are (qid, phrase, k) or (qid, phrase, k, slop): the optional 4th
    # element turns exact-phrase filtering into ordered proximity (≤ slop
    # intervening positions between consecutive tokens)
    parsed3 = _parse_phrases([(q[0], q[1]) for q in phrases])
    slop_map = {int(q[0]): int(q[3]) if len(q) > 3 else 0 for q in phrases}
    if len(slop_map) != len(phrases):
        raise ValueError("duplicate query_ids in a phrase/proximity batch")
    parsed = [(qid, toks, slop_map[qid]) for qid, toks in parsed3]
    kmap_py = {int(q[0]): int(q[2]) for q in phrases}
    if offsets:
        # deep paging: per-shard partials must keep offset+k rows for page
        # exactness (same argument as bm25_topk_paged)
        kmap_py = {qid: k + int(offsets.get(qid, 0))
                   for qid, k in kmap_py.items()}
    _ordered = ordered
    all_terms = sorted({t for _, ts, _ in parsed for t in ts})
    idf_map = {
        r["term"]: float(r["idf"])
        for r in term_stats.where(F.col("term").isin(all_terms)).collect()
    }
    pq = postings.where(F.col("term").isin(all_terms)).select(
        "term", "shard", "block_id", "doc_deltas", "tfs", "positions"
    )
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    k1, b = cfg.k1, cfg.b
    avgdl = float(avgdl)
    has_allow = allow_map is not None

    def score_verify(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        from bloqsenjin_spark.functions.scoring import (
            near_verify_block_unordered,
            phrase_verify_block,
        )

        verify_fn = phrase_verify_block if _ordered else near_verify_block_unordered
        shard = int(pl["shard"].iloc[0])
        shard_base = shard * dps
        dls = varint_decode(bytes(dl_pdf["dls"].iloc[0])).astype(np.float64)
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
            return empty
        by_term, decode = _positional_ctx(pl, shard, dps, bdocs)

        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for qid, toks, slop in parsed:
            uniq = list(dict.fromkeys(toks))
            maps = [by_term.get(t) for t in uniq]
            if any(m is None for m in maps):
                continue  # some term absent from this shard ⇒ no match here
            blocks = set(maps[0])
            for m in maps[1:]:
                blocks &= set(m)
            q_docs: list[np.ndarray] = []
            q_scores: list[np.ndarray] = []
            for bid in sorted(blocks):
                per_term = {t: decode(m[bid], bid) for t, m in zip(uniq, maps)}
                base = shard_base + bid * bdocs
                hits = verify_fn(per_term, toks, base, slop)
                if tomb_mask is not None and hits.size:
                    hits = hits[~tomb_mask[hits - shard_base]]
                if hits.size == 0:
                    continue
                score = np.zeros(hits.size, dtype=np.float64)
                dl_h = dls[hits - shard_base]
                for t in sorted(uniq):  # lexicographic = oracle's sum order
                    ids_t, _flat, offs_t = per_term[t]
                    tf_t = np.diff(offs_t).astype(np.float64)
                    score += idf_map[t] * bm25.tf_component_np(
                        tf_t[np.searchsorted(ids_t, hits)], dl_h, avgdl, k1, b
                    )
                q_docs.append(hits)
                q_scores.append(score)
            if not q_docs:
                continue
            docs = np.concatenate(q_docs)
            scs = np.concatenate(q_scores)
            k = kmap_py[qid]
            if truncate and docs.size > k:
                # exact: every global winner wins its shard
                order = np.lexsort((docs, -scs))[:k]
                docs, scs = docs[order], scs[order]
            out_q.append(np.full(docs.size, qid, dtype=np.int64))
            out_d.append(docs)
            out_s.append(scs)
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    dl = _with_tomb(doc_lens, tomb_map, allow_map)
    return _shard_cogroup_apply(pq, dl, score_verify, _PARTIAL_SCHEMA)


def phrase_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    phrases: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Phrase-filtered BM25 top-k → (query_id, rank, doc_id, score).
    ``allow_map``/``tomb_map``: the same per-shard bitmap side-inputs as
    bm25_wand_topk — matches outside the allow-set (or tombstoned) are
    masked before the per-shard k-truncation. ``offsets``: optional deep
    paging (query_id → rows to skip), page (offset, offset+k] with GLOBAL
    ranks — bm25_topk_paged's contract for the phrase family.

    Single-pass plan: verify + score inside one cogrouped pass over the
    phrase terms' postings (phrase_score_partials), then a global rank window
    whose input is per-shard-k-truncated phrase matches only — O(shards · Σk)
    rows, never conjunctive- or corpus-scale."""
    partial = phrase_score_partials(
        postings, doc_lens, term_stats, avgdl, phrases, cfg,
        tomb_map=tomb_map, allow_map=allow_map, ordered=ordered,
        offsets=offsets,
    )
    kmap = F.create_map(
        *[x for q in phrases for x in (F.lit(int(q[0])), F.lit(int(q[2])))]
    )
    offsets = offsets or {}
    omap = F.create_map(
        *[x for q in phrases
          for x in (F.lit(int(q[0])), F.lit(int(offsets.get(int(q[0]), 0))))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    off = omap[F.col("query_id")]
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > off)
               & (F.col("rank") <= off + kmap[F.col("query_id")]))
        .select("query_id", "rank", "doc_id", "score")
    )


def near_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    near_queries: list[tuple[int, str, int, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Proximity-filtered BM25 top-k: ``(query_id, phrase, k, slop)`` —
    matches within slop ranked by BM25 over the query's deduped terms.
    ``ordered=True``: tokens in query order (phrase_bm25_topk IS this
    operator at slop 0, property-tested); ``ordered=False``: the symmetric
    window semantics of near_match_positional(ordered=False) — all distinct
    terms within (n_tokens−1)·(slop+1) positions, any order. Identical
    single-pass plan either way: verify + score in one cogrouped pass,
    per-shard k-truncation, match-bounded rank window."""
    return phrase_bm25_topk(
        postings, doc_lens, term_stats, avgdl, near_queries, cfg,
        tomb_map=tomb_map, allow_map=allow_map, ordered=ordered,
        offsets=offsets,
    )


def _parse_phrase_terms_queries(queries: list) -> list:
    """Normalize/validate a phrase×terms batch → [(qid, ptoks, loose,
    mode, k, negs, wmap, slop)]. Tuples are (qid, phrase, terms, mode, k
    [, negs [, boosts [, slop]]]) — trailing slots optional, mirroring the
    plain kernel's 4/5/6-tuple convention."""
    out = []
    seen = set()
    for q in queries:
        qid, phrase, loose, mode, k = int(q[0]), q[1], list(q[2]), q[3], int(q[4])
        if qid in seen:
            raise ValueError("duplicate query_ids in a phrase×terms batch")
        seen.add(qid)
        if mode not in ("disjunctive", "conjunctive"):
            raise ValueError(f"unknown query mode {mode!r}")
        negs = tuple(sorted(set(q[5]))) if len(q) > 5 and q[5] else ()
        wmap = dict(q[6]) if len(q) > 6 and q[6] else {}
        bad = {t: w for t, w in wmap.items() if float(w) < 0}
        if bad:
            raise ValueError(
                f"negative term boosts break exact pruning: {bad} "
                f"(query_id={qid})"
            )
        slop = int(q[7]) if len(q) > 7 else 0
        ptoks = [t for t in _re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        if not ptoks:
            raise ValueError(
                f"query_id={qid}: empty phrase — use bm25_wand_topk for "
                "term-only queries"
            )
        out.append((qid, ptoks, loose, mode, k, negs, wmap, slop))
    return out


def phrase_terms_score_partials(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Per-shard (query_id, doc_id, score) partials for PHRASE × LOOSE-TERM
    boolean queries — Lucene's most common mixed shape, ``"data engine"
    spark -nsfw``: a BooleanQuery holding one phrase clause plus loose term
    clauses (reference parity: the reference's form/query ingestion layer,
    /root/reference/pkg/rest/server.go:256-266, exposes exactly this
    user-facing query shape; the engine composes it from the verified
    phrase and term kernels).

    Tuples: ``(qid, phrase, terms, mode, k[, negs[, boosts[, slop]]])``.
    Semantics (both oracle-reproduced in SQL):

    - eligibility — ``mode='conjunctive'``: the phrase matches AND every
      loose term occurs; ``'disjunctive'``: the phrase matches OR any
      loose term occurs. MUST_NOT terms exclude on occurrence either way.
    - score — the engine's distinct-term set semantics: Σ contributions of
      loose terms PRESENT in the doc, plus Σ contributions of phrase-only
      terms iff the PHRASE matched (a term in both sets scores once, by
      presence). Scored as loose-sum + phrase-only-sum (each in sorted-term
      order) so the serving twin is float-order-identical.

    ONE cogrouped pass over the union of the phrase terms' and loose
    terms' postings: positions ride ONLY on phrase-term rows (the loose
    rows' positional payload is nulled before the exchange), phrase blocks
    verify with the shared positional kernel, loose blocks score with the
    shared BM25 closed form, and block-max pruning stays exact because a
    block's bound is Σ loose bmax·w (present terms) + Σ phrase-term bmax·w
    (phrase-candidate blocks only — a phrase can only match where every
    phrase term has postings). Per-(query, shard) partials are k-truncated
    (every global winner wins its shard), so the global rank window reads
    O(shards · Σk) rows."""
    parsed = _parse_phrase_terms_queries(queries)
    if "positions" not in postings.columns:
        raise ValueError(
            "phrase×terms queries need a positional index — build with "
            "IndexConfig(positions=True)"
        )
    kmap_py = {qid: k for qid, _p, _l, _m, k, _n, _w, _s in parsed}
    if offsets:
        kmap_py = {qid: k + int(offsets.get(qid, 0))
                   for qid, k in kmap_py.items()}
    phrase_terms = sorted({t for _, ptoks, *_ in parsed for t in ptoks})
    score_terms = sorted(
        set(phrase_terms)
        | {t for _, _p, loose, *_ in parsed for t in loose}
    )
    neg_terms = sorted({t for *_front, negs, _w, _s in parsed for t in negs})
    all_terms = sorted(set(score_terms) | set(neg_terms))
    idf_map = {
        r["term"]: float(r["idf"])
        for r in term_stats.where(F.col("term").isin(score_terms)).collect()
    }
    # positions ride only on phrase-term rows — loose/neg rows carry NULL so
    # the cogroup exchange never ships positional payloads the scorer
    # doesn't read (the same projection discipline as wand_score_partials)
    pq = postings.where(F.col("term").isin(all_terms)).select(
        "term", "shard", "block_id", "block_max_score", "doc_deltas", "tfs",
        F.when(F.col("term").isin(phrase_terms), F.col("positions"))
        .alias("positions"),
    )
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    k1, b = cfg.k1, cfg.b
    avgdl = float(avgdl)
    has_allow = allow_map is not None
    _ordered = ordered

    def score_verify(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        from bloqsenjin_spark.functions.scoring import (
            near_verify_block_unordered,
            phrase_verify_block,
        )

        verify_fn = (phrase_verify_block if _ordered
                     else near_verify_block_unordered)
        shard = int(pl["shard"].iloc[0])
        shard_base = shard * dps
        dls = varint_decode(bytes(dl_pdf["dls"].iloc[0])).astype(np.float64)
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
            return empty
        by_term, decode_pos = _positional_ctx(pl, shard, dps, bdocs)
        bmax_by: dict = {}
        for i, (t, bi, bm) in enumerate(zip(pl["term"], pl["block_id"],
                                            pl["block_max_score"])):
            bmax_by.setdefault(t, {})[int(bi)] = float(bm)
        dd = pl["doc_deltas"].to_numpy()
        tfb = pl["tfs"].to_numpy()
        plain_cache: dict[int, tuple] = {}

        def decode_plain(i: int, block_base: int):
            got = plain_cache.get(i)
            if got is None:
                ids = delta_decode(bytes(dd[i]), base=block_base)
                tfs_ = varint_decode(bytes(tfb[i])).astype(np.float64)
                got = plain_cache[i] = (ids, tfs_)
            return got

        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        out_s: list[np.ndarray] = []
        for qid, ptoks, loose, mode, _k, negs, wmap, slop in parsed:
            p_uniq = list(dict.fromkeys(ptoks))
            loose_set = sorted(set(loose))
            phrase_only = sorted(set(p_uniq) - set(loose_set))
            conj = mode == "conjunctive"
            pmaps = [by_term.get(t) for t in p_uniq]
            if any(m is None for m in pmaps):
                pblocks: set = set()
            else:
                pblocks = set(pmaps[0])
                for m in pmaps[1:]:
                    pblocks &= set(m)
            loose_present = [t for t in loose_set if t in by_term]
            if conj:
                if not pblocks or len(loose_present) != len(loose_set):
                    continue
                cand = set(pblocks)
                for t in loose_set:
                    cand &= set(by_term[t])
            else:
                cand = set(pblocks)
                for t in loose_present:
                    cand.update(by_term[t])
            if not cand:
                continue

            def wt(t):
                return float(wmap.get(t, 1.0)) if wmap else 1.0

            ubs = {}
            for bi in cand:
                ub = sum(
                    bmax_by[t].get(bi, 0.0) * wt(t) for t in loose_present
                )
                if bi in pblocks:
                    ub += sum(bmax_by[t][bi] * wt(t) for t in phrase_only)
                ubs[bi] = ub
            ordered_blocks = sorted(cand, key=lambda bi: (-ubs[bi], bi))

            docs_acc: list[np.ndarray] = []
            scores_acc: list[np.ndarray] = []
            n_found = 0
            threshold = -np.inf
            kq = kmap_py[qid]
            for bi in ordered_blocks:
                if n_found >= kq and ubs[bi] < threshold - 1e-12:
                    break
                block_base = shard_base + bi * bdocs
                phrase_mask = np.zeros(bdocs, dtype=bool)
                if bi in pblocks:
                    per_term = {
                        t: decode_pos(m[bi], bi)
                        for t, m in zip(p_uniq, pmaps)
                    }
                    hits = verify_fn(per_term, ptoks, block_base, slop)
                    if hits.size:
                        phrase_mask[hits - block_base] = True
                acc_l = np.zeros(bdocs, dtype=np.float64)
                acc_p = np.zeros(bdocs, dtype=np.float64)
                loose_cnt = np.zeros(bdocs, dtype=np.int32)
                for t in loose_set:  # sorted order = serving's sum order
                    ri = by_term.get(t, {}).get(bi)
                    if ri is None:
                        continue
                    ids, tfs_ = decode_plain(ri, block_base)
                    off = ids - block_base
                    contrib = (idf_map[t] * wt(t)) * bm25.tf_component_np(
                        tfs_, dls[ids - shard_base], avgdl, k1, b
                    )
                    acc_l[off] += contrib
                    loose_cnt[off] += 1
                if phrase_mask.any():
                    for t in phrase_only:  # sorted order
                        ri = by_term[t].get(bi)
                        if ri is None:  # pragma: no cover — pblocks ⊆ blocks
                            continue
                        ids, tfs_ = decode_plain(ri, block_base)
                        off = ids - block_base
                        contrib = (idf_map[t] * wt(t)) * bm25.tf_component_np(
                            tfs_, dls[ids - shard_base], avgdl, k1, b
                        )
                        sel = phrase_mask[off]
                        acc_p[off[sel]] += contrib[sel]
                if conj:
                    elig = phrase_mask & (loose_cnt == len(loose_set))
                else:
                    elig = phrase_mask | (loose_cnt > 0)
                for nt in negs:  # MUST_NOT: block-local, complete
                    ri = by_term.get(nt, {}).get(bi)
                    if ri is not None:
                        nids, _ = decode_plain(ri, block_base)
                        elig[nids - block_base] = False
                offs = np.flatnonzero(elig)
                if offs.size and tomb_mask is not None:
                    offs = offs[~tomb_mask[offs + (block_base - shard_base)]]
                if offs.size == 0:
                    continue
                docs_acc.append(offs + block_base)
                scores_acc.append(acc_l[offs] + acc_p[offs])
                n_found += offs.size
                if n_found >= kq:
                    allx = np.concatenate(scores_acc)
                    threshold = np.partition(
                        allx, allx.size - kq)[allx.size - kq]
            if not docs_acc:
                continue
            docs = np.concatenate(docs_acc)
            scs = np.concatenate(scores_acc)
            if docs.size > kq:
                order = np.lexsort((docs, -scs))[:kq]
                docs, scs = docs[order], scs[order]
            out_q.append(np.full(docs.size, qid, dtype=np.int64))
            out_d.append(docs)
            out_s.append(scs)
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    dl = _with_tomb(doc_lens, tomb_map, allow_map)
    return _shard_cogroup_apply(pq, dl, score_verify, _PARTIAL_SCHEMA)


def phrase_terms_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Phrase × loose-terms top-k → (query_id, rank, doc_id, score) —
    Lucene's BooleanQuery with a phrase clause plus term clauses (see
    phrase_terms_score_partials for tuples and semantics). ``loose=[]``
    degenerates to phrase_bm25_topk exactly (property-tested);
    ``offsets``: deep paging with GLOBAL ranks (the family contract)."""
    partial = phrase_terms_score_partials(
        postings, doc_lens, term_stats, avgdl, queries, cfg,
        tomb_map=tomb_map, allow_map=allow_map, ordered=ordered,
        offsets=offsets,
    )
    kmap = F.create_map(
        *[x for q in queries for x in (F.lit(int(q[0])), F.lit(int(q[4])))]
    )
    offsets = offsets or {}
    omap = F.create_map(
        *[x for q in queries
          for x in (F.lit(int(q[0])), F.lit(int(offsets.get(int(q[0]), 0))))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    off = omap[F.col("query_id")]
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > off)
               & (F.col("rank") <= off + kmap[F.col("query_id")]))
        .select("query_id", "rank", "doc_id", "score")
    )


def phrase_match_twostage(
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
    """Exact phrase search → (query_id, doc_id) over a POSITIONLESS index.

    Two-stage fallback plan: (1) the inverted index prunes to the
    CONJUNCTIVE candidates of the phrase's terms (posting intersection), (2)
    candidates verify exactly by token-sequence containment against the
    source text. Stage 2 re-scans the documents table — at web scale prefer
    ``phrase_match_positional`` over a positions=True index, which never
    leaves the postings table.
    """
    from bloqsenjin_spark.functions.text import tokens

    conj = []
    phrase_norm: dict[int, str] = {}
    for qid, phrase in phrases:
        toks = [t for t in _re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        phrase_norm[qid] = " ".join(toks)
        conj.append((qid, sorted(set(toks)), "conjunctive", 2**31 - 1))
    # candidates are the conjunctive MATCH SET, not a ranking: consume the
    # per-shard partials directly — no global rank window over an unbounded
    # conjunctive set (each doc appears once per query already)
    cand = wand_score_partials(
        postings, doc_lens, term_stats, avgdl, conj, cfg
    ).select("query_id", "doc_id")
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


def neg_phrase_exclusion_map(
    postings: DataFrame,
    neg_phrases: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    ordered: bool = True,
) -> DataFrame:
    """MUST_NOT-phrase side-input → (shard, tomb binary): the union of the
    phrases' match sets as per-shard exclusion bitmaps (the tombstone
    carrier), built distributively from the positional matcher — the
    composition layer for ``spark -"data engine"`` (COMPOSITION.md note 4).
    ``neg_phrases``: strings, or (phrase, slop) pairs for proximity
    exclusion. OR-merge with an existing tombstone map via
    operators.bitmaps.or_bitmap_maps; exclusion composes EXACTLY with every
    ranked form because the bitmap masks before per-shard k-truncation."""
    from bloqsenjin_spark.operators.bitmaps import shard_bitmap_df

    qs = []
    for i, p in enumerate(neg_phrases):
        if isinstance(p, (tuple, list)):
            qs.append((i, str(p[0]), int(p[1])))
        else:
            qs.append((i, str(p), 0))
    matches = near_match_positional(postings, qs, cfg, ordered=ordered)
    return shard_bitmap_df(matches.select("doc_id").distinct(), cfg,
                           bitmap_col="tomb")


def bm25_topk_must_not_phrase(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    neg_phrases: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """Ranked boolean queries with MUST_NOT **phrase** clauses —
    ``spark -"data engine"``: docs containing any of ``neg_phrases`` (as an
    exact phrase / proximity window) are excluded from EVERY query's
    ranking. Composition of two verified pieces: the positional matcher
    builds a per-shard exclusion bitmap (neg_phrase_exclusion_map), which
    rides the tombstone side-input into the unchanged scoring kernel —
    exclusion before per-shard top-k, so k stays exact; no post-filtering.
    Needs a positions=True index (the positive scoring itself does not)."""
    from bloqsenjin_spark.operators.bitmaps import or_bitmap_maps

    excl = neg_phrase_exclusion_map(postings, neg_phrases, cfg,
                                    ordered=ordered)
    tomb = excl if tomb_map is None else or_bitmap_maps(tomb_map, excl)
    return bm25_wand_topk(postings, doc_lens, term_stats, avgdl, queries,
                          cfg, tomb_map=tomb, allow_map=allow_map)


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
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """→ TOPK_RESULT. ``queries`` is the (small) reference query set — its
    terms and per-term idf are broadcast with the scorer closure; postings are
    filtered to query terms so only the needed term shards are ever scanned
    (predicate pushdown on the postings table's ``term`` column).

    ``tomb_map``: optional per-shard tombstone bitmap table
    (plans.deletes.tombstone_bitmap_df), joined beside doc_lens and unpacked
    inside the shard scorer — deleted docs are masked before top-k selection
    without any driver-side tombstone materialization.

    ``allow_map``: optional per-shard ALLOW bitmap (shard, allow binary —
    operators.bitmaps.shard_bitmap_df over an eligible-doc set): restricts
    ranking to the allowed docs, masked BEFORE top-k with full-corpus stats
    — metadata-filtered search done plan-right (post-rank filtering breaks
    k; pre-join filtering re-shuffles the corpus). Shards with no allow row
    are skipped without decoding a block."""
    partial = wand_score_partials(
        postings, doc_lens, term_stats, avgdl, queries, cfg,
        tomb_map=tomb_map, allow_map=allow_map,
    )
    kmap = F.create_map(
        *[x for q in queries for x in (F.lit(q[0]), F.lit(q[3]))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kmap[F.col("query_id")])
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_topk_paged(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    offsets: dict[int, int],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """Deep paging: return page (offset, offset+k] of each query's ranking
    (``offsets`` maps query_id → #rows to skip; the output ``rank`` is the
    GLOBAL rank, so page boundaries are stable across requests).

    Plan: the identical single scoring pass, with per-shard partials
    truncated at offset+k — every row of the target page wins a
    top-(offset+k) slot in its own shard, so exactness is preserved — then
    the global window keeps ranks in (offset, offset+k]. Deep offsets cost
    O(shards·(offset+k)) window input, the standard deep-paging tradeoff."""
    deep = [
        (q[0], q[1], q[2], int(q[3]) + int(offsets.get(q[0], 0)))
        + tuple(q[4:])
        for q in queries
    ]
    partial = wand_score_partials(
        postings, doc_lens, term_stats, avgdl, deep, cfg,
        tomb_map=tomb_map, allow_map=allow_map,
    )
    kmap = F.create_map(
        *[x for q in queries for x in (F.lit(q[0]), F.lit(int(q[3])))]
    )
    omap = F.create_map(
        *[x for q in queries
          for x in (F.lit(q[0]), F.lit(int(offsets.get(q[0], 0))))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    off = omap[F.col("query_id")]
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > off)
               & (F.col("rank") <= off + kmap[F.col("query_id")]))
        .select("query_id", "rank", "doc_id", "score")
    )


def wand_score_partials(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """Per-shard (query_id, doc_id, score) partials of the block-max scorer —
    bm25_wand_topk without the global rank window. Each doc appears at most
    once per query (it lives in one shard), so for match-set consumers
    (phrase_match_twostage candidates) this IS the result: no window, no
    per-query single-reducer sort."""
    # queries may be 4-tuples, 5-tuples with MUST_NOT terms (scored by the
    # kernel as block-local exclusions — neg terms' postings must be scanned
    # too, so they join the pushed term filter), or 6-tuples adding a
    # per-term boost dict (contribution AND block-max ub scale by the
    # weight, so pruning stays exact for w ≥ 0 — validated here, see
    # score_shard_blocks)
    from bloqsenjin_spark.functions.scoring import _check_boosts

    _check_boosts(queries)
    all_terms = sorted(
        {t for q in queries for t in q[1]}
        | {t for q in queries if len(q) > 4 and q[4] for t in q[4]}
    )
    idf_map = {
        r["term"]: float(r["idf"])
        for r in term_stats.where(F.col("term").isin(all_terms)).collect()
    }
    # explicit projection: BM25 scoring never reads the positional payload —
    # without the select, a positions=True index would drag positions blobs
    # (≈ token-count bytes) through the cogroup exchange for every query
    pq = postings.select(
        "term", "shard", "block_id", "block_max_score", "doc_deltas", "tfs"
    ).where(F.col("term").isin(all_terms))
    dl = _with_tomb(doc_lens, tomb_map, allow_map)
    return _shard_cogroup_apply(
        pq, dl,
        _shard_scorer(queries, idf_map, float(avgdl), cfg,
                      has_allow=allow_map is not None),
        _PARTIAL_SCHEMA,
    )


def bm25_topk_filtered(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list[tuple[int, list[str], str, int]],
    allowed_docs: DataFrame,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Metadata-filtered top-k: rank only ``allowed_docs`` (any docID
    relation, e.g. ``docs.where(lang == 'en')``), scored with FULL-corpus
    statistics — the faceted-search contract (the filter changes eligibility,
    not the scoring model).

    Plan shape: the allow-set becomes per-shard bitmaps
    (operators.bitmaps.shard_bitmap_df — built distributively, never
    collected) left-joined beside doc_lens into the existing shard cogroup;
    the scorer masks ineligible docs BEFORE top-k selection, so per-shard
    partials stay k-truncated and exact. Zero extra shuffle of postings, no
    post-rank filtering (which would break k), no corpus re-join."""
    from bloqsenjin_spark.operators.bitmaps import shard_bitmap_df

    allow_map = shard_bitmap_df(
        allowed_docs.select(F.col(id_col).alias("doc_id")), cfg,
        bitmap_col="allow",
    )
    return bm25_wand_topk(
        postings, doc_lens, term_stats, avgdl, queries, cfg,
        tomb_map=tomb_map, allow_map=allow_map,
    )


def expand_prefix_terms(
    term_stats: DataFrame,
    prefix_queries: list[tuple[int, str, int]],
    max_expansions: int = 100,
) -> dict[int, list[str]]:
    """Expand EVERY prefix in ONE Spark job → {query_id: [terms]} (each list
    capped at ``max_expansions`` by df DESC, term ASC — the standard
    head-biased expansion rule, identical to the oracle's SQL shape).

    Plan: broadcast the tiny (query_id, prefix) relation against the term
    dictionary (one distributed scan of the vocab-sized term_stats regardless
    of batch size — a broadcast nested-loop join with P startswith tests per
    term), then a per-query rank window caps the expansion. The collect is
    bounded by prefixes × max_expansions rows. This replaces the round-3
    per-prefix collect() loop, which cost P sequential dictionary-scan jobs
    for a P-prefix batch."""
    spark = term_stats.sparkSession
    q = spark.createDataFrame(
        [(int(qid), str(p)) for qid, p, _k in prefix_queries],
        "query_id long, prefix string",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    rows = (
        term_stats.select("term", "df")
        .join(F.broadcast(q), F.col("term").startswith(F.col("prefix")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_expansions)
        .select("query_id", "term", "rn")
        .collect()
    )
    exp: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rn"])):
        exp.setdefault(int(r["query_id"]), []).append(r["term"])
    return exp


def prefix_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    prefix_queries: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 100,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> DataFrame:
    """Prefix-expanded disjunctive top-k (the PrefixQuery/wildcard analog):
    each prefix expands to its matching vocabulary terms — capped at
    ``max_expansions`` by df DESC, term ASC, the standard head-biased
    expansion cap — then ranks as ONE disjunctive BM25 query over the
    expansion set.

    The expansion is ONE batch job over the term dictionary for the whole
    prefix set (expand_prefix_terms), bounded by prefixes × max_expansions —
    at serving scale it comes from the in-memory dictionary replica
    (IndexServer.prefix_topk_batch), never the postings. The ranking pass is
    the ordinary bm25_wand_topk plan over the expanded terms' postings."""
    if len({q[0] for q in prefix_queries}) != len(prefix_queries):
        raise ValueError("duplicate query_ids in prefix_queries")
    exp = expand_prefix_terms(term_stats, prefix_queries, max_expansions)
    negs = must_not or {}
    queries = [
        (int(qid), exp[int(qid)], "disjunctive", int(k),
         tuple(negs.get(int(qid), ())))
        for qid, _p, k in prefix_queries
        if exp.get(int(qid))
    ]
    if not queries:
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries,
                          cfg, offsets, tomb_map, allow_map)


def wildcard_parts(pattern: str) -> tuple[str, str]:
    """→ (literal_prefix, anchored_regex) for a wildcard pattern
    (``*`` = any run, ``?`` = exactly one char). The literal prefix (up to
    the first wildcard) drives index pruning — dictionary range scans on
    both tiers; the regex is the exact match predicate. Normalized tokens
    are [a-z0-9]+, so the regex body needs no escaping and is portable
    verbatim across Python re, Spark regexp_like, and DuckDB RE2."""
    import re as _re

    p = str(pattern)
    prefix = _re.match(r"[^*?]*", p).group(0)
    body = "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in p
    )
    return prefix, "^" + body + "$"


def expand_wildcard_terms(
    term_stats: DataFrame,
    wc_queries: list[tuple[int, str, int]],
    max_expansions: int = 100,
) -> dict[int, list[str]]:
    """Expand EVERY wildcard pattern in ONE Spark job → {query_id: [terms]}
    (capped at ``max_expansions`` by df DESC, term ASC — the shared
    head-biased expansion rule). Same broadcast-join shape as
    expand_prefix_terms, with the dictionary scan pruned by the pattern's
    literal prefix (pushdown-able startswith) before the regex test.
    Leading-wildcard patterns (empty literal prefix) are REFUSED — they
    force a full vocabulary scan per query (Lucene's
    allowLeadingWildcard=false default)."""
    for qid, p, _k in wc_queries:
        pre, _rx = wildcard_parts(p)
        if not pre:
            raise ValueError(
                f"leading wildcard in pattern {p!r} (query_id={qid}) forces "
                "a full-vocabulary scan — anchor the pattern with at least "
                "one literal character"
            )
    spark = term_stats.sparkSession
    q = spark.createDataFrame(
        [(int(qid), *wildcard_parts(p)) for qid, p, _k in wc_queries],
        "query_id long, prefix string, rx string",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("df"), F.asc("term"))
    rows = (
        term_stats.select("term", "df")
        .join(
            F.broadcast(q),
            F.col("term").startswith(F.col("prefix"))
            & F.regexp_like(F.col("term"), F.col("rx")),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_expansions)
        .select("query_id", "term", "rn")
        .collect()
    )
    exp: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rn"])):
        exp.setdefault(int(r["query_id"]), []).append(r["term"])
    return exp


def wildcard_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    wc_queries: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 100,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> DataFrame:
    """Wildcard-expanded disjunctive top-k — Lucene's WildcardQuery:
    ``(query_id, pattern, k)`` where ``*`` matches any run and ``?``
    exactly one character. Expansion = ONE prefix-pruned dictionary job
    (expand_wildcard_terms; leading wildcards refused loudly); ranking =
    the ordinary disjunctive pass over the expansion set, so
    paging/tombstones/allow-sets/MUST_NOT compose exactly as on prefix
    search. A pattern with no wildcard degenerates to its exact term;
    ``pre*`` ≡ prefix_bm25_topk(pre) (property-tested)."""
    if len({q[0] for q in wc_queries}) != len(wc_queries):
        raise ValueError("duplicate query_ids in wc_queries")
    exp = expand_wildcard_terms(term_stats, wc_queries, max_expansions)
    negs = must_not or {}
    queries = [
        (int(qid), exp[int(qid)], "disjunctive", int(k),
         tuple(negs.get(int(qid), ())))
        for qid, _p, k in wc_queries
        if exp.get(int(qid))
    ]
    if not queries:
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries,
                          cfg, offsets, tomb_map, allow_map)


def _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries, cfg,
                   offsets, tomb_map, allow_map):
    """Dispatch an expanded query batch to the plain or deep-paged ranking
    pass — the composition point that gives prefix/fuzzy/fuzzy-multi search
    the same paging contract as bm25_topk_paged."""
    if offsets:
        return bm25_topk_paged(
            postings, doc_lens, term_stats, avgdl, queries, offsets, cfg,
            tomb_map=tomb_map, allow_map=allow_map,
        )
    return bm25_wand_topk(
        postings, doc_lens, term_stats, avgdl, queries, cfg,
        tomb_map=tomb_map, allow_map=allow_map,
    )


def _del1_arr(t):
    """All single-character deletions of string Column ``t`` as an array
    Column — pure Catalyst (Column.substr takes Column offsets)."""
    n = F.length(t)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(t.substr(F.lit(1), i - 1), t.substr(i + 1, n)),
    )


def deletion_variants_col(t, max_d: int):
    """All ≤``max_d``-deletion variants of string Column ``t`` (including t)
    as a distinct array Column — the Catalyst twin of
    IndexServer._deletes, shared by the batch SymSpell expansion join and
    plans.build.write_fuzzy_index so the two variant generators can't
    drift."""
    if max_d == 0:
        return F.array(t)
    d1 = _del1_arr(t)
    if max_d == 1:
        return F.array_distinct(F.concat(F.array(t), d1))
    if max_d == 2:
        d2 = F.flatten(F.transform(d1, _del1_arr))
        return F.array_distinct(F.concat(F.array(t), d1, d2))
    raise ValueError(
        f"deletion variants capped at distance {_SYMSPELL_MAX_DIST} "
        f"(got {max_d}) — variant fan-out is ~|term|^d"
    )


def _deletes_py(word: str, max_dist: int) -> set[str]:
    """All strings reachable from ``word`` by ≤ max_dist deletions (incl.
    word) — the driver-side (tiny query set) twin of _del1_arr; same
    algorithm as the serving tier's SymSpell index."""
    out = {word}
    frontier = {word}
    for _ in range(max_dist):
        nxt = {w[:i] + w[i + 1:] for w in frontier for i in range(len(w))}
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


_SYMSPELL_MAX_DIST = 2  # variant fan-out ~|term|^d per term; Lucene's cap


def expand_fuzzy_terms(
    term_stats: DataFrame,
    fuzzy_queries: list[tuple[int, str, int, int]],
    max_expansions: int = 50,
) -> dict[int, list[str]]:
    """Expand every fuzzy query word in ONE Spark job → {query_id: [terms]}:
    vocabulary terms within ``max_dist`` Levenshtein edits of the query word,
    capped at ``max_expansions`` by (distance ASC, df DESC, term ASC) —
    closest first, then the head-biased rule shared with prefix expansion.

    Plan (dist ≤ 2): the SymSpell deletion-neighborhood join, distributed —
    the dictionary explodes into its ≤d-deletion variants (pure Catalyst:
    nested transform + substr, no UDF), the query words' variants (a tiny
    driver-computed relation) broadcast-join on the variant string, and ONLY
    the joined candidates pay a Levenshtein verify. Lossless (lev(w,t) ≤ d ⟹
    a shared deletion variant), and it replaces the round-4 V × Q crossJoin
    scan with an equi-join whose left side is ~|term|^d variant rows — the
    same structure the serving tier holds in memory
    (IndexServer._fuzzy_candidates), here as a shuffle-shaped plan that
    survives a 100M-term vocabulary. dist > 2 falls back to the scan."""
    return {
        qid: [t for t, _d in pairs]
        for qid, pairs in expand_fuzzy_terms_with_dist(
            term_stats, fuzzy_queries, max_expansions
        ).items()
    }


def expand_fuzzy_terms_with_dist(
    term_stats: DataFrame,
    fuzzy_queries: list[tuple[int, str, int, int]],
    max_expansions: int = 50,
) -> dict[int, list[tuple[str, int]]]:
    """expand_fuzzy_terms, returning (term, distance) pairs in expansion
    order — the distance feeds multi-word fuzzy's optional per-term decay
    boost (fuzzy_multi_bm25_topk). Same one-job SymSpell plan."""
    max_d = max((int(q[2]) for q in fuzzy_queries), default=0)
    if max_d > _SYMSPELL_MAX_DIST:
        return _expand_fuzzy_scan(term_stats, fuzzy_queries, max_expansions)
    spark = term_stats.sparkSession
    qv = spark.createDataFrame(
        [
            (int(qid), str(w), int(d), v)
            for qid, w, d, _k in fuzzy_queries
            for v in sorted(_deletes_py(str(w), int(d)))
        ],
        "query_id long, word string, max_dist int, variant string",
    )
    base = term_stats.select("term", "df")
    variants = deletion_variants_col(F.col("term"), max_d)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    rows = (
        base.select("term", "df", F.explode(variants).alias("variant"))
        .join(F.broadcast(qv), "variant")
        .select("query_id", "word", "max_dist", "term", "df")
        .distinct()  # a (word, term) pair can share many variants
        .withColumn("dist", F.levenshtein(F.col("term"), F.col("word")))
        .where(F.col("dist") <= F.col("max_dist"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_expansions)
        .select("query_id", "term", "rn", "dist")
        .collect()
    )
    exp: dict[int, list[tuple[str, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rn"])):
        exp.setdefault(int(r["query_id"]), []).append(
            (r["term"], int(r["dist"]))
        )
    return exp


def _expand_fuzzy_scan(
    term_stats: DataFrame,
    fuzzy_queries: list[tuple[int, str, int, int]],
    max_expansions: int = 50,
) -> dict[int, list[tuple[str, int]]]:
    """The round-4 scan-based expansion (V × Q Levenshtein over a broadcast
    crossJoin) — kept as the dist > 2 fallback and the property-test twin of
    the SymSpell join."""
    spark = term_stats.sparkSession
    q = spark.createDataFrame(
        [(int(qid), str(w), int(d)) for qid, w, d, _k in fuzzy_queries],
        "query_id long, word string, max_dist int",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    rows = (
        term_stats.select("term", "df")
        .crossJoin(F.broadcast(q))
        # distance computed ONCE per (term, word) pair: project-then-filter
        # (a levenshtein in the join condition would be re-evaluated by the
        # dist projection — Catalyst doesn't share subexpressions across
        # Join and Project)
        .withColumn("dist", F.levenshtein(F.col("term"), F.col("word")))
        .where(F.col("dist") <= F.col("max_dist"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= max_expansions)
        .select("query_id", "term", "rn", "dist")
        .collect()
    )
    exp: dict[int, list[tuple[str, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rn"])):
        exp.setdefault(int(r["query_id"]), []).append(
            (r["term"], int(r["dist"]))
        )
    return exp


def fuzzy_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    fuzzy_queries: list[tuple[int, str, int, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 50,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> DataFrame:
    """Typo-tolerant top-k (the FuzzyQuery analog): ``(query_id, word,
    max_dist, k)`` expands to vocabulary terms within ``max_dist`` edits —
    one batch dictionary job, distance-then-df-ranked, capped — then ranks
    as ONE disjunctive BM25 query over the expansion set via the ordinary
    bm25_wand_topk plan."""
    if len({q[0] for q in fuzzy_queries}) != len(fuzzy_queries):
        raise ValueError("duplicate query_ids in fuzzy_queries")
    exp = expand_fuzzy_terms(term_stats, fuzzy_queries, max_expansions)
    negs = must_not or {}
    queries = [
        (int(qid), exp[int(qid)], "disjunctive", int(k),
         tuple(negs.get(int(qid), ())))
        for qid, _w, _d, k in fuzzy_queries
        if exp.get(int(qid))
    ]
    if not queries:
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries,
                          cfg, offsets, tomb_map, allow_map)


def _compose_fuzzy_multi(expansions_per_word, qid: int, k: int,
                         distance_decay: "float | None", negs=(),
                         mode: str = "disjunctive"):
    """Compose per-word (term, dist) expansion lists into ONE kernel query
    tuple: union of the words' expansion sets, per-term MIN distance across
    words, optional per-term boost = decay ** min_dist (riding the kernel's
    exact-pruning boost path). ``mode="conjunctive"`` is the AND reading —
    EVERY word must match somewhere (typo-tolerated): each word is a
    kernel conjunctive GROUP and each term carries the set of words whose
    expansions contain it (the per-query 7th-slot groups map), so a doc
    matches iff every word's expansion set hits it. Shared by the Spark
    and serving fuzzy-multi paths so the composition rule can't drift.
    Returns None when no match is possible (no expansions at all; for
    conjunctive, ANY word with an empty expansion set)."""
    best: dict[str, int] = {}
    groups: dict[str, set[int]] = {}
    n_words = len(expansions_per_word)
    for wi, pairs in enumerate(expansions_per_word):
        for t, d in pairs:
            d = int(d)
            if t not in best or d < best[t]:
                best[t] = d
            groups.setdefault(t, set()).add(wi)
    conj = mode == "conjunctive"
    if not best or (conj and
                    {g for gs in groups.values() for g in gs} !=
                    set(range(n_words))):
        return None
    terms = sorted(best)
    negs = tuple(negs)
    boosts = (
        {t: float(distance_decay) ** best[t] for t in terms}
        if distance_decay is not None else {}
    )
    if conj:
        gmap = {t: tuple(sorted(groups[t])) for t in terms}
        return (int(qid), terms, "conjunctive", int(k), negs, boosts, gmap)
    if distance_decay is None:
        if not negs:
            return (int(qid), terms, "disjunctive", int(k))
        return (int(qid), terms, "disjunctive", int(k), negs)
    return (int(qid), terms, "disjunctive", int(k), negs, boosts)


def fuzzy_multi_bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    multi_queries: list[tuple[int, list[str], int, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 50,
    distance_decay: "float | None" = None,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
    mode: str = "disjunctive",
) -> DataFrame:
    """MULTI-word typo-tolerant top-k — ``(query_id, [words], max_dist, k)``,
    the real-user form of fuzzy search ("helo wrold"): each word expands
    independently under the single-word rule (SymSpell deletion-neighborhood
    candidates, Levenshtein ≤ max_dist, ranked distance ASC / df DESC / term
    ASC, capped PER WORD at ``max_expansions``), then the query ranks as ONE
    disjunctive BM25 query over the union of the expansion sets.

    ``distance_decay``: optional down-weighting of farther matches — each
    term's contribution scales by decay ** min-distance(term, query words)
    via the kernel's per-term boost path, so block-max pruning stays exact
    (boosts ≥ 0). Dyadic decays (0.5, 0.25) reproduce bit-identically across
    engines. A 1-word query with no decay ≡ fuzzy_bm25_topk
    (property-tested).

    Plan: ALL (query, word) pairs expand in the SAME one Spark job
    (expand_fuzzy_terms_with_dist — the batch SymSpell equi-join), then the
    ordinary bm25_wand_topk pass over the union terms' postings."""
    if len({q[0] for q in multi_queries}) != len(multi_queries):
        raise ValueError("duplicate query_ids in multi_queries")
    if mode not in ("disjunctive", "conjunctive"):
        raise ValueError(f"unknown query mode {mode!r}")
    if distance_decay is not None and float(distance_decay) < 0:
        raise ValueError(
            "distance_decay must be >= 0 (negative boosts break exact "
            "block-max pruning)"
        )
    flat: list[tuple[int, str, int, int]] = []
    owner: list[int] = []
    for qi, (_qid, words, d, k) in enumerate(multi_queries):
        for w_ in words:
            owner.append(qi)
            flat.append((len(flat), str(w_), int(d), int(k)))
    exp = (
        expand_fuzzy_terms_with_dist(term_stats, flat, max_expansions)
        if flat else {}
    )
    per_query: dict[int, list[list[tuple[str, int]]]] = {}
    for sid, qi in enumerate(owner):
        per_query.setdefault(qi, []).append(exp.get(sid, []))
    negs_map = must_not or {}
    queries = []
    for qi, (qid, _words, _d, k) in enumerate(multi_queries):
        q = _compose_fuzzy_multi(
            per_query.get(qi, []), int(qid), int(k), distance_decay,
            negs=negs_map.get(int(qid), ()), mode=mode,
        )
        if q is not None:
            queries.append(q)
    if not queries:
        spark = postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries,
                          cfg, offsets, tomb_map, allow_map)


def topk_highlights(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Top-k + per-result term positions → (query_id, rank, doc_id, term,
    pos) — the snippet/highlight primitive, answered ENTIRELY from the
    positional index (no corpus scan, no re-tokenization). ``offsets``:
    deep paging — decorate page (offset, offset+k] with GLOBAL ranks.

    Plan: the ordinary top-k ranking, then positional decode restricted to
    (a) the query terms (term filter pushed to the scan) and (b) ONLY the
    blocks containing top-k docs — the tiny ranked set's distinct
    (shard, block) pairs broadcast-join-prune the postings before any
    positions blob is decoded, so decode cost is O(topk_blocks × terms),
    not O(posting lists). Requires IndexConfig(positions=True)."""
    tk = _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries,
                        cfg, offsets, tomb_map, allow_map)
    return _decode_topk_positions(tk, postings, queries, cfg)


def _decode_topk_positions(tk: DataFrame, postings: DataFrame, queries: list,
                           cfg: IndexConfig) -> DataFrame:
    """Ranked set → (query_id, rank, doc_id, term, pos): the block-pruned
    positional decode shared by topk_highlights and topk_snippets."""
    from bloqsenjin_spark.operators.postings import decode_postings

    all_terms = sorted({t for q in queries for t in q[1]})
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    blocks = tk.select(
        (F.col("doc_id") / dps).cast("int").alias("shard"),
        ((F.col("doc_id") % dps) / bdocs).cast("int").alias("block_id"),
    ).distinct()
    pq = (
        postings.where(F.col("term").isin(all_terms))
        .join(F.broadcast(blocks), ["shard", "block_id"])
    )
    dec = decode_postings(pq, cfg, positions=True).select(
        "term", "doc_id", F.explode("pos").alias("pos")
    )
    qterms = F.create_map(
        *[x for q in queries
          for x in (F.lit(q[0]), F.array(*[F.lit(t) for t in sorted(set(q[1]))]))]
    )
    return (
        F.broadcast(tk).join(dec, "doc_id")
        .where(F.array_contains(qterms[F.col("query_id")], F.col("term")))
        .select("query_id", "rank", "doc_id", "term",
                F.col("pos").cast("long").alias("pos"))
    )


def topk_snippets(
    docs: DataFrame,
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    window: int = 8,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Top-k + a text snippet per result → (query_id, rank, doc_id, score,
    snip_pos, snippet).

    Deterministic snippet rule: start at the result's FIRST query-term
    occurrence (min position over matched query terms, straight from the
    positional index) and span ``window`` tokens of the SAME normalized
    token stream the index was built from.

    Plan: ordinary top-k → block-pruned positional decode (identical to
    topk_highlights) → min(pos) per (query, doc) → ONE broadcast-hash join
    of the tiny ranked set against the docs table to slice the token array:
    the doc store is read once (columnar, two columns, no shuffle) and only
    the O(Σk) joined rows are tokenized/sliced. This is the one query form
    that touches the document store, because snippets ARE document content —
    term-vector-free engines pay the same keyed doc fetch."""
    from bloqsenjin_spark.functions.text import tokens

    tk = _topk_or_paged(postings, doc_lens, term_stats, avgdl, queries,
                        cfg, offsets, tomb_map, allow_map)
    pos = _decode_topk_positions(tk, postings, queries, cfg)
    best = pos.groupBy("query_id", "doc_id").agg(
        F.min("pos").alias("snip_pos")
    )
    src = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    # tokenize ABOVE the join: the doc store is scanned once (two columns,
    # no shuffle) but the regex tokenizer runs only on the O(Σk) joined rows
    # — a projection below the join would tokenize the whole corpus
    return (
        F.broadcast(tk.join(best, ["query_id", "doc_id"]))
        .join(src, "doc_id")
        .select(
            "query_id", "rank", "doc_id", "score", "snip_pos",
            F.concat_ws(
                " ",
                F.slice(tokens(F.col("_text")),
                        (F.col("snip_pos") + 1).cast("int"), window),
            ).alias("snippet"),
        )
    )


def match_count_partials(
    postings: DataFrame,
    doc_lens: DataFrame,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """Per-(query, shard) exact match counts → (query_id, n) — counting
    happens INSIDE the cogrouped kernel (functions.scoring.
    count_shard_matches), so the Arrow boundary carries at most
    queries × shards rows (pytest-pinned) instead of one row per matching
    doc. The scan projects only (term, shard, block_id, doc_deltas): counts
    need neither tf payloads nor block-max metadata, and doc_lens rides
    along solely as the tombstone/allow-bitmap carrier."""
    from bloqsenjin_spark.functions.scoring import count_shard_matches

    all_terms = sorted(
        {t for q in queries for t in q[1]}
        | {t for q in queries if len(q) > 4 and q[4] for t in q[4]}
    )
    pq = postings.select("term", "shard", "block_id", "doc_deltas").where(
        F.col("term").isin(all_terms)
    )
    has_allow = allow_map is not None

    def cnt(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "n": []}).astype(
            {"query_id": "int64", "n": "int64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
            return empty
        out = count_shard_matches(
            int(pl["shard"].iloc[0]),
            pl["term"].to_numpy(),
            pl["block_id"].to_numpy(),
            pl["doc_deltas"].to_numpy(),
            queries, cfg, tomb_mask=tomb_mask,
        )
        if not out:
            return empty
        return pd.DataFrame(
            {"query_id": list(out), "n": list(out.values())}
        ).astype({"query_id": "int64", "n": "int64"})

    dl = _with_tomb(doc_lens, tomb_map, allow_map)
    return _shard_cogroup_apply(pq, dl, cnt, "query_id long, n long")


def match_counts(
    postings: DataFrame,
    doc_lens: DataFrame,
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """Exact hit counts per query → (query_id, n_hits) — the "about N
    results" primitive. One pass over the query terms' postings (doc_deltas
    column only), counts computed in-kernel per (query, shard) and summed by
    an ordinary map-side-combined aggregation — no rank window, no per-match
    Arrow rows, so the plan is bounded by queries × shards regardless of hit
    count. Queries with zero hits report 0. (Counting needs no term/corpus
    statistics — the round-3 signature's term_stats/avgdl are gone.)"""
    spark = postings.sparkSession
    counts = (
        match_count_partials(
            postings, doc_lens, queries, cfg,
            tomb_map=tomb_map, allow_map=allow_map,
        )
        .groupBy("query_id")
        .agg(F.sum("n").alias("n_hits"))
    )
    qdf = spark.createDataFrame([(int(q[0]),) for q in queries], "query_id long")
    return qdf.join(counts, "query_id", "left").select(
        "query_id", F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits")
    )


FACET_MISSING = "(missing)"
_FACET_MAX_BUCKETS = 255  # codes are uint8; the 256th code is the missing bucket


def facet_code_arrays(
    facet_df: DataFrame,
    cfg: IndexConfig = DEFAULT_CONFIG,
    facet_col: str = "facet",
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[str]]:
    """→ ((shard, codes binary), bucket values): the doc-range-aligned
    facet side-input — one uint8 code per local doc per shard (same
    carrier pattern as the tombstone/allow bitmaps: ≤ dps bytes per shard
    row, built distributively with one groupBy(shard)). NULL / absent
    docs take the reserved missing code (= len(buckets)). Facet
    cardinality is capped at 255 distinct values — faceting is a
    bounded-histogram primitive; high-cardinality grouping belongs to the
    relational layer, and the cap is loud."""
    vals = sorted(
        r[0] for r in facet_df.select(facet_col).distinct().collect()
        if r[0] is not None
    )
    if len(vals) > _FACET_MAX_BUCKETS:
        raise ValueError(
            f"facet column {facet_col!r} has {len(vals)} distinct values "
            f"(cap {_FACET_MAX_BUCKETS}) — faceting is a bounded-histogram "
            "primitive; use the relational layer for high-cardinality "
            "grouping"
        )
    code_map = F.create_map(
        *[x for i, v in enumerate(vals) for x in (F.lit(v), F.lit(i))]
    )
    missing = len(vals)
    dps = cfg.docs_per_shard
    rows = facet_df.select(
        (F.col(id_col) / dps).cast("int").alias("shard"),
        (F.col(id_col) % dps).cast("int").alias("local"),
        F.coalesce(code_map[F.col(facet_col)], F.lit(missing))
        .cast("int").alias("code"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        local = pdf["local"].to_numpy()
        # one facet value per doc: last-write-wins over a nondeterministic
        # pandas row order would desync engine counts from the oracle's
        # join-every-row semantics — refuse loudly (shard-local check inside
        # the existing Arrow pass; duplicates of one doc_id always land in
        # the same shard group, so coverage is complete)
        if np.unique(local).size != local.size:
            dup_local = int(pd.Series(local)[pd.Series(local).duplicated()].iloc[0])
            sh = int(pdf["shard"].iloc[0])
            raise ValueError(
                f"facet relation has multiple rows for doc_id "
                f"{sh * dps + dup_local} — facet_code_arrays needs one "
                "value per doc; dedupe the relation first (e.g. "
                "groupBy(doc_id).agg(min(value)))"
            )
        arr = np.full(dps, missing, dtype=np.uint8)
        arr[local] = pdf["code"].to_numpy().astype(np.uint8)
        return pd.DataFrame(
            {"shard": [int(pdf["shard"].iloc[0])], "codes": [arr.tobytes()]}
        )

    codes = rows.groupBy("shard").applyInPandas(
        pack, schema="shard int, codes binary")
    return codes, vals


def facet_counts(
    postings: DataFrame,
    doc_lens: DataFrame,
    queries: list,
    facet_df: DataFrame,
    cfg: IndexConfig = DEFAULT_CONFIG,
    facet_col: str = "facet",
    id_col: str = "doc_id",
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """Faceted hit counts → (query_id, facet, n_hits): for each query, the
    exact number of matching docs per facet bucket (Solr/Lucene field
    faceting) — ``facet_df`` is any (doc_id, value) relation, e.g.
    ``docs.select("doc_id", "lang")``. Zero-count buckets are omitted;
    docs with no/NULL facet value count under FACET_MISSING.

    Plan shape: the facet values ride as ONE uint8 code array per shard
    beside doc_lens (facet_code_arrays — the bitmap carrier pattern), and
    bucketing happens INSIDE the counting kernel
    (functions.scoring.facet_shard_counts), so the Arrow boundary carries
    ≤ queries × shards × buckets rows and the match set never leaves the
    kernel — same scale contract as match_counts, with
    conjunctive/disjunctive/MUST_NOT/tombstone/allow semantics shared via
    the one match core."""
    from bloqsenjin_spark.functions.scoring import facet_shard_counts

    codes_df, vals = facet_code_arrays(facet_df, cfg, facet_col=facet_col,
                                       id_col=id_col)
    buckets = vals + [FACET_MISSING]
    n_buckets = len(buckets)
    missing = len(vals)
    dps = cfg.docs_per_shard
    all_terms = sorted(
        {t for q in queries for t in q[1]}
        | {t for q in queries if len(q) > 4 and q[4] for t in q[4]}
    )
    pq = postings.select("term", "shard", "block_id", "doc_deltas").where(
        F.col("term").isin(all_terms)
    )
    has_allow = allow_map is not None

    def cnt(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "code": [], "n": []}).astype(
            {"query_id": "int64", "code": "int64", "n": "int64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
            return empty
        raw = dl_pdf["codes"].iloc[0]
        codes = (
            np.frombuffer(raw, dtype=np.uint8) if raw is not None
            else np.full(dps, missing, dtype=np.uint8)
        )
        per = facet_shard_counts(
            int(pl["shard"].iloc[0]),
            pl["term"].to_numpy(),
            pl["block_id"].to_numpy(),
            pl["doc_deltas"].to_numpy(),
            queries, cfg, codes, n_buckets, tomb_mask=tomb_mask,
        )
        if not per:
            return empty
        q_out, c_out, n_out = [], [], []
        for qid, hist in per.items():
            nz = np.flatnonzero(hist)
            q_out.extend([qid] * nz.size)
            c_out.extend(nz.tolist())
            n_out.extend(hist[nz].tolist())
        return pd.DataFrame(
            {"query_id": q_out, "code": c_out, "n": n_out}
        ).astype({"query_id": "int64", "code": "int64", "n": "int64"})

    dl = _with_tomb(doc_lens, tomb_map, allow_map).join(
        codes_df, "shard", "left")
    partial = _shard_cogroup_apply(pq, dl, cnt,
                                   "query_id long, code long, n long")
    bucket_map = F.create_map(
        *[x for i, v in enumerate(buckets) for x in (F.lit(i), F.lit(v))]
    )
    return (
        partial.groupBy("query_id", "code")
        .agg(F.sum("n").alias("n_hits"))
        .select("query_id", bucket_map[F.col("code")].alias("facet"),
                "n_hits")
    )
