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
from bloqsenjin_spark.operators.wand import _effective_mask, _with_tomb
from bloqsenjin_spark.plans.build import Index, build_index

# composite (field, term) key separator — NUL never appears in tokens
_SEP = "\x00"


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


def _field_index(indexes: dict[str, Index], field: str) -> Index:
    if field not in indexes:
        raise ValueError(
            f"unknown field {field!r}; indexes have {sorted(indexes)}"
        )
    return indexes[field]


def phrase_match_fielded(
    indexes: dict[str, Index],
    field: str,
    phrases: list[tuple[int, str]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
) -> DataFrame:
    """Exact phrase search restricted to ONE field ("phrase in title") →
    (query_id, doc_id). A field index IS a whole positional index over the
    field's token stream (build_fielded_index with positions=True), so the
    existing postings-only positional verify applies unchanged — positions
    are field-local. When the fields partition the document text, every
    field is a contiguous token sub-stream, so a phrase match in a field is
    a phrase match in the whole document (field ⊆ doc, property-tested);
    phrases spanning a field boundary match the document but no field."""
    from bloqsenjin_spark.operators import wand

    return wand.phrase_match_positional(
        _field_index(indexes, field).postings, phrases, cfg, tomb_map
    )


def near_match_fielded(
    indexes: dict[str, Index],
    field: str,
    near_queries: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    ordered: bool = True,
) -> DataFrame:
    """Proximity search within one field (ordered or unordered window —
    near_match_positional semantics over the field's positional index)."""
    from bloqsenjin_spark.operators import wand

    return wand.near_match_positional(
        _field_index(indexes, field).postings, near_queries, cfg, tomb_map,
        ordered=ordered,
    )


def phrase_bm25_topk_fielded(
    indexes: dict[str, Index],
    field: str,
    phrases: list[tuple[int, str, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Phrase/proximity-filtered BM25 top-k within one field: matches come
    from the field's positional index and are ranked with the FIELD's own
    statistics (df/avgdl/dl of the field's token stream) — the natural
    scoring model for "rank docs whose title contains this phrase"."""
    from bloqsenjin_spark.operators import wand

    idx = _field_index(indexes, field)
    return wand.phrase_bm25_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl, phrases, cfg,
        tomb_map=tomb_map, allow_map=allow_map, ordered=ordered,
        offsets=offsets,
    )


def bm25f_phrase_topk(
    indexes: dict[str, Index],
    phrases: list[tuple[int, str, int]],
    field_weights: dict[str, float],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    ordered: bool = True,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """Phrase/proximity ranking ACROSS weighted fields — Lucene's
    multi-field phrase reading as a weighted sum: a doc matches iff the
    phrase (or the proximity window — 4-tuple slop, ``ordered=False`` for
    the symmetric window) occurs in AT LEAST one field, scored

        score(d) = Σ_{fields where it matches}  w_f · phraseBM25_f(d)

    where phraseBM25_f is that field's own phrase-filtered BM25
    (wand.phrase_bm25_topk semantics: BM25 over the phrase's deduped terms
    with the field's df/avgdl/dl). Closes the one previously uncomposed
    COMPOSITION.md cell (cross-field phrase).

    Plan: per-field UNTRUNCATED phrase partials (truncate=False — a doc
    outside one field's per-shard top-k can still win the combined rank,
    so per-field truncation before the sum would be inexact; the rows stay
    match-bounded, exactly the per-field phrase-match sets), weighted and
    unioned, then ONE match-bounded groupBy whose sum runs in sorted-field
    order (array_sort + aggregate ⇒ deterministic float addition), and one
    rank window. ``offsets``: deep paging on the combined ranking — page
    (offset, offset+k] with GLOBAL ranks."""
    from bloqsenjin_spark.operators import wand

    if len({int(q[0]) for q in phrases}) != len(phrases):
        raise ValueError("duplicate query_ids in a fielded phrase batch")
    fields = sorted(indexes)
    unknown = set(field_weights) - set(fields)
    if unknown:
        raise ValueError(
            f"field_weights name unknown fields {sorted(unknown)}; "
            f"indexes have {fields}"
        )
    weights = {f: float(field_weights.get(f, 1.0)) for f in fields}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative field weights are not rankable: {weights}")
    parts = [
        wand.phrase_score_partials(
            indexes[f].postings, indexes[f].doc_lens, indexes[f].term_stats,
            indexes[f].avgdl, phrases, cfg, tomb_map=tomb_map,
            allow_map=allow_map, ordered=ordered, truncate=False,
        ).select(
            "query_id", "doc_id",
            F.lit(f).alias("field"),
            (F.col("score") * F.lit(weights[f])).alias("wscore"),
        )
        for f in fields
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    scored = (
        u.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("field", "wscore")))
             .alias("fs"))
        .select(
            "query_id", "doc_id",
            F.aggregate("fs", F.lit(0.0),
                        lambda acc, x: acc + x["wscore"]).alias("score"),
        )
    )
    kmap = F.create_map(
        *[x for q in phrases for x in (F.lit(int(q[0])), F.lit(int(q[2])))]
    )
    offsets = offsets or {}
    omap = F.create_map(
        *[x for q in phrases
          for x in (F.lit(int(q[0])), F.lit(int(offsets.get(int(q[0]), 0))))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("doc_id"))
    off = omap[F.col("query_id")]
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > off)
               & (F.col("rank") <= off + kmap[F.col("query_id")]))
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25f_topk(
    indexes: dict[str, Index],
    queries: list[tuple[int, list[str], str, int]],
    field_weights: dict[str, float],
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """→ (query_id, rank, doc_id, score): fielded top-k, score = Σ_field
    w_field · BM25_field. Conjunctive queries use the DOCUMENT-level
    semantics — every query term occurs in SOME field (Lucene's default
    multi-field reading); the all-terms-in-ONE-field reading is expressible
    as a per-field bm25_wand_topk conjunctive query. Weights must be ≥ 0
    (pruning/rank-safety contract shared with per-term boosts).

    Implementation: ONE SHARED KERNEL with the single-field paths —
    (field, term) is encoded into a composite term key and
    functions.scoring.score_shard_blocks receives per-key doc-length arrays
    and avgdl (its keyed-dls mode) plus per-key boost weights, so every
    kernel property (combined block-max pruning, the tie epsilon,
    tombstone/allow masking via ``tomb_map``/``allow_map``, negative-boost
    validation) applies to fielded queries automatically."""
    fields = sorted(indexes)
    qids = {int(q[0]) for q in queries}
    if len(qids) != len(queries):
        raise ValueError("duplicate query_ids in a fielded batch")
    for q in queries:
        if q[2] not in ("disjunctive", "conjunctive"):
            raise ValueError(f"unknown query mode {q[2]!r}")
        if len(q) > 5 and q[5]:
            bad = {t: w for t, w in q[5].items() if float(w) < 0}
            if bad:
                raise ValueError(
                    f"negative term boosts break exact pruning: {bad} "
                    f"(query_id={q[0]})"
                )
    unknown = set(field_weights) - set(fields)
    if unknown:
        raise ValueError(
            f"field_weights name unknown fields {sorted(unknown)}; "
            f"indexes have {fields}"
        )
    weights = {f: float(field_weights.get(f, 1.0)) for f in fields}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative field weights are not rankable: {weights}")
    all_terms = sorted({t for q in queries for t in q[1]})
    # composite-key query tuples over every (field, term), with the field
    # weight riding as the kernel's per-term boost. Conjunctive queries are
    # the DOCUMENT-level reading ("every term in SOME field" — Lucene's
    # default), enabled by grouping composite keys by their plain term in
    # the kernel (conj_groups); the all-in-ONE-field reading remains
    # expressible as a per-field bm25_wand_topk conjunctive query.
    # MUST_NOT (5-tuples, PLAIN neg terms): a doc is excluded when a neg
    # term occurs in ANY field — negs expand to composite keys, and their
    # postings must join the pushed scan filter (no idf needed: exclusion
    # only reads doc ids)
    neg_terms = sorted(
        {t for q in queries if len(q) > 4 and q[4] for t in q[4]}
    )
    scan_terms = sorted(set(all_terms) | set(neg_terms))
    _off = offsets or {}
    # extended tuples (the expansion forms' slots, mirroring the plain
    # kernel's): slot 6 = per-PLAIN-term boost multiplier (composed
    # MULTIPLICATIVELY with the field weight — w_field · boost_t, e.g.
    # fuzzy distance decay), slot 7 = per-query group map {plain term:
    # group id(s)} overriding the term-level document-conjunctive grouping
    # (e.g. word-level groups for typo-tolerant AND across fields)
    comp_queries = []
    for q in queries:
        tb = q[5] if len(q) > 5 and q[5] else {}
        gm = q[6] if len(q) > 6 and q[6] else None
        terms_u = sorted(set(q[1]))
        comp = (
            int(q[0]),
            [f"{f}{_SEP}{t}" for f in fields for t in terms_u],
            q[2],
            # deep paging: shard partials must keep offset+k rows for page
            # exactness (bm25_topk_paged's argument)
            int(q[3]) + int(_off.get(int(q[0]), 0)),
            tuple(f"{f}{_SEP}{t}" for f in fields
                  for t in sorted(set(q[4])))
            if len(q) > 4 and q[4] else (),
            {f"{f}{_SEP}{t}": weights[f] * float(tb.get(t, 1.0))
             for f in fields for t in terms_u},
        )
        if gm is not None:
            comp = comp + ({
                f"{f}{_SEP}{t}": (tuple(gm[t])
                                  if isinstance(gm[t], (tuple, list, set,
                                                        frozenset))
                                  else (gm[t],))
                for f in fields for t in terms_u
            },)
        comp_queries.append(comp)
    conj_groups = {f"{f}{_SEP}{t}": t for f in fields for t in scan_terms}
    kmap_py = {int(q[0]): int(q[3]) for q in queries}
    return _composite_pass(indexes, comp_queries, scan_terms, all_terms,
                           conj_groups, cfg, tomb_map, allow_map, kmap_py,
                           _off)


def _composite_pass(
    indexes: dict[str, Index],
    comp_queries: list,
    scan_terms: list,
    idf_terms: list,
    conj_groups: "dict | None",
    cfg: IndexConfig,
    tomb_map: "DataFrame | None",
    allow_map: "DataFrame | None",
    kmap_py: dict,
    offsets: dict,
) -> DataFrame:
    """The shared composite-key scoring pass: every multi-field ranked form
    (field-fan-out bm25f_topk, per-term-routed bm25f_routed_topk, and the
    expansion forms through them) reduces to query tuples over
    ``field⟂term`` composite keys executed by THE one kernel
    (functions.scoring.score_shard_blocks keyed-dls mode) inside one
    cogrouped pass over the tagged union of the fields' postings.
    ``comp_queries`` carry deepened k (offset folded in); ``kmap_py`` /
    ``offsets`` drive the global page window."""
    fields = sorted(indexes)
    # ONE driver job for every field's query-term idf (union tagged by field)
    ts_rows = reduce(
        lambda a, b: a.unionByName(b),
        [
            indexes[f].term_stats.select("term", "idf")
            .where(F.col("term").isin(list(idf_terms)))
            .withColumn("field", F.lit(f))
            for f in fields
        ],
    ).collect()
    idf_map = {
        f"{r['field']}{_SEP}{r['term']}": float(r["idf"]) for r in ts_rows
    }
    avgdls = {f: float(indexes[f].avgdl) for f in fields}
    pq = reduce(
        lambda a, b: a.unionByName(b),
        [
            indexes[f].postings.select(
                "term", "shard", "block_id", "block_max_score",
                "doc_deltas", "tfs",
            )
            .where(F.col("term").isin(list(scan_terms)))
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
    dl = _with_tomb(dl, tomb_map, allow_map)
    has_allow = allow_map is not None

    def combine(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        from bloqsenjin_spark.functions.scoring import score_shard_blocks

        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
            return empty
        shard = int(pl["shard"].iloc[0])
        dls_by_field = {
            str(r.field): varint_decode(bytes(r.dls)).astype(np.float64)
            for r in dl_pdf.itertuples(index=False)
        }
        comp_terms = np.array(
            [f"{f}{_SEP}{t}" for f, t in zip(pl["field"], pl["term"])],
            dtype=object,
        )
        dls_map = {
            k: dls_by_field[k.split(_SEP, 1)[0]] for k in set(comp_terms)
        }
        avgdl_map = {k: avgdls[k.split(_SEP, 1)[0]] for k in set(comp_terms)}
        out_q, out_d, out_s = score_shard_blocks(
            shard,
            comp_terms,
            pl["block_id"].to_numpy(),
            pl["block_max_score"].to_numpy(),
            pl["doc_deltas"].to_numpy(),
            pl["tfs"].to_numpy(),
            dls_map, comp_queries, idf_map, avgdl_map, cfg,
            tomb_mask=tomb_mask, conj_groups=conj_groups,
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

    from bloqsenjin_spark.operators.wand import _shard_cogroup_apply

    partial = _shard_cogroup_apply(pq, dl, combine,
                                   "query_id long, doc_id long, score double")
    kmap = F.create_map(
        *[x for qid, k in kmap_py.items() for x in (F.lit(qid), F.lit(int(k)))]
    )
    omap = F.create_map(
        *[x for qid in kmap_py
          for x in (F.lit(qid), F.lit(int(offsets.get(qid, 0))))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    off = omap[F.col("query_id")]
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > off)
               & (F.col("rank") <= off + kmap[F.col("query_id")]))
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25f_routed_topk(
    indexes: dict[str, Index],
    queries: list,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """PER-TERM field routing — Lucene's ``title:spark body:fast``: each
    clause ranks on ITS named field's index, score = Σ matched clauses
    idf_field(term) · w_clause · tfc_field (field stats per clause; no
    profile weights — routing replaces the fielded profile, clause boosts
    are the only weights). → (query_id, rank, doc_id, score).

    ``queries``: ``(qid, [(field, term), ...], mode, k[, negs[, boosts]])``
    where ``negs`` is an iterable of (field | None, term) — a None field
    excludes docs containing the term in ANY field — and ``boosts`` maps
    (field, term) clauses to weights ≥ 0. ``mode='conjunctive'`` = every
    clause matches (its term occurs in its named field); ``'disjunctive'``
    = any clause.

    Plan: clauses become composite ``field⟂term`` keys with per-key boosts
    — the SAME keyed-kernel machinery as bm25f_topk (_composite_pass), so
    combined block-max pruning, tomb/allow masking and paging compose
    unchanged; all-keys conjunctive IS the per-clause AND (no group map
    needed). Single-field identity: all clauses on one field f ≡
    bm25_wand_topk on f's index (property-tested)."""
    fields = sorted(indexes)
    qids = {int(q[0]) for q in queries}
    if len(qids) != len(queries):
        raise ValueError("duplicate query_ids in a routed batch")
    _off = offsets or {}
    comp_queries = []
    scan_terms: set = set()
    idf_terms: set = set()
    for q in queries:
        qid, clauses, mode, k = int(q[0]), list(q[1]), q[2], int(q[3])
        if mode not in ("disjunctive", "conjunctive"):
            raise ValueError(f"unknown query mode {mode!r}")
        if not clauses:
            raise ValueError(f"query_id={qid}: no (field, term) clauses")
        negs = list(q[4]) if len(q) > 4 and q[4] else []
        boosts = dict(q[5]) if len(q) > 5 and q[5] else {}
        bad_f = ({f for f, _t in clauses}
                 | {f for f, _t in negs if f is not None}
                 | {f for f, _t in boosts if f is not None}) - set(fields)
        if bad_f:
            raise ValueError(
                f"query_id={qid} routes to unknown fields {sorted(bad_f)}; "
                f"indexes have {fields}"
            )
        badw = {c: w for c, w in boosts.items() if float(w) < 0}
        if badw:
            raise ValueError(
                f"negative clause boosts break exact pruning: {badw} "
                f"(query_id={qid})"
            )
        keys = sorted({f"{f}{_SEP}{t}" for f, t in clauses})
        negkeys: set = set()
        for nf, nt in negs:
            if nf is None:
                negkeys.update(f"{f}{_SEP}{nt}" for f in fields)
            else:
                negkeys.add(f"{nf}{_SEP}{nt}")
        wmap = {f"{f}{_SEP}{t}": float(w) for (f, t), w in boosts.items()}
        comp = (qid, keys, mode, k + int(_off.get(qid, 0)),
                tuple(sorted(negkeys)), wmap)
        comp_queries.append(comp)
        scan_terms |= {t for _f, t in clauses} | {t for _f, t in negs}
        idf_terms |= {t for _f, t in clauses}
    kmap_py = {int(q[0]): int(q[3]) for q in queries}
    return _composite_pass(indexes, comp_queries, sorted(scan_terms),
                           sorted(idf_terms), None, cfg, tomb_map,
                           allow_map, kmap_py, _off)


def cross_field_term_stats(indexes: dict[str, Index]) -> DataFrame:
    """→ (term, df): the CROSS-FIELD expansion vocabulary — the union of the
    fields' vocabularies with df summed across fields. Expansion forms
    (fuzzy/prefix) rank their candidate caps on this relation so a term's
    priority reflects its corpus-wide presence, while SCORING still uses
    each field's own statistics (the bm25f contract). One tagged union +
    one groupBy — vocabulary-sized, never doc-sized."""
    return (
        reduce(
            lambda a, b: a.unionByName(b),
            [indexes[f].term_stats.select("term", "df")
             for f in sorted(indexes)],
        )
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
    )


def bm25f_fuzzy_topk(
    indexes: dict[str, Index],
    multi_queries: list[tuple[int, list[str], int, int]],
    field_weights: dict[str, float],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 50,
    distance_decay: "float | None" = None,
    mode: str = "disjunctive",
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> DataFrame:
    """Typo-tolerant search ACROSS weighted fields — fuzzy expansion ×
    BM25F composition: ``(query_id, [words], max_dist, k)`` queries where
    each word expands against the CROSS-FIELD vocabulary
    (cross_field_term_stats: union of field vocabs, df summed) under the
    standard rule (Levenshtein ≤ max_dist, distance ASC / df DESC / term
    ASC, capped PER WORD), then ranks with the fielded model: each
    expansion term t contributes w_field · decay^min_dist(t) · BM25_field(t)
    per field it occurs in.

    ``mode="conjunctive"`` is the WORD-level AND reading across fields —
    every query word must match in SOME field via SOME of its expansions
    (each word = a kernel conjunctive group over its expansion terms, the
    same grouped-conjunctive kernel as single-field fuzzy AND, here over
    composite (field, term) keys). MUST_NOT terms exclude on any-field
    occurrence (bm25f_topk's rule). A 1-word disjunctive query with weights
    {field: 1.0} over a single-field index ≡ fuzzy_bm25_topk on that index
    (property-tested).

    Plan: ALL (query, word) pairs expand in ONE SymSpell equi-join job over
    the vocabulary-sized cross-field stats (wand.expand_fuzzy_terms_with_dist
    — no new plan), composed per query by the SHARED _compose_fuzzy_multi
    rule, then ONE bm25f_topk pass: the decay boosts ride the composite
    boost map (w_field · decay^d multiplied into the per-key weight) so
    combined block-max pruning stays exact. No extra shuffle vs plain
    fielded search."""
    from bloqsenjin_spark.operators import wand

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
        wand.expand_fuzzy_terms_with_dist(
            cross_field_term_stats(indexes), flat, max_expansions)
        if flat else {}
    )
    per_query: dict[int, list[list[tuple[str, int]]]] = {}
    for sid, qi in enumerate(owner):
        per_query.setdefault(qi, []).append(exp.get(sid, []))
    negs_map = must_not or {}
    queries = []
    for qi, (qid, _words, _d, k) in enumerate(multi_queries):
        q = wand._compose_fuzzy_multi(
            per_query.get(qi, []), int(qid), int(k), distance_decay,
            negs=negs_map.get(int(qid), ()), mode=mode,
        )
        if q is not None:
            queries.append(q)
    if not queries:
        spark = next(iter(indexes.values())).postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return bm25f_topk(indexes, queries, field_weights, cfg,
                      tomb_map=tomb_map, allow_map=allow_map,
                      offsets=offsets)


def bm25f_prefix_topk(
    indexes: dict[str, Index],
    prefix_queries: list[tuple[int, str, int]],
    field_weights: dict[str, float],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 100,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> DataFrame:
    """Prefix search ACROSS weighted fields — prefix expansion × BM25F:
    each ``(query_id, prefix, k)`` expands against the cross-field
    vocabulary (df summed across fields, capped at ``max_expansions`` by
    df DESC / term ASC — the standard head-biased rule), then ranks as ONE
    disjunctive fielded query: each expansion term contributes
    w_field · BM25_field per field it occurs in. Expansion is ONE batch
    job (wand.expand_prefix_terms over cross_field_term_stats); ranking is
    one bm25f_topk pass. With weights {field: 1.0} over a single-field
    index ≡ prefix_bm25_topk (property-tested)."""
    from bloqsenjin_spark.operators import wand

    if len({q[0] for q in prefix_queries}) != len(prefix_queries):
        raise ValueError("duplicate query_ids in prefix_queries")
    exp = wand.expand_prefix_terms(
        cross_field_term_stats(indexes), prefix_queries, max_expansions)
    negs = must_not or {}
    queries = [
        (int(qid), exp[int(qid)], "disjunctive", int(k),
         tuple(negs.get(int(qid), ())))
        for qid, _p, k in prefix_queries
        if exp.get(int(qid))
    ]
    if not queries:
        spark = next(iter(indexes.values())).postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return bm25f_topk(indexes, queries, field_weights, cfg,
                      tomb_map=tomb_map, allow_map=allow_map,
                      offsets=offsets)


def bm25f_wildcard_topk(
    indexes: dict[str, Index],
    wc_queries: list[tuple[int, str, int]],
    field_weights: dict[str, float],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_expansions: int = 100,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> DataFrame:
    """Wildcard search ACROSS weighted fields — wildcard expansion × BM25F:
    each ``(query_id, pattern, k)`` expands against the cross-field
    vocabulary (df summed; prefix-pruned + regex, leading wildcards
    refused — wand.expand_wildcard_terms), then ranks as ONE disjunctive
    fielded query. With weights {field: 1.0} over a single-field index ≡
    wildcard_bm25_topk (property-tested)."""
    from bloqsenjin_spark.operators import wand

    if len({q[0] for q in wc_queries}) != len(wc_queries):
        raise ValueError("duplicate query_ids in wc_queries")
    exp = wand.expand_wildcard_terms(
        cross_field_term_stats(indexes), wc_queries, max_expansions)
    negs = must_not or {}
    queries = [
        (int(qid), exp[int(qid)], "disjunctive", int(k),
         tuple(negs.get(int(qid), ())))
        for qid, _p, k in wc_queries
        if exp.get(int(qid))
    ]
    if not queries:
        spark = next(iter(indexes.values())).postings.sparkSession
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    return bm25f_topk(indexes, queries, field_weights, cfg,
                      tomb_map=tomb_map, allow_map=allow_map,
                      offsets=offsets)


def bm25f_merged_topk(
    indexes: dict[str, Index],
    queries: list[tuple[int, list[str], str, int]],
    field_weights: dict[str, float],
    doc_term_stats: DataFrame,
    cfg: IndexConfig = DEFAULT_CONFIG,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
    offsets: "dict[int, int] | None" = None,
) -> DataFrame:
    """TRUE BM25F (Zaragoza & Robertson): per-field length-normalized tfs are
    weighted and merged BEFORE saturation,

        score(d, q) = Σ_t idf_doc(t) · (k1+1)·tf̃ / (tf̃ + k1),
        tf̃ = Σ_f w_f · tf_{f,t,d} / (1 − b + b·dl_{f,d}/avgdl_f)

    with a DOCUMENT-level idf (``doc_term_stats``: term→idf over whole
    documents — the fields partition each document, so "term in any field" ≡
    "term in document"). This differs from bm25f_topk (per-field-sum, the
    Lucene-style weighted combination): merging before the concave saturation
    rewards a term spread across fields less than the same tf concentrated —
    the probabilistically grounded behavior (test pins the divergence).

    Same distributed plan as bm25f_topk — shard-aligned per-field indexes,
    ONE cogroup over the term-filtered union — but scored by the merged-tf
    kernel (functions/scoring.score_shard_blocks_bm25f), whose block bound
    recovers per-field block-max normalized tf by inverting the stored
    monotone saturation, so NO storage-format change and pruning stays exact
    for w ≥ 0. Reference shape: the per-entity multi-valued column sets at
    /root/reference/internal/models/bloq.go:75-84 (no text-search analog).
    """
    fields = sorted(indexes)
    if len({int(q[0]) for q in queries}) != len(queries):
        raise ValueError("duplicate query_ids in a fielded batch")
    for q in queries:
        if q[2] not in ("disjunctive", "conjunctive"):
            raise ValueError(f"unknown query mode {q[2]!r}")
    unknown = set(field_weights) - set(fields)
    if unknown:
        raise ValueError(
            f"field_weights name unknown fields {sorted(unknown)}; "
            f"indexes have {fields}"
        )
    weights = {f: float(field_weights.get(f, 1.0)) for f in fields}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"negative field weights are not rankable: {weights}")
    all_terms = sorted({t for q in queries for t in q[1]})
    # MUST_NOT (5-tuples, plain terms): neg postings join the scan so the
    # kernel can exclude any-field occurrences; no idf/doc-stats needed
    neg_terms = sorted(
        {t for q in queries if len(q) > 4 and q[4] for t in q[4]}
    )
    scan_terms = sorted(set(all_terms) | set(neg_terms))

    doc_idf = {
        r["term"]: float(r["idf"])
        for r in doc_term_stats.select("term", "idf")
        .where(F.col("term").isin(all_terms)).collect()
    }
    # per-field idf is needed ONLY to invert the stored block-max back to a
    # normalized-tf bound — one tagged-union driver job, like bm25f_topk's
    ts_rows = reduce(
        lambda a, b: a.unionByName(b),
        [
            indexes[f].term_stats.select("term", "idf")
            .where(F.col("term").isin(all_terms))
            .withColumn("field", F.lit(f))
            for f in fields
        ],
    ).collect()
    field_idf = {
        f"{r['field']}{_SEP}{r['term']}": float(r["idf"]) for r in ts_rows
    }
    avgdls = {f: float(indexes[f].avgdl) for f in fields}

    _off = offsets or {}
    plain_queries = [
        (int(q[0]), sorted(set(q[1])), q[2],
         int(q[3]) + int(_off.get(int(q[0]), 0)),
         tuple(sorted(set(q[4]))) if len(q) > 4 and q[4] else ())
        for q in queries
    ]

    pq = reduce(
        lambda a, b: a.unionByName(b),
        [
            indexes[f].postings.select(
                "term", "shard", "block_id", "block_max_score",
                "doc_deltas", "tfs",
            )
            .where(F.col("term").isin(scan_terms))
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
    dl = _with_tomb(dl, tomb_map, allow_map)
    has_allow = allow_map is not None

    def combine(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        from bloqsenjin_spark.functions.scoring import score_shard_blocks_bm25f

        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int64", "doc_id": "int64", "score": "float64"}
        )
        if pl.empty or dl_pdf.empty:
            return empty
        tomb_mask, skip = _effective_mask(dl_pdf, has_allow)
        if skip:
            return empty
        shard = int(pl["shard"].iloc[0])
        dls_by_field = {
            str(r.field): varint_decode(bytes(r.dls)).astype(np.float64)
            for r in dl_pdf.itertuples(index=False)
        }
        comp_terms = np.array(
            [f"{f}{_SEP}{t}" for f, t in zip(pl["field"], pl["term"])],
            dtype=object,
        )
        dls_map = {
            k: dls_by_field[k.split(_SEP, 1)[0]] for k in set(comp_terms)
        }
        avgdl_map = {k: avgdls[k.split(_SEP, 1)[0]] for k in set(comp_terms)}
        out_q, out_d, out_s = score_shard_blocks_bm25f(
            shard,
            comp_terms,
            pl["block_id"].to_numpy(),
            pl["block_max_score"].to_numpy(),
            pl["doc_deltas"].to_numpy(),
            pl["tfs"].to_numpy(),
            dls_map, plain_queries, doc_idf, field_idf, avgdl_map,
            weights, fields, _SEP, cfg,
            tomb_mask=tomb_mask,
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

    from bloqsenjin_spark.operators.wand import _shard_cogroup_apply

    partial = _shard_cogroup_apply(pq, dl, combine,
                                   "query_id long, doc_id long, score double")
    kmap = F.create_map(
        *[x for q in queries for x in (F.lit(int(q[0])), F.lit(int(q[3])))]
    )
    omap = F.create_map(
        *[x for q in queries
          for x in (F.lit(int(q[0])), F.lit(int(_off.get(int(q[0]), 0))))]
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    off = omap[F.col("query_id")]
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where((F.col("rank") > off)
               & (F.col("rank") <= off + kmap[F.col("query_id")]))
        .select("query_id", "rank", "doc_id", "score")
    )
