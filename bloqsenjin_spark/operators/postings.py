"""M2: inverted-index build — term-sharded posting lists with delta+varint
compression and block-max metadata, via groupBy + applyInPandas.

Physical layout (schemas.POSTINGS): one row per (term, shard, block).

* ``shard = doc_id // docs_per_shard`` — contiguous docID ranges. This bounds
  every (term, shard) pandas group to ≤ docs_per_shard postings, which IS the
  head-term skew handling (north rule "salted repartitioning"): the salt is
  the doc-range, so a term appearing in 50% of 10^12 docs becomes ~n/shard
  bounded groups instead of one OOM group, and — unlike hash salting — the
  sub-shards stay globally doc-ordered so no order-restoring merge is needed.
* ``block_id = (doc_id % docs_per_shard) // block_docs`` — blocks are aligned
  to the SAME doc ranges across terms, so the query side can (a) intersect
  conjunctive terms block-wise and (b) upper-bound a block for a whole query
  by summing the terms' block_max_score at equal block_id (operators/wand.py).
* A doc lives in exactly one block, so its full BM25 score is computable from
  that block alone — block-level pruning is exact, not heuristic.

Reference parity: the posting relation is exactly the shape of
``bloq_keywords(bloq_id, keyword)`` with UNIQUE(bloq_id, keyword)
(/root/reference/internal/models/bloq.go:75-84); the reference declares a
secondary index but never materializes it
(/root/reference/internal/db/mariadb.go:280-282) — this module is that gap
filled. The packed bitset ancestry of the block metadata is
/root/reference/pkg/pages/bitset.go:3-17.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloqsenjin_spark import schemas
from bloqsenjin_spark.config import DEFAULT_CONFIG, IndexConfig
from bloqsenjin_spark.functions import bm25
from bloqsenjin_spark.functions.codec import (
    delta_encode,
    segmented_delta_encode,
    varint_encode,
    varint_encode_chunks,
)

DOC_LENS_SCHEMA = "shard int, n_docs int, dls binary, live binary"

# salt width for the index exchange (see build_postings_from_tf): partitions
# are keyed (shard, hash(term) % SALT) so small builds (few shards) still
# spread over the cluster while every (term, shard) group stays whole
POSTINGS_TERM_SALT = 8


def _encode_group(
    term, shard: int, doc_ids, tfs, contrib, pos, cfg: IndexConfig
) -> list[tuple]:
    """One (term, shard) posting list (doc-ordered) → POSTINGS row tuples.
    Inputs are NumPy slices; contrib is the precomputed per-posting BM25
    contribution (idf × tf component).

    REFERENCE twin of the production encoder: since round 8 the build path
    (_postings_batches.emit) encodes every block of an Arrow batch in one
    vectorized pass (codec.varint_encode_chunks — measured 14× on the
    encode kernel); this per-block form remains as the independently-
    simple implementation the equivalence test pins bytes against
    (tests/test_codec.py::test_batched_block_encode_matches_reference)."""
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    local = doc_ids - shard * dps
    block_ids = (local // bdocs).astype(np.int64)
    rows = []
    uniq, starts = np.unique(block_ids, return_index=True)
    bounds = np.append(starts, doc_ids.size)
    for bi, s, e in zip(uniq, bounds[:-1], bounds[1:]):
        ids = doc_ids[s:e]
        base = shard * dps + int(bi) * bdocs
        if pos is not None:
            flat = (
                np.concatenate([np.asarray(p) for p in pos[s:e]])
                if e > s else np.zeros(0, dtype=np.int64)
            )
            pos_blob = segmented_delta_encode(flat, tfs[s:e])
        else:
            pos_blob = None
        rows.append(
            (
                term,
                shard,
                int(bi),
                int(e - s),
                int(ids[0]),
                int(ids[-1]),
                delta_encode(ids, base=base),
                varint_encode(tfs[s:e].astype(np.uint64)),
                int(tfs[s:e].max()),
                float(contrib[s:e].max()),
                pos_blob,
            )
        )
    return rows


def _postings_batches(cfg: IndexConfig, avgdl: float):
    """Stitched mapInPandas posting builder.

    Input contract: rows repartitioned by (term, shard) and sorted within
    each partition by (term, shard, doc_id) — every (term, shard) group is a
    contiguous, doc-ordered run. Arrow batches can cut a run, so the tail run
    of each batch is held back and prepended to the next (buffer bounded by
    the group bound: ≤ docs_per_shard rows).

    Why not groupBy(term, shard).applyInPandas: grouped-map ships EVERY group
    as its own Arrow record batch + pandas frame — at small shards that is
    ~vocab × shards tiny batches and pure dispatch overhead (measured 65s of
    the 93s two-core build at 500k docs). Stitching keeps the identical
    grouping semantics and per-group memory bound while amortizing Arrow
    overhead over full-size batches.
    """
    k1, b = cfg.k1, cfg.b
    with_pos = cfg.positions
    out_cols = [f.name for f in schemas.POSTINGS.fields]

    def emit(pdf: pd.DataFrame) -> pd.DataFrame | None:
        """Whole-batch vectorized block encode (round 8).

        The previous shape looped Python-side over every (term, shard)
        group and every ≤block_docs block, paying ~10 tiny-array NumPy
        dispatches per block — at 5M docs that loop WAS the build's
        dominant stage (postings encode 650–870 s). Here every per-block
        quantity comes from one whole-batch pass (reduceat over block
        bounds; ONE varint pass for all delta / tf / position streams with
        per-block byte splits — codec.varint_encode_chunks), byte-identical
        to the per-block encode (LEB128 concatenation is boundary-stable;
        pinned by test_codec + the resume/merge identity tests)."""
        if pdf.empty:
            return None
        t = pdf["term"].to_numpy()
        sh = pdf["shard"].to_numpy().astype(np.int64)
        doc_ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy().astype(np.int64)
        dls = pdf["dl"].to_numpy().astype(np.float64)
        idfs = pdf["idf"].to_numpy().astype(np.float64)
        # whole-batch vectorized BM25 contribution
        contrib = idfs * bm25.tf_component_np(tfs.astype(np.float64), dls, avgdl, k1, b)
        dps, bdocs = cfg.docs_per_shard, cfg.block_docs
        bids = ((doc_ids - sh * dps) // bdocs).astype(np.int64)
        chg = (t[1:] != t[:-1]) | (sh[1:] != sh[:-1]) | (bids[1:] != bids[:-1])
        starts = np.concatenate(([0], np.flatnonzero(chg) + 1))
        ends = np.concatenate((starts[1:], [len(pdf)]))
        lens = (ends - starts).astype(np.int64)
        # per-row block base; gaps reset to (first_doc − base) at block starts
        base_rows = sh * dps + bids * bdocs
        gaps = np.empty(doc_ids.size, dtype=np.int64)
        gaps[1:] = doc_ids[1:] - doc_ids[:-1]
        gaps[starts] = doc_ids[starts] - base_rows[starts]
        delta_blobs = varint_encode_chunks(gaps.astype(np.uint64), lens)
        tf_blobs = varint_encode_chunks(tfs.astype(np.uint64), lens)
        if with_pos:
            pos = pdf["pos"].to_numpy()
            flat = (np.concatenate([np.asarray(p, dtype=np.int64) for p in pos])
                    if len(pos) else np.zeros(0, dtype=np.int64))
            # per-DOC segmented deltas (positions restart per doc); block
            # boundaries coincide with doc boundaries, so one stream split
            # at block byte bounds == per-block segmented_delta_encode
            g = np.empty(flat.size, dtype=np.int64)
            if flat.size:
                g[1:] = flat[1:] - flat[:-1]
                row_starts = np.cumsum(tfs) - tfs
                g[row_starts] = flat[row_starts]
            blk_val_lens = np.add.reduceat(tfs, starts)
            pos_blobs = varint_encode_chunks(g.astype(np.uint64),
                                             blk_val_lens)
        else:
            pos_blobs = [None] * starts.size
        return pd.DataFrame(
            {
                "term": t[starts],
                "shard": sh[starts].astype(np.int32),
                "block_id": bids[starts].astype(np.int32),
                "n_docs": lens.astype(np.int32),
                "first_doc": doc_ids[starts].astype(np.int64),
                "last_doc": doc_ids[ends - 1].astype(np.int64),
                "doc_deltas": delta_blobs,
                "tfs": tf_blobs,
                "block_max_tf": np.maximum.reduceat(tfs, starts).astype(np.int32),
                "block_max_score": np.maximum.reduceat(contrib, starts),
                "positions": pos_blobs,
            },
            columns=out_cols,
        )

    def run(batches):
        # held: chunks of the current tail run (ONE (term, shard) group that
        # may span batches). Kept as a list and concatenated once at flush so
        # a docs_per_shard-sized head-term group costs O(n), not O(n²).
        held: list[pd.DataFrame] = []
        held_key = None
        for pdf in batches:
            if pdf.empty:
                continue
            t = pdf["term"].to_numpy()
            sh = pdf["shard"].to_numpy()
            if held and (t[0], sh[0]) == held_key:
                cont = (t == t[0]) & (sh == sh[0])
                n_cont = int(cont.sum())  # sorted ⇒ the run is a prefix
                held.append(pdf.iloc[:n_cont])
                if n_cont == len(pdf):
                    continue  # whole batch extends the held run
                pdf = pdf.iloc[n_cont:]
                t, sh = t[n_cont:], sh[n_cont:]
            if held:
                out = emit(pd.concat(held, ignore_index=True))
                if out is not None:
                    yield out
                held, held_key = [], None
            # hold back this batch's (contiguous) tail run — it may continue
            tail = (t == t[-1]) & (sh == sh[-1])
            cut = len(pdf) - int(tail.sum())
            held = [pdf.iloc[cut:]]
            held_key = (t[-1], sh[-1])
            if cut:
                out = emit(pdf.iloc[:cut])
                if out is not None:
                    yield out
        if held:
            out = emit(pd.concat(held, ignore_index=True))
            if out is not None:
                yield out

    return run


_TOKEN_FINDALL = "[a-z0-9]+"  # complement of config.TOKEN_SPLIT_REGEX


def _tokenize_arrow(txt, want_pos: bool):
    """One Arrow-compute tokenize pass over a string array (already
    null-filled) → (tokens StringArray in doc order, reps int64[] row index
    per token, pos_in_doc int64[] | None).

    ASCII rows (the overwhelming common case) run entirely in
    ``pyarrow.compute`` (ascii_lower + split_pattern_regex + filter) —
    for pure-ASCII text this is provably byte-identical to the pinned
    pandas ``str.lower().str.findall('[a-z0-9]+')`` authority (ASCII
    lowering and the token alphabet coincide). Any NON-ascii row is routed
    through the pinned Python path itself (str.lower + re.findall), so the
    token stream is byte-identical BY CONSTRUCTION on every input, not by
    an assumed unicode-lowering equivalence (guide §4.2; round-8 verdict
    "gate on tokenizer parity")."""
    import re as _re

    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(txt)

    def _ascii_subset(sub):
        low = pc.ascii_lower(sub)
        parts = pc.split_pattern_regex(low, "[^a-z0-9]+")
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts)
        mask = pc.not_equal(flat, "")
        toks = flat.filter(mask)
        reps = parents.filter(mask).to_numpy(zero_copy_only=False)
        reps = reps.astype(np.int64, copy=False)
        if want_pos and reps.size:
            dl_sub = np.bincount(reps, minlength=len(sub))
            starts = np.cumsum(dl_sub) - dl_sub
            pos = np.arange(reps.size, dtype=np.int64) - starts[reps]
        else:
            pos = np.zeros(0, dtype=np.int64)
        return toks, reps, pos

    am = pc.string_is_ascii(txt)
    if pc.sum(am).as_py() == n:
        return (*_ascii_subset(txt), )
    amn = am.to_numpy(zero_copy_only=False)
    rows_a = np.flatnonzero(amn)
    rows_p = np.flatnonzero(~amn)
    t_a, r_a, p_a = _ascii_subset(pc.filter(txt, am))
    pat = _re.compile(_TOKEN_FINDALL)
    toks_l: list[str] = []
    reps_l: list[int] = []
    pos_l: list[int] = []
    for r in rows_p:
        tl = pat.findall(txt[int(r)].as_py().lower())
        toks_l.extend(tl)
        reps_l.extend([int(r)] * len(tl))
        if want_pos:
            pos_l.extend(range(len(tl)))
    toks = pa.concat_arrays(
        [t_a.cast(pa.string()), pa.array(toks_l, type=pa.string())]
    )
    reps = np.concatenate([rows_a[r_a], np.asarray(reps_l, dtype=np.int64)])
    pos = (np.concatenate([p_a, np.asarray(pos_l, dtype=np.int64)])
           if want_pos else np.zeros(0, dtype=np.int64))
    return toks, reps, pos


def _arrow_scan(text_col: str, id_col: str, doc_markers: bool,
                positions: bool, terms=None):
    """mapInArrow corpus-scan kernel (round 9): tokenize + per-doc tf count
    with ZERO Python string materialization on the hot path — text stays an
    Arrow buffer through lower/split/filter/dictionary_encode, counting is
    a NumPy unique over (row, code) int keys, and the output RecordBatches
    are built directly from Arrow/NumPy arrays (no pandas on either side).
    Replaces the pandas path (kept below as the pinned parity reference —
    SPARK_GRAFT_TOKENIZER=pandas) which paid Arrow→pandas→Arrow conversion
    plus a Python-object token list + factorize per batch (guide §4.2).

    ``terms``: optional term allow-set pushed INTO the kernel — only (doc,
    term) rows whose term is in the set are emitted (marker rows and dl are
    unaffected). Exactly equivalent to a post-hoc ``term IN (...)`` filter
    (tf is a per-doc count, so dropping non-matching tokens before the
    count changes nothing for kept terms), but the Arrow emission shrinks
    from every (doc, term) pair to the matching rows — the brute-force
    query path's scan emits query-term rows only (guide §2.3)."""
    term_list = sorted(terms) if terms is not None else None

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        pos_t = pa.list_(pa.int32())
        vset = pa.array(term_list, type=pa.string()) \
            if term_list is not None else None
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            ids_np = rb.column(rb.schema.get_field_index(id_col)).to_numpy(
                zero_copy_only=False).astype(np.int64, copy=False)
            txt = pc.fill_null(
                rb.column(rb.schema.get_field_index(text_col)), "")
            toks, reps, pos_in_doc = _tokenize_arrow(txt, positions)
            dl = np.bincount(reps, minlength=n).astype(np.int64) \
                if reps.size else np.zeros(n, dtype=np.int64)
            if len(toks):
                denc = pc.dictionary_encode(toks)
                codes = denc.indices.to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False)
                uniq = denc.dictionary
                v = len(uniq)
                if vset is not None:
                    # membership once per DICTIONARY entry, then a numpy
                    # gather over token codes — non-matching tokens never
                    # reach the (row, code) count or the output batch
                    member = pc.is_in(uniq, value_set=vset).to_numpy(
                        zero_copy_only=False)
                    keep = member[codes]
                    if not keep.all():
                        codes = codes[keep]
                        reps = reps[keep]
                        if positions:
                            pos_in_doc = pos_in_doc[keep]
            if len(toks) and codes.size:
                key = reps * v + codes
                if positions:
                    order = np.argsort(key, kind="stable")
                    sk = key[order]
                    bnd = np.flatnonzero(
                        np.concatenate(([True], sk[1:] != sk[:-1])))
                    uk = sk[bnd]
                    counts = np.diff(np.append(bnd, sk.size))
                    sp = pos_in_doc[order].astype(np.int32)
                    offsets = np.zeros(uk.size + 1, dtype=np.int32)
                    np.cumsum(counts, out=offsets[1:])
                    pos_col = pa.ListArray.from_arrays(
                        pa.array(offsets, type=pa.int32()),
                        pa.array(sp, type=pa.int32()))
                else:
                    uk, counts = np.unique(key, return_counts=True)
                    pos_col = None
                gi = uk // v
                cols = [
                    pa.array(ids_np[gi], type=pa.int64()),
                    pa.array(dl[gi].astype(np.int32), type=pa.int32()),
                    pc.take(uniq, pa.array(uk % v, type=pa.int64())).cast(
                        pa.string()),
                    pa.array(counts.astype(np.int32), type=pa.int32()),
                ]
                if positions:
                    cols.append(pos_col)
                names = ["doc_id", "dl", "term", "tf"] + (
                    ["pos"] if positions else [])
                yield pa.RecordBatch.from_arrays(cols, names=names)
            if doc_markers:
                mcols = [
                    pa.array(ids_np, type=pa.int64()),
                    pa.array(dl.astype(np.int32), type=pa.int32()),
                    pa.nulls(n, pa.string()),
                    pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
                ]
                if positions:
                    mcols.append(pa.nulls(n, pos_t))
                names = ["doc_id", "dl", "term", "tf"] + (
                    ["pos"] if positions else [])
                yield pa.RecordBatch.from_arrays(mcols, names=names)

    return run


def doc_term_freqs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_markers: bool = False,
    positions: bool = False,
    terms=None,
) -> DataFrame:
    """docs → (doc_id, dl, term, tf[, pos]), computed MAP-SIDE in one Arrow pass.

    ``positions=True`` adds a ``pos array<int>`` column: the ascending token
    positions of the term within the doc (len(pos) == tf) — the input to
    positional postings. Same single scan, no extra shuffle; the cost is the
    larger rows (≈ total token count extra ints through the index shuffle).

    This replaces explode → groupBy(term, doc_id): tf is a per-document
    quantity, so counting inside the document's own batch removes an entire
    corpus-wide shuffle — at 10^12 docs that shuffle (≈ total token count in
    rows) is the single largest cost in the naive plan. Output rows feed the
    (term, shard) index shuffle directly.

    ``doc_markers=True`` additionally emits one (doc_id, dl, term=NULL, tf=0)
    row per document — INCLUDING empty docs — so the build can derive
    corpus stats and doc_lens from the same single corpus scan instead of a
    second tokenize pass.

    Round 9: the default scan is an Arrow-native mapInArrow kernel
    (_arrow_scan) — byte-identical token streams by construction (non-ascii
    rows run the pinned Python tokenizer row-wise; see _tokenize_arrow),
    pinned additionally by the tokenizer-parity tests. The previous pandas
    implementation remains below as the parity reference and is selectable
    with SPARK_GRAFT_TOKENIZER=pandas.

    Tokenization must stay in lock-step with functions/text.tokens (JVM
    split) and the DuckDB oracle — all three are pinned to lowercase +
    [a-z0-9]+ runs and covered by golden-token tests.

    ``terms``: optional allow-set pushed into the kernel — emits only (doc,
    term) rows whose term is in the set (markers/dl unaffected); exactly
    equivalent to ``.where(col("term").isin(terms) | col("term").isNull())``
    on the unfiltered output, without materializing the non-matching rows
    across the Arrow boundary (pinned by test_tokenizer_parity).
    """
    import os as _os
    from typing import Iterator as _It

    # dl/tf as int (not long) — provably safe (a doc with ≥2^31 tokens
    # cannot exist upstream: per-doc token arrays are batch-materialized)
    # and worth 8 bytes/row through the build cache and the index shuffle
    # (guide §2.3 "narrower types")
    schema = "doc_id long, dl int, term string, tf int"
    if positions:
        schema += ", pos array<int>"
    if _os.environ.get("SPARK_GRAFT_TOKENIZER", "arrow") != "pandas":
        return docs.select(id_col, text_col).mapInArrow(
            _arrow_scan(text_col, id_col, doc_markers, positions, terms),
            schema=schema,
        )

    term_set = set(terms) if terms is not None else None

    def batches(it: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in it:
            toks = pdf[text_col].fillna("").str.lower().str.findall(_TOKEN_FINDALL)
            dl = toks.str.len().to_numpy(dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            reps = np.repeat(np.arange(len(pdf), dtype=np.int64), dl)
            flat: list[str] = []
            for lst in toks:
                flat.extend(lst)
            if flat:
                # count (doc, term) pairs via factorize + single-key
                # np.unique — far cheaper than pandas groupby on object keys
                codes, uniques = pd.factorize(pd.array(flat))
                v = len(uniques)
                key = reps * v + codes
                if positions:
                    # token position within its doc; the stable key sort keeps
                    # each (doc, term) group's positions ascending
                    doc_starts = np.cumsum(dl) - dl
                    pos_in_doc = np.arange(key.size, dtype=np.int64) - doc_starts[reps]
                    order = np.argsort(key, kind="stable")
                    sk = key[order]
                    bnd = np.flatnonzero(np.concatenate(([True], sk[1:] != sk[:-1])))
                    uk = sk[bnd]
                    counts = np.diff(np.append(bnd, sk.size))
                    sp = pos_in_doc[order].astype(np.int32)
                    pos_lists = np.split(sp, np.cumsum(counts)[:-1])
                else:
                    uk, counts = np.unique(key, return_counts=True)
                    pos_lists = None
                gi = uk // v
                gc = uk % v
                cols = {
                    "doc_id": ids[gi],
                    "dl": dl[gi],
                    "term": np.asarray(uniques, dtype=object)[gc],
                    "tf": counts.astype(np.int64),
                }
                if positions:
                    cols["pos"] = pos_lists
                out = pd.DataFrame(cols)
                if term_set is not None:
                    # reference-path twin of the kernel allow-set: drop
                    # non-matching (doc, term) rows after the count
                    out = out[out["term"].isin(term_set)]
            else:
                out = None
            if doc_markers:
                mcols = {
                    "doc_id": ids,
                    "dl": dl,
                    "term": np.full(len(pdf), None, dtype=object),
                    "tf": np.zeros(len(pdf), dtype=np.int64),
                }
                if positions:
                    mcols["pos"] = np.full(len(pdf), None, dtype=object)
                markers = pd.DataFrame(mcols)
                out = markers if out is None else pd.concat([out, markers])
            if out is not None:
                yield out

    return docs.select(id_col, text_col).mapInPandas(batches, schema=schema)


def term_freqs_with_dl(tok: DataFrame, positions: bool = False) -> DataFrame:
    """(term, doc_id, dl, tf[, pos]) — THE build intermediate. Computed once
    and persisted by the caller: term_stats needs a full pass over it before
    postings can be built (idf is baked into block_max), so two consumers
    share one materialization instead of re-exploding the corpus."""
    if positions:
        ex = tok.select("doc_id", "dl", F.posexplode("tokens").alias("pos", "term"))
        return ex.groupBy("term", "doc_id", "dl").agg(
            F.count("*").alias("tf"),
            F.sort_array(F.collect_list("pos")).cast("array<int>").alias("pos"),
        )
    return (
        tok.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )


def build_postings_from_tf(
    tf: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    cfg: IndexConfig = DEFAULT_CONFIG,
    broadcast_stats: bool = True,
) -> DataFrame:
    """(term, doc_id, dl, tf) + term_stats → POSTINGS rows.

    One shuffle; block_max_score is computed at build time with the pinned
    (k1, b, idf, avgdl), as in standard BMW indexes. The shuffle is
    expressed as repartition + partition-local sort + stitched mapInPandas —
    identical grouping semantics and memory bounds as
    groupBy(term, shard).applyInPandas, without one-Arrow-batch-per-group
    dispatch (see _postings_batches).

    Round-9 shuffle design (guide §§2.3–2.4):

    * The exchange is keyed (shard, pmod(xxhash64(term), SALT)) instead of
      (term, shard): every (term, shard) group still lands wholly in one
      partition (the salt is a pure function of term), but each output
      partition now holds WHOLE shards' worth of rows — so the encoded
      blocks come out already shard-partitioned and the second, index-sized
      repartition(shard) the writers used to pay disappears (the writer
      opts in via pre_partitioned=True). The term-hash salt keeps the
      exchange balanced at small shard counts (shards × SALT groups).
    * idf joins AFTER the exchange, as an order-preserving broadcast hash
      join over the sorted runs — 8 bytes/row less through the corpus-sized
      shuffle. With ``broadcast_stats=False`` (web-scale vocab) the join
      stays BEFORE the exchange as a plain shuffle join, as before.
    """
    enriched = tf.withColumn(
        "shard", (F.col("doc_id") / cfg.docs_per_shard).cast("int")
    )
    stats = term_stats.select("term", "idf")
    if not broadcast_stats:
        # vocab ≫ broadcast threshold: let Catalyst plan a shuffle join
        # (co-partitioned with the index exchange below)
        enriched = enriched.join(stats, "term")
    clustered = enriched.repartition(
        F.col("shard"), F.pmod(F.xxhash64("term"), F.lit(POSTINGS_TERM_SALT))
    )
    if broadcast_stats:
        # broadcast hash join preserves the exchange's partitioning (stream
        # side is ours) — no extra shuffle
        clustered = clustered.join(F.broadcast(stats), "term")
    # the partition-local sort MUST sit directly under the mapInPandas:
    # Catalyst's EliminateSorts removes a local sort BELOW a join (join
    # output ordering is undefined to the optimizer, but the stitched
    # builder's contiguous-run contract needs it) — verified by the
    # byte-identity build tests
    clustered = clustered.sortWithinPartitions("term", "shard", "doc_id")
    return clustered.mapInPandas(_postings_batches(cfg, avgdl), schema=schemas.POSTINGS)


def build_postings(
    tok: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(doc_id, tokens, dl) + term_stats → POSTINGS rows (convenience path)."""
    return build_postings_from_tf(
        term_freqs_with_dl(tok, positions=cfg.positions), term_stats, avgdl, cfg
    )


def build_doc_lens(tok: DataFrame, cfg: IndexConfig = DEFAULT_CONFIG) -> DataFrame:
    """(doc_id, dl) → one row per shard with varint-packed dl by local docID.

    Requires dense docIDs (operators/docids.py guarantees this): local ids
    0..n-1 are all present, so position == local docID.
    """
    dps = cfg.docs_per_shard

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        local = (pdf["doc_id"].to_numpy() - shard * dps).astype(np.int64)
        dls = np.zeros(int(local.max()) + 1, dtype=np.uint64)
        if np.unique(local).size != local.size:
            raise ValueError(f"duplicate docIDs in shard {shard}")
        dls[local] = pdf["dl"].to_numpy().astype(np.uint64)
        # liveness bitmap (little-endian bits by local position) — the direct
        # descendant of the reference's page bitset (pkg/pages/bitset.go):
        # dl=0 can mean "empty doc", only this bit means "doc exists"
        live = np.zeros(dls.size, dtype=bool)
        live[local] = True
        return pd.DataFrame(
            [(shard, dls.size, varint_encode(dls),
              np.packbits(live, bitorder="little").tobytes())],
            columns=["shard", "n_docs", "dls", "live"],
        )

    # shared coarse-group runner (round 9): plain groupBy(shard) ships one
    # Arrow group per shard and AQE serializes the dispatch on one task —
    # see wand._shard_group_apply
    from bloqsenjin_spark.operators.wand import _shard_group_apply

    keyed = tok.select("doc_id", "dl").withColumn(
        "shard", (F.col("doc_id") / dps).cast("int")
    )
    return _shard_group_apply(keyed, pack, DOC_LENS_SCHEMA)


def decode_postings(postings: DataFrame, cfg: IndexConfig = DEFAULT_CONFIG,
                    positions: bool = False) -> DataFrame:
    """Inverse of build_postings for property tests: POSTINGS →
    (term, doc_id, tf[, pos]).

    mapInPandas (no shuffle): each block row decodes independently.
    ``positions=True`` additionally decodes the positional payload back to
    per-doc position arrays (requires a positions=True build).
    """
    from bloqsenjin_spark.functions.codec import (
        delta_decode,
        segmented_delta_decode,
        varint_decode,
    )

    dps, bdocs = cfg.docs_per_shard, cfg.block_docs

    def explode_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_t, out_d, out_f, out_p = [], [], [], []
            for r in pdf.itertuples(index=False):
                base = r.shard * dps + r.block_id * bdocs
                ids = delta_decode(bytes(r.doc_deltas), base=base)
                tfs = varint_decode(bytes(r.tfs)).astype(np.int64)
                out_t.extend([r.term] * ids.size)
                out_d.append(ids)
                out_f.append(tfs)
                if positions:
                    if r.positions is None:
                        raise ValueError("positions requested but block has no payload")
                    flat = segmented_delta_decode(bytes(r.positions), tfs)
                    offs = np.concatenate(([0], np.cumsum(tfs)))
                    out_p.extend(
                        flat[offs[j]:offs[j + 1]].astype(np.int32)
                        for j in range(tfs.size)
                    )
            if out_t:
                cols = {
                    "term": out_t,
                    "doc_id": np.concatenate(out_d),
                    "tf": np.concatenate(out_f),
                }
                if positions:
                    cols["pos"] = out_p
                yield pd.DataFrame(cols)

    schema = "term string, doc_id long, tf long"
    if positions:
        schema += ", pos array<int>"
    return postings.mapInPandas(explode_blocks, schema=schema)
