"""M4a: segment merge — LSM-style combination of independently-built index
segments (e.g. per-ingest-batch) into one index, WITHOUT re-tokenizing.

merge(build(A), build(B)) == build(A ∪ B) exactly (property-tested), given
A, B have disjoint docIDs (guaranteed: docIDs are dense ranks of unique urls,
each doc in exactly one batch).

Why stats must be re-derived: idf and avgdl are corpus-global, so block_max
scores baked at segment-build time are stale after a merge. df/cf/N/Σdl are
all additive over disjoint doc sets, so the merged stats are exact without
touching the corpus. block_max is then rebuilt in two steps: the shard-local
part (max tfc, needs only tf + dl + new avgdl) inside the cogrouped merge,
and the term-global factor (idf) as a plain Catalyst join+multiply — keeping
the big per-shard pass free of any term-global broadcast.

Shuffle design: the merge cogroups by ``shard`` alone (low-cardinality key,
bounded groups ≤ docs_per_shard × avg terms-per-doc postings), not by
(term, shard) — one narrow shuffle of already-compressed blocks. This is the
"iterative segment-merge pass" of the north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloqsenjin_spark import schemas
from bloqsenjin_spark.config import DEFAULT_CONFIG, IndexConfig
from bloqsenjin_spark.functions import bm25
from bloqsenjin_spark.operators.wand import _shard_cogroup_apply
from bloqsenjin_spark.functions.codec import (
    delta_decode,
    delta_encode,
    segmented_delta_decode,
    segmented_delta_encode,
    varint_decode,
    varint_encode,
)

_MERGED_SCHEMA = (
    "term string, shard int, block_id int, n_docs int, first_doc long, "
    "last_doc long, doc_deltas binary, tfs binary, block_max_tf int, "
    "block_max_tfc double, positions binary"
)


def merge_doc_lens(*doc_lens: DataFrame) -> DataFrame:
    """Combine packed per-shard dl arrays from disjoint segments.

    Positions are disjoint (a docID exists in one segment), absent = 0, so an
    elementwise max over zero-padded arrays is exact.
    """
    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        arrays = [varint_decode(bytes(b)) for b in pdf["dls"]]
        n = max(a.size for a in arrays)
        out = np.zeros(n, dtype=np.uint64)
        for a in arrays:
            np.maximum(out[: a.size], a, out=out[: a.size])
        live = np.zeros(n, dtype=bool)
        for b in pdf["live"]:
            bits = np.unpackbits(
                np.frombuffer(bytes(b), dtype=np.uint8), bitorder="little"
            ).astype(bool)
            live[: min(bits.size, n)] |= bits[: min(bits.size, n)]
        return pd.DataFrame(
            [(shard, n, varint_encode(out),
              np.packbits(live, bitorder="little").tobytes())],
            columns=["shard", "n_docs", "dls", "live"],
        )

    from functools import reduce

    allseg = reduce(lambda a, b: a.unionByName(b), doc_lens)
    return allseg.groupBy("shard").applyInPandas(
        combine, schema="shard int, n_docs int, dls binary, live binary"
    )


def merge_term_stats(n_docs_total: int, *term_stats: DataFrame) -> DataFrame:
    """df/cf are additive over disjoint doc sets; idf recomputed with new N."""
    from functools import reduce

    allseg = reduce(lambda a, b: a.unionByName(b), term_stats)
    return (
        allseg.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("idf", bm25.idf_col(F.col("df"), n_docs_total))
    )


def merge_postings(
    segments: DataFrame,
    merged_doc_lens: DataFrame,
    merged_term_stats: DataFrame,
    avgdl_new: float,
    cfg: IndexConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Union of segment POSTINGS rows → merged POSTINGS with fresh block-max."""
    vec, _ref = merge_shard_kernels(cfg, avgdl_new)
    merged = _shard_cogroup_apply(segments, merged_doc_lens, vec,
                                  _MERGED_SCHEMA)
    out_cols = [f.name for f in schemas.POSTINGS.fields]
    return (
        merged.join(merged_term_stats.select("term", "idf"), "term")
        .withColumn("block_max_score", F.col("idf") * F.col("block_max_tfc"))
        .select(*out_cols)
    )


def merge_shard_kernels(cfg: IndexConfig, avgdl_new: float):
    """→ (vectorized, reference) per-shard merge kernels, equal by
    construction (byte-identity pinned in tests/test_merge_resume.py)."""
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    k1, b = cfg.k1, cfg.b

    def merge_shard_vec(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        """Round-9 vectorized merge kernel (same recipe as the build's
        _postings_batches.emit, guide §4.2): ONE varint decode pass over the
        concatenated delta/tf streams, group-contiguous numpy sort/merge,
        collision check and block maxima via reduceat, and ONE
        codec.varint_encode_chunks pass per output stream — replacing the
        per-(term, block) Python loop (~10 tiny-NumPy dispatches per block,
        corpus-proportional under continuous streaming compaction; round-8
        verdict "next" #5). Byte-identical to the per-block reference below
        (pinned by tests/test_merge_resume.py::test_merge_encode_identity
        and the merge ≡ build property tests). Mixed positional/positionless
        groups (a positional segment merged with a positionless one) fall
        back to the reference loop."""
        cols = [c.split(" ")[0] for c in _MERGED_SCHEMA.split(", ")]
        if pl.empty:
            return pd.DataFrame([], columns=cols)
        has_pos_col = "positions" in pl.columns
        pos_vals = pl["positions"].to_numpy() if has_pos_col else None
        any_pos = has_pos_col and any(p is not None for p in pos_vals)
        all_pos = has_pos_col and all(p is not None for p in pos_vals)
        if any_pos and not all_pos:
            return merge_shard_ref(pl, dl_pdf)  # mixed segments: rare, exact
        shard = int(pl["shard"].iloc[0])
        dls = varint_decode(bytes(dl_pdf["dls"].iloc[0])).astype(np.float64)

        terms = pl["term"].to_numpy()
        bids = pl["block_id"].to_numpy().astype(np.int64)
        ndocs = pl["n_docs"].to_numpy().astype(np.int64)
        row_order = np.lexsort((bids, terms))
        terms, bids, ndocs = terms[row_order], bids[row_order], ndocs[row_order]
        deltas_col = pl["doc_deltas"].to_numpy()[row_order]
        tfs_col = pl["tfs"].to_numpy()[row_order]
        bases = shard * dps + bids * bdocs

        # batched decode: one LEB128 pass over every blob, then per-row
        # segmented cumsum (first gap is relative to the row's block base)
        gaps = varint_decode(b"".join(bytes(b) for b in deltas_col)).astype(
            np.int64)
        row_starts = np.cumsum(ndocs) - ndocs
        gaps[row_starts] += bases
        cs = np.cumsum(gaps)
        prev = np.where(row_starts > 0, cs[row_starts - 1], 0)
        ids_flat = cs - np.repeat(prev, ndocs)
        tfs_flat = varint_decode(b"".join(bytes(b) for b in tfs_col)).astype(
            np.int64)

        # group = (term, block_id); values sorted by docID within group
        chg = (terms[1:] != terms[:-1]) | (bids[1:] != bids[:-1])
        grp_of_row = np.concatenate(([0], np.cumsum(chg)))
        grp_of_val = np.repeat(grp_of_row, ndocs)
        order = np.lexsort((ids_flat, grp_of_val))
        ids_s, tfs_s = ids_flat[order], tfs_flat[order]
        grp_s = grp_of_val[order]
        grp_starts = np.flatnonzero(
            np.concatenate(([True], grp_s[1:] != grp_s[:-1])))
        grp_counts = np.diff(np.append(grp_starts, ids_s.size))
        dup = (ids_s[1:] == ids_s[:-1]) & (grp_s[1:] == grp_s[:-1])
        if dup.any():
            i = int(np.flatnonzero(dup)[0])
            bad_term = terms[np.flatnonzero(grp_of_row == grp_s[i])[0]]
            raise ValueError(
                f"docID collision merging term={bad_term} shard={shard}")
        rows_first = np.flatnonzero(
            np.concatenate(([True], grp_of_row[1:] != grp_of_row[:-1])))
        grp_bases = bases[rows_first]

        gaps_out = np.empty(ids_s.size, dtype=np.int64)
        gaps_out[1:] = ids_s[1:] - ids_s[:-1]
        gaps_out[grp_starts] = ids_s[grp_starts] - grp_bases
        from bloqsenjin_spark.functions.codec import varint_encode_chunks

        delta_blobs = varint_encode_chunks(gaps_out.astype(np.uint64),
                                           grp_counts)
        tf_blobs = varint_encode_chunks(tfs_s.astype(np.uint64), grp_counts)
        tfc = bm25.tf_component_np(
            tfs_s.astype(np.float64), dls[ids_s - shard * dps], avgdl_new,
            k1, b)
        if all_pos:
            pos_vals = pos_vals[row_order]
            g = varint_decode(b"".join(bytes(p) for p in pos_vals)).astype(
                np.int64)
            # per-doc segmented cumsum (positions restart per doc)
            doc_starts = np.cumsum(tfs_flat) - tfs_flat
            cs2 = np.cumsum(g)
            prev2 = np.where(doc_starts > 0, cs2[doc_starts - 1], 0)
            pos_abs = cs2 - np.repeat(prev2, tfs_flat)
            # gather per-doc segments into merged doc order
            out_starts = np.cumsum(tfs_s) - tfs_s
            within = np.arange(pos_abs.size, dtype=np.int64) - np.repeat(
                out_starts, tfs_s)
            gather = np.repeat(doc_starts[order], tfs_s) + within
            pos_sorted = pos_abs[gather]
            # re-delta per doc, then one chunked encode per GROUP
            pg = np.empty(pos_sorted.size, dtype=np.int64)
            if pos_sorted.size:
                pg[1:] = pos_sorted[1:] - pos_sorted[:-1]
                pg[out_starts] = pos_sorted[out_starts]
            grp_val_lens = np.add.reduceat(tfs_s, grp_starts)
            pos_blobs = varint_encode_chunks(pg.astype(np.uint64),
                                             grp_val_lens)
        else:
            pos_blobs = [None] * grp_starts.size
        return pd.DataFrame(
            {
                "term": terms[rows_first],
                "shard": np.full(grp_starts.size, shard, dtype=np.int32),
                "block_id": bids[rows_first].astype(np.int32),
                "n_docs": grp_counts.astype(np.int32),
                "first_doc": ids_s[grp_starts],
                "last_doc": ids_s[grp_starts + grp_counts - 1],
                "doc_deltas": delta_blobs,
                "tfs": tf_blobs,
                "block_max_tf": np.maximum.reduceat(tfs_s, grp_starts).astype(
                    np.int32),
                "block_max_tfc": np.maximum.reduceat(tfc, grp_starts),
                "positions": pos_blobs,
            },
            columns=cols,
        )

    def merge_shard_ref(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        """Reference per-(term, block) merge loop — the independently-simple
        twin the vectorized kernel is byte-identity-tested against (same
        role as postings._encode_group for the build encoder)."""
        cols = [c.split(" ")[0] for c in _MERGED_SCHEMA.split(", ")]
        if pl.empty:
            return pd.DataFrame([], columns=cols)
        shard = int(pl["shard"].iloc[0])
        dls = varint_decode(bytes(dl_pdf["dls"].iloc[0])).astype(np.float64)
        rows = []
        for (term, bi), grp in pl.groupby(["term", "block_id"], sort=True):
            base = shard * dps + int(bi) * bdocs
            ids_parts, tf_parts = [], []
            pos_docs: list = []  # per-doc position arrays, pre-merge order
            has_pos = True
            for r in grp.itertuples(index=False):
                ids_parts.append(delta_decode(bytes(r.doc_deltas), base=base))
                tfs_r = varint_decode(bytes(r.tfs)).astype(np.int64)
                tf_parts.append(tfs_r)
                rp = getattr(r, "positions", None)
                if rp is None:
                    has_pos = False
                elif has_pos:
                    flat = segmented_delta_decode(bytes(rp), tfs_r)
                    offs = np.concatenate(([0], np.cumsum(tfs_r)))
                    pos_docs.extend(
                        flat[offs[j]:offs[j + 1]] for j in range(tfs_r.size)
                    )
            ids = np.concatenate(ids_parts)
            tfs = np.concatenate(tf_parts)
            order = np.argsort(ids, kind="stable")
            ids, tfs = ids[order], tfs[order]
            if np.unique(ids).size != ids.size:
                raise ValueError(f"docID collision merging term={term} shard={shard}")
            if has_pos and pos_docs:
                # positions are per-doc payloads: reorder the doc segments to
                # the merged doc order, re-encode against the merged tfs
                pos_blob = segmented_delta_encode(
                    np.concatenate([pos_docs[i] for i in order]), tfs
                )
            else:
                pos_blob = None  # any positionless segment ⇒ positionless merge
            tfc = bm25.tf_component_np(
                tfs.astype(np.float64), dls[ids - shard * dps], avgdl_new, k1, b
            )
            rows.append(
                (
                    term, shard, int(bi), int(ids.size), int(ids[0]), int(ids[-1]),
                    delta_encode(ids, base=base),
                    varint_encode(tfs.astype(np.uint64)),
                    int(tfs.max()), float(tfc.max()), pos_blob,
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return merge_shard_vec, merge_shard_ref


def merge_indexes(a, b, cfg: IndexConfig = DEFAULT_CONFIG):
    """Index ⊕ Index → Index (plans.build.Index operands, disjoint docIDs)."""
    from bloqsenjin_spark.plans.build import Index

    n = a.n_docs + b.n_docs
    total_dl = a.avgdl * a.n_docs + b.avgdl * b.n_docs
    avgdl = (total_dl / n) if n else 1.0
    dl = merge_doc_lens(a.doc_lens, b.doc_lens)
    ts = merge_term_stats(n, a.term_stats, b.term_stats)
    segs = a.postings.unionByName(b.postings)
    return Index(
        postings=merge_postings(segs, dl, ts, avgdl, cfg),
        doc_lens=dl,
        term_stats=ts,
        n_docs=n,
        avgdl=avgdl,
        cfg=cfg,
    )
