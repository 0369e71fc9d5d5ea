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
    dps, bdocs = cfg.docs_per_shard, cfg.block_docs
    k1, b = cfg.k1, cfg.b

    def merge_shard(pl: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
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

    merged = segments.groupby("shard").cogroup(
        merged_doc_lens.groupby("shard")
    ).applyInPandas(merge_shard, schema=_MERGED_SCHEMA)
    out_cols = [f.name for f in schemas.POSTINGS.fields]
    return (
        merged.join(merged_term_stats.select("term", "idf"), "term")
        .withColumn("block_max_score", F.col("idf") * F.col("block_max_tfc"))
        .select(*out_cols)
    )


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
