"""Deduplication operators for the training-data pipeline: exact (hash),
n-gram Jaccard, MinHash+LSH, SimHash.

Scale shapes (what survives 100 TB):
* exact: one groupBy on a 128-bit digest — no full-text shuffle, min(doc_id)
  wins deterministically.
* n-gram Jaccard: shingle inverted index (explode distinct shingles) →
  self-join on shingle → per-pair intersection counts. The shingle join IS a
  posting-list intersection — same shape as the engine's conjunctive query
  (and the reference's pairwise co-occurrence loop,
  /root/reference/internal/models/profile.go:335-395, done as one join+groupBy
  instead of O(n²) point updates). Hot shingles are the head-term skew case:
  cap candidate fan-out by dropping shingles with df > max_shingle_df
  (a standard LSH-free near-dup trick; documented lossiness).
* MinHash+LSH: per-doc signatures map-side (JVM xxhash64 inside a transform
  lambda + one Arrow pass for the k permutations), band→bucket join for
  candidates, exact-Jaccard verify. Only candidate pairs are ever joined.
* SimHash: 64-bit signature map-side, 16-bit band buckets (Hamming ≤ 3 ⇒ some
  band of 4 matches), verify with popcount.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloqsenjin_spark.functions.text import tokens

MINHASH_K = 64
MINHASH_BANDS = 16  # 16 bands x 4 rows
_MERSENNE = (1 << 61) - 1
_SEED = 42


def _perm_params() -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(_SEED)
    a = rs.randint(1, _MERSENNE, size=MINHASH_K, dtype=np.int64).astype(np.uint64)
    b = rs.randint(0, _MERSENNE, size=MINHASH_K, dtype=np.int64).astype(np.uint64)
    return a, b


def _drop_hot_buckets(df: DataFrame, key_cols: list[str], cap: int | None) -> DataFrame:
    """Candidate-generation skew guard shared by the LSH-family dedups: drop
    bucket keys whose df exceeds ``cap`` BEFORE the self-join. A single
    degenerate bucket shared by d docs yields d(d−1)/2 candidate rows — the
    head-term skew case (e.g. near-empty docs all hashing to one SimHash
    chunk). Documented lossiness, same contract as ngram_jaccard_pairs'
    max_shingle_df: pairs reachable ONLY through a dropped bucket are missed;
    verification of surviving candidates stays exact. cap=None = keep all."""
    if cap is None:
        return df
    hot = df.groupBy(*key_cols).count().where(F.col("count") > cap)
    return df.join(hot.select(*key_cols), key_cols, "left_anti")


def normalized_text(col) -> F.Column:
    """Dedup normalization: lowercase, collapse token runs (tokenizer-aligned)."""
    return F.concat_ws(" ", tokens(col))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, content_hash, keep) — keep=True on the min doc_id per hash."""
    h = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalized_text(F.col(text_col))).alias("content_hash"),
    )
    w = F.min("doc_id").over(Window.partitionBy("content_hash"))
    return h.withColumn("keep", (F.col("doc_id") == w))


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, shingle) distinct word n-grams. Pure Catalyst (no UDF)."""
    t = tokens(F.col(text_col))
    # sequence(0, size-n) DESCENDS when size < n — guard short/empty docs
    sh = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.array_distinct(sh).alias("sh"))
        .where(F.size("sh") > 0)
        .select("doc_id", F.explode("sh").alias("shingle"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_df: int | None = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (d1, d2, jaccard) for all pairs with exact n-gram Jaccard ≥ threshold.

    ``max_shingle_df`` drops ultra-common shingles from CANDIDATE GENERATION
    only (skew cap for web scale); verification stays exact over full sets.
    The DEFAULT is a real cap: one shingle shared by d docs contributes
    d(d-1)/2 join rows, so a single boilerplate shingle at 10^8 df is a
    quadratic blowup — exactly the head-term skew case. Pass None for
    exact-everywhere semantics (the oracle-parity entry does).
    """
    ex = shingles(docs, n, text_col, id_col)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    cand_src = ex
    if max_shingle_df is not None:
        hot = ex.groupBy("shingle").count().where(F.col("count") > max_shingle_df)
        cand_src = ex.join(hot.select("shingle"), "shingle", "left_anti")
    a, b = cand_src.alias("a"), cand_src.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_sh", "na"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_sh", "nb"), "d2")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, sig array<long>[MINHASH_K]). Base shingle hashes are JVM
    xxhash64 inside a transform lambda (no shuffle, no Python); the k
    permutations run in one Arrow batch pass."""
    t = tokens(F.col(text_col))
    sh = F.array_distinct(
        F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i + 1, n))),
            ),
        ).otherwise(F.array().cast("array<long>"))
    )
    hashed = docs.select(F.col(id_col).alias("doc_id"), sh.alias("h")).where(F.size("h") > 0)

    a, b = _perm_params()

    def sigs(it):
        for pdf in it:
            out = np.empty((len(pdf), MINHASH_K), dtype=np.int64)
            for r, hs in enumerate(pdf["h"]):
                x = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                # (a*x + b) mod p for all k perms: (k, n) outer — vectorized
                v = (np.multiply.outer(a, x) + b[:, None]) % np.uint64(_MERSENNE)
                out[r] = v.min(axis=1).astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": list(out)})

    return hashed.mapInPandas(sigs, schema="doc_id long, sig array<long>")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_df: int | None = 10_000,
    broadcast_max_pairs: int = 2_000_000,
) -> DataFrame:
    """→ (d1, d2, jaccard): LSH candidates (band-bucket join) verified by
    EXACT n-gram Jaccard ≥ threshold. With 16 bands × 4 rows, a true pair at
    J=0.9 is missed with p≈4e-8 — treat results as exact at thresholds ≥0.9
    (verification removes all false positives; recall note in docstring).

    ``max_bucket_df`` caps band-bucket fan-out (see _drop_hot_buckets);
    ``broadcast_max_pairs`` bounds the candidate broadcast into the shingle
    verify joins — beyond it (dup-heavy corpora where candidate pairs are
    legitimately huge) the joins degrade gracefully to shuffle joins instead
    of failing on the broadcast limit."""
    sig = minhash_signatures(docs, n, text_col, id_col)
    rows = MINHASH_K // MINHASH_BANDS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.transform(
                        F.slice("sig", bi * rows + 1, rows), lambda x: x.cast("string")
                    ))).alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    bands = _drop_hot_buckets(bands, ["band", "key"], max_bucket_df)
    c1, c2 = bands.alias("x"), bands.alias("y")
    cand = (
        c1.join(c2, (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"))
        .distinct()
    )
    # exact verify on candidates only: count common shingles per pair.
    # cand is usually near-dup-pair-sized (tiny vs the corpus) — broadcast it
    # into both shingle joins so the corpus-wide shingle relation is filtered
    # map-side instead of shuffled against a small table; but bucket skew can
    # make cand quadratic-large, so only broadcast under a measured bound
    # (one cheap count over the persisted candidate set).
    from pyspark import StorageLevel

    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    if cand.count() <= broadcast_max_pairs:
        cand = F.broadcast(cand)
    ex = shingles(docs, n, text_col, id_col)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    e1 = ex.select(F.col("doc_id").alias("d1"), "shingle")
    e2 = ex.select(F.col("doc_id").alias("d2x"), F.col("shingle").alias("s2"))
    inter = (
        cand.join(e1, "d1")
        .join(e2, (F.col("shingle") == F.col("s2")) & (F.col("d2") == F.col("d2x")))
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n_sh", "na"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n_sh", "nb"), "d2")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .where(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    method: str = "lsh",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int | None = None,
    max_bucket_df: int | None = 10_000,
) -> DataFrame:
    """→ (d1, d2, score): embedding-cosine near-duplicate pairs (d1 < d2,
    cosine ≥ threshold). The semantic-dedup leg of the pipeline (exact/
    Jaccard/MinHash/SimHash catch surface dups; embedding cosine catches
    paraphrases).

    ``method="exact"``: all-pairs upper triangle — O(n²), the oracle/
    verification path (zero-Python Catalyst fold, same kernel as
    similarity.cosine_topk).
    ``method="lsh"``: random-hyperplane band buckets (similarity.
    lsh_signatures) generate candidates, exact cosine verifies — the scale
    path: the self-join touches same-bucket pairs only, and every returned
    score is exact (precision 1; recall pinned in tests). ``max_bucket_df``
    caps per-bucket fan-out (see _drop_hot_buckets) so one degenerate bucket
    can't go quadratic; ignored by method="exact".
    """
    from bloqsenjin_spark.operators.similarity import _SEED, _cosine, lsh_signatures

    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if method == "exact":
        a = base.select(F.col("vec_id").alias("d1"), F.col("v").alias("va"))
        b = base.select(F.col("vec_id").alias("d2"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).where(F.col("d1") < F.col("d2"))
    elif method == "lsh":
        sig = lsh_signatures(embeddings, id_col=id_col, vec_col=vec_col,
                             seed=_SEED if seed is None else seed)
        sig = _drop_hot_buckets(sig, ["band", "key"], max_bucket_df)
        x, y = sig.alias("x"), sig.alias("y")
        cand = (
            x.join(y, (F.col("x.band") == F.col("y.band"))
                   & (F.col("x.key") == F.col("y.key"))
                   & (F.col("x.vec_id") < F.col("y.vec_id")))
            .select(F.col("x.vec_id").alias("d1"), F.col("y.vec_id").alias("d2"))
            .distinct()
        )
        pairs = (
            cand.join(base.select(F.col("vec_id").alias("d1"), F.col("v").alias("va")), "d1")
            .join(base.select(F.col("vec_id").alias("d2"), F.col("v").alias("vb")), "d2")
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        pairs.withColumn("score", _cosine(F.col("va"), F.col("vb")))
        .where(F.col("score") >= threshold)
        .select("d1", "d2", "score")
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, simhash long): tf-weighted 64-bit SimHash, map-side only."""
    t = tokens(F.col(text_col))
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(t, lambda x: F.xxhash64(x)).alias("h"),
    ).where(F.size("h") > 0)

    def sigs(it):
        for pdf in it:
            out = np.empty(len(pdf), dtype=np.int64)
            for r, hs in enumerate(pdf["h"]):
                x = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                out[r] = np.int64(
                    np.bitwise_or.reduce(
                        (v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
                    ).astype(np.int64)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return hashed.mapInPandas(sigs, schema="doc_id long, simhash long")


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  max_bucket_df: int | None = 10_000) -> DataFrame:
    """→ (d1, d2, hamming ≤ max_hamming). Band trick: with 4 × 16-bit chunks,
    Hamming ≤ 3 guarantees ≥1 identical chunk — candidates from chunk-bucket
    joins, then exact popcount verify. ``max_bucket_df`` caps chunk-bucket
    fan-out (see _drop_hot_buckets): a degenerate 16-bit chunk shared by d
    docs would otherwise emit d(d−1)/2 candidates."""
    sig = simhash64(docs, text_col, id_col)
    # shiftrightunsigned takes a Python int shift — build the 4 chunk structs
    # with a comprehension, not a transform lambda
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk"),
                    F.shiftrightunsigned("simhash", i * 16)
                    .bitwiseAND(F.lit(0xFFFF)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("ck"),
    ).select("doc_id", "simhash", "ck.chunk", "ck.key")
    chunks = _drop_hot_buckets(chunks, ["chunk", "key"], max_bucket_df)
    x, y = chunks.alias("x"), chunks.alias("y")
    cand = (
        x.join(y, (F.col("x.chunk") == F.col("y.chunk")) & (F.col("x.key") == F.col("y.key"))
               & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(
            F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2"),
            F.col("x.simhash").alias("s1"), F.col("y.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )
