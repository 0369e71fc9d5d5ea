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
  candidate fan-out is capped connectivity-preservingly — buckets past
  max_shingle_df degrade to pivot-star candidates (lossless only when the
  pivot verifies; see _candidate_pairs' caveat), verification stays exact
  over full shingle sets.
* MinHash+LSH: per-doc signatures map-side (JVM xxhash64 inside a transform
  lambda + one Arrow pass for the k permutations), band→bucket join for
  candidates, exact-Jaccard verify. Only candidate pairs are ever joined.
* SimHash: 64-bit signature map-side, 16-bit band buckets (Hamming ≤ 3 ⇒ some
  band of 4 matches), verify with popcount.
* cluster resolution: pairs → connected components → keep-list via the
  two-phase large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) — O(log n) DataFrame rounds,
  no driver materialization. This is the training-data decision layer on top
  of every pair family above (the reference materializes analogous derived
  relation graphs: /root/reference/internal/models/bloq.go:65-74,
  /root/reference/internal/models/preferences.go:48-59).
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


def _candidate_pairs(df: DataFrame, key_cols: list[str], id_col: str,
                     cap: int | None) -> DataFrame:
    """→ (d1, d2) candidate pairs (d1 < d2, distinct) from a bucketed
    relation, with connectivity-preserving skew capping.

    Cold buckets (≤ ``cap`` members) self-join as usual. A hot bucket shared
    by d docs would emit d(d−1)/2 rows — the head-term skew case (web
    boilerplate, near-empty docs hashing alike) — so instead of dropping it
    (which silently loses exactly the heavy-duplication clusters dedup exists
    for), each hot bucket degrades to a PIVOT STAR: every member pairs with
    the bucket's min docID only (d−1 rows).

    CAVEAT (the precise contract — this is NOT fully lossless): downstream
    cluster resolution (``resolve_clusters``) recovers the full duplicate
    cluster only WHEN THE PIVOT VERIFIES against its members. If the bucket's
    min-docID pivot fails exact verification against members that would
    pairwise pass, those qualifying pairs (and their cluster connectivity)
    are lost — capping trades that single-pivot failure mode for bounded
    fan-out. Verification of the pairs that ARE emitted stays exact.
    cap=None = plain all-pairs self-join (the oracle-parity path, and the
    setting under which the ≥-threshold contract is exhaustive)."""
    x, y = df.alias("x"), df.alias("y")
    keys_eq = [F.col(f"x.{k}") == F.col(f"y.{k}") for k in key_cols]

    def selfjoin(src_x, src_y):
        cond = keys_eq[0]
        for c in keys_eq[1:]:
            cond = cond & c
        return (
            src_x.join(src_y, cond & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
            .select(F.col(f"x.{id_col}").alias("d1"),
                    F.col(f"y.{id_col}").alias("d2"))
        )

    if cap is None:
        return selfjoin(x, y).distinct()
    stats = df.groupBy(*key_cols).agg(
        F.count("*").alias("_n"), F.min(id_col).alias("_pivot")
    )
    hot = stats.where(F.col("_n") > cap)
    cold = df.join(hot.select(*key_cols), key_cols, "left_anti")
    cold_pairs = selfjoin(cold.alias("x"), cold.alias("y"))
    star_pairs = (
        df.join(hot.select(*key_cols, "_pivot"), key_cols)
        .where(F.col(id_col) != F.col("_pivot"))
        .select(F.col("_pivot").alias("d1"), F.col(id_col).alias("d2"))
    )
    return cold_pairs.unionByName(star_pairs).distinct()


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
    """→ (d1, d2, jaccard) pairs with exact n-gram Jaccard ≥ threshold —
    exhaustive when ``max_shingle_df=None``; with a cap, exhaustive except
    for pairs reachable only through a hot bucket whose pivot fails
    verification (see _candidate_pairs' caveat).

    ``max_shingle_df`` caps CANDIDATE GENERATION only: hot shingles (df >
    cap) degrade to pivot-star candidates instead of a quadratic self-join
    (see _candidate_pairs — a boilerplate shingle at 10^8 df would otherwise
    contribute d(d−1)/2 join rows), and every emitted candidate is then
    verified by EXACT Jaccard over the FULL (uncapped) shingle sets. Pass
    None for exact-everywhere semantics (the oracle-parity entry does).
    """
    ex = shingles(docs, n, text_col, id_col)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if max_shingle_df is None:
        a, b = ex.alias("a"), ex.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .agg(F.count("*").alias("inter"))
        )
    else:
        cand = _candidate_pairs(ex, ["shingle"], "doc_id", max_shingle_df)
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

    ``max_bucket_df`` caps band-bucket fan-out connectivity-preservingly
    (hot buckets degrade to pivot stars — lossless only when the pivot
    verifies, see _candidate_pairs' caveat); ``broadcast_max_pairs``
    bounds the candidate broadcast into the shingle verify joins — beyond it
    (dup-heavy corpora where candidate pairs are legitimately huge) the joins
    degrade gracefully to shuffle joins instead of failing on the broadcast
    limit."""
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
    cand = _candidate_pairs(bands, ["band", "key"], "doc_id", max_bucket_df)
    # exact verify on candidates only: count common shingles per pair.
    # cand is usually near-dup-pair-sized (tiny vs the corpus) — broadcast it
    # into both shingle joins so the corpus-wide shingle relation is filtered
    # map-side instead of shuffled against a small table; but bucket skew can
    # make cand quadratic-large, so only broadcast under a measured bound.
    # localCheckpoint (not persist): materializes the candidate set ONCE —
    # the size probe is then a cheap count and the verify joins reuse the
    # same blocks — and the ContextCleaner frees the blocks when the
    # DataFrame is dereferenced, unlike CacheManager-pinned persist() which
    # leaked cached partitions for the session lifetime.
    cand = cand.localCheckpoint(eager=True)
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
    caps per-bucket fan-out connectivity-preservingly (hot buckets degrade
    to pivot stars — lossless only when the pivot verifies, see
    _candidate_pairs' caveat) so one degenerate bucket can't go quadratic;
    ignored by method="exact".
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
        cand = _candidate_pairs(sig, ["band", "key"], "vec_id", max_bucket_df)
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


def _md5_hash64(col) -> F.Column:
    """64-bit token hash from md5 hex halves — engine-neutral (DuckDB
    recomputes the identical bit pattern from the same md5 string), unlike
    xxhash64. Two 32-bit conv() parses avoid the >int64 overflow a single
    16-hex-char parse would hit; shiftleft wraps two's-complement, giving
    the int64 whose unsigned bits are (hi ‖ lo)."""
    h = F.md5(col)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, simhash long): tf-weighted 64-bit SimHash, map-side only.
    Token hashes are md5-derived (engine-neutral) so the DuckDB oracle
    reproduces signatures exactly (oracle.simhash_pairs_sql)."""
    t = tokens(F.col(text_col))
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(t, lambda x: _md5_hash64(x)).alias("h"),
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
    fan-out non-lossily (hot buckets degrade to pivot stars — see
    _candidate_pairs): a degenerate 16-bit chunk shared by d docs would
    otherwise emit d(d−1)/2 candidates."""
    sig = simhash64(docs, text_col, id_col)
    # shiftrightunsigned takes a Python int shift — build the 4 chunk structs
    # with a comprehension, not a transform lambda
    chunks = sig.select(
        "doc_id",
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
    ).select("doc_id", "ck.chunk", "ck.key")
    cand = _candidate_pairs(chunks, ["chunk", "key"], "doc_id", max_bucket_df)
    return (
        cand.join(sig.select(F.col("doc_id").alias("d1"),
                             F.col("simhash").alias("s1")), "d1")
        .join(sig.select(F.col("doc_id").alias("d2"),
                         F.col("simhash").alias("s2")), "d2")
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
    )


def _edge_sig(e: DataFrame) -> tuple[int, int]:
    """Cheap set fingerprint of an edge relation: (count, XOR xxhash64(u, v)).
    Used as the convergence check of the CC loop — one single-row aggregate
    per round instead of a full EXCEPT join; edges are canonical (u > v)
    DISTINCT rows, so equal fingerprints ⇔ equal sets up to a 64-bit
    collision (never the failure mode here: a false convergence would still
    return a valid-but-unconverged labeling, caught by the property tests).
    XOR, not sum: an int64 sum overflows under ANSI mode."""
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("s"),
    ).first()
    return int(row["n"]), int(row["s"])


def connected_components(
    pairs: DataFrame,
    d1_col: str = "d1",
    d2_col: str = "d2",
    max_rounds: int = 50,
) -> tuple[DataFrame, int]:
    """→ ((node long, cluster_id long), rounds_used): connected components of
    the undirected pair graph; cluster_id = min node id of the component.

    Algorithm: alternating large-star / small-star (Kiveris et al., SoCC'14)
    as a bounded DataFrame loop — converges in O(log n) rounds even on
    pathological long chains (round-bound pytest-pinned), vs O(diameter) for
    naive min-label propagation. Each round is two self-describing shuffles
    over the CURRENT edge set (which only shrinks toward stars); lineage is
    cut per round with localCheckpoint so the plan never accretes.

      large-star(u): connect every neighbor v > u to min(N(u) ∪ {u})
      small-star(u): orient edges large→small, connect every neighbor and u
                     itself to the minimum

    The fixed point is a forest of stars, each centered at its component's
    minimum — the (node → center) edges ARE the labeling. Isolated nodes
    (no pairs) don't appear; resolve_clusters adds them back as singletons.
    """
    e = (
        pairs.select(
            F.col(d1_col).cast("long").alias("a"),
            F.col(d2_col).cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    sig = _edge_sig(e)
    rounds = 0
    for _ in range(max_rounds):
        # large-star: symmetric neighborhoods, m = min(N(u) ∪ {u});
        # emit (v, m) for strictly larger neighbors v > u
        nb = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mn = nb.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("mv", "u").alias("m")
        )
        ls = (
            nb.join(mn, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.greatest("v", "m").alias("u"), F.least("v", "m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: edges already oriented large→small (u > v); m = min
        # neighbor; reconnect every neighbor and u itself to m
        mn2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        part_nb = (
            ls.join(mn2, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        part_self = mn2.select("u", F.col("m").alias("v"))
        e_new = (
            part_nb.union(part_self)
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        rounds += 1
        new_sig = _edge_sig(e_new)
        if new_sig == sig:
            e = e_new
            break
        e, sig = e_new, new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(O(log n) expected — raise max_rounds only for adversarial graphs)"
        )
    # converged star forest: u > v edges point straight at component minima
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("node"),
                     F.col("v").alias("cluster_id")).distinct()
    return labels.union(roots).distinct(), rounds


def resolve_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    d1_col: str = "d1",
    d2_col: str = "d2",
    max_rounds: int = 50,
) -> DataFrame:
    """→ (doc_id, cluster_id, keep): the dedup DECISION layer — transitive
    closure of any near-dup pair relation (A~B, B~C ⇒ {A,B,C} one cluster),
    cluster_id = min docID of the cluster, keep = (doc_id == cluster_id).

    Feed it the output of any pair family (exact/ngram/minhash/simhash/
    embedding); pass ``docs`` to include pair-free documents as kept
    singletons (cluster_id = own id). Scale shape: bounded O(log n)
    large-star/small-star rounds over the pair relation only — never the
    corpus — so a 10^12-doc corpus with 10^9 near-dup pairs resolves in a
    handful of pair-sized shuffles."""
    labels, _ = connected_components(pairs, d1_col, d2_col, max_rounds)
    labels = labels.select(F.col("node").alias("doc_id"), "cluster_id")
    if docs is not None:
        base = docs.select(F.col(id_col).cast("long").alias("doc_id"))
        labels = (
            base.join(labels, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            )
        )
    return labels.withColumn("keep", F.col("doc_id") == F.col("cluster_id"))


def dedup_corpus(
    docs: DataFrame,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """End-to-end dedup decision → the KEPT corpus (full doc rows): generate
    near-dup pairs with the chosen method, resolve transitive clusters, keep
    the min docID per cluster, left-semi-join the survivors back. This is
    the one-call form of the pipeline a training-data user actually runs:

        exact   — hash groupBy, no pair materialization
        ngram   — exact n-gram Jaccard pairs (kwargs: threshold, n, ...)
        minhash — MinHash+LSH candidates, exact verify
        simhash — SimHash chunk buckets, popcount verify

    Scale shape: the only additions over the pair generators are the
    O(log n) pair-sized cluster-resolution rounds and one left-semi join of
    the keep-list against the corpus."""
    if method == "exact":
        keep = exact_dedup(docs, text_col, id_col).where(F.col("keep"))
    else:
        gen = {
            "ngram": ngram_jaccard_pairs,
            "minhash": minhash_lsh_pairs,
            "simhash": simhash_pairs,
        }
        if method not in gen:
            raise ValueError(f"unknown method {method!r}")
        pairs = gen[method](docs, text_col=text_col, id_col=id_col, **kwargs)
        keep = resolve_clusters(pairs, docs, id_col).where(F.col("keep"))
    return docs.join(
        keep.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )


def prepare_training_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_df: int | None = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, lang_pred, quality, status): the one-call corpus CURATION
    decision a training-data pipeline runs end to end — language gate
    (predicted language ∈ ``langs``) → quality gate (closed-form web-text
    quality ≥ ``min_quality``) → near-dup gate (exact n-gram-Jaccard pairs +
    transitive clusters among the docs that passed both gates, min-docID
    canonical). ``status`` records the FIRST failing rule per doc:
    'lang' | 'quality' | 'duplicate' | 'kept' — the audit-friendly form
    (filter status='kept' for the corpus, group by status for the report).

    Scale shape: the gates are pure Catalyst projections; dedup runs ONLY on
    the gate survivors (the usual big win — boilerplate/junk never reaches
    pair generation), with the same capped-candidate machinery as
    ngram_jaccard_pairs and O(log n) pair-sized cluster rounds."""
    from bloqsenjin_spark.operators.textstats import lang_id, quality_score

    li = lang_id(docs, text_col, id_col).select("doc_id", "lang_pred")
    qs = quality_score(docs, text_col, id_col).select("doc_id", "quality")
    flags = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(li, "doc_id")
        .join(qs, "doc_id")
        .withColumn("lang_ok", F.col("lang_pred").isin(*langs))
        .withColumn("quality_ok", F.col("quality") >= F.lit(float(min_quality)))
    )
    fdocs = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.col(text_col).alias("text"))
        .join(flags.where(F.col("lang_ok") & F.col("quality_ok"))
              .select("doc_id"), "doc_id", "left_semi")
    )
    pairs = ngram_jaccard_pairs(fdocs, threshold=threshold, n=n,
                                max_shingle_df=max_shingle_df)
    clusters = resolve_clusters(pairs, fdocs)
    status = (
        F.when(~F.col("lang_ok"), "lang")
        .when(~F.col("quality_ok"), "quality")
        .when(~F.coalesce(F.col("keep"), F.lit(True)), "duplicate")
        .otherwise("kept")
    )
    return (
        flags.join(clusters.select("doc_id", "keep"), "doc_id", "left")
        .select("doc_id", "lang_pred", "quality", status.alias("status"))
    )
