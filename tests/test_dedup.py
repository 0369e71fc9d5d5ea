from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.operators import dedup


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),          # exact dup of 0
        (2, "Alpha, beta;  GAMMA delta epsilon zeta!"),      # normalizes to 0
        (3, "alpha beta gamma delta epsilon eta"),           # near-dup (1 token)
        (4, "completely different words here entirely now"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark, dup_docs):
    r = {x["doc_id"]: x for x in dedup.exact_dedup(dup_docs).collect()}
    assert r[0]["keep"] and not r[1]["keep"] and not r[2]["keep"]
    assert r[0]["content_hash"] == r[1]["content_hash"] == r[2]["content_hash"]
    assert r[3]["keep"] and r[4]["keep"] and r[5]["keep"]


def test_ngram_jaccard_exact_pairs(spark, dup_docs):
    pairs = {
        (x["d1"], x["d2"]): x["jaccard"]
        for x in dedup.ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()
    }
    # docs 0,1,2 identical after tokenization → J=1 for all three pairs
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0 and pairs[(1, 2)] == 1.0
    # doc 3 shares 3 of 4+4-3 shingles with 0/1/2: J = 3/5
    assert pairs[(0, 3)] == pytest.approx(0.6)
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_catches_identical_and_matches_exact(spark, dup_docs):
    lsh = {
        (x["d1"], x["d2"]): x["jaccard"]
        for x in dedup.minhash_lsh_pairs(dup_docs, threshold=0.99).collect()
    }
    assert set(lsh) == {(0, 1), (0, 2), (1, 2)}
    assert all(v == 1.0 for v in lsh.values())


def test_minhash_equals_bruteforce_on_sf0001(spark):
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    want = sorted(
        (r["d1"], r["d2"]) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    )
    got = sorted(
        (r["d1"], r["d2"]) for r in dedup.minhash_lsh_pairs(docs, threshold=0.9).collect()
    )
    assert got == want and len(want) > 0


def test_simhash_identical_docs_hamming_zero(spark, dup_docs):
    pairs = {
        (x["d1"], x["d2"]): x["hamming"]
        for x in dedup.simhash_pairs(dup_docs, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0 and pairs[(1, 2)] == 0


def test_simhash_signature_deterministic(spark, dup_docs):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(dup_docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(dup_docs).collect()}
    assert a == b
    assert a[0] == a[1] == a[2]


@pytest.mark.parametrize("seed", [42, 7, 123])
def test_embedding_near_dup_lsh_vs_exact(spark, seed):
    """LSH-bucketed semantic near-dup: returned pairs ⊆ exact (precision 1,
    scores exact per pair), recall ≥ pinned floor across plane seeds."""
    emb = corpus.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["d1"], r["d2"]): r["score"]
        for r in dedup.embedding_near_dup_pairs(emb, 0.45, method="exact").collect()
    }
    assert len(exact) >= 5  # fixture really has near-threshold pairs
    lsh = {
        (r["d1"], r["d2"]): r["score"]
        for r in dedup.embedding_near_dup_pairs(emb, 0.45, method="lsh",
                                                seed=seed).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == pytest.approx(exact[k], abs=1e-9)
    recall = len(lsh) / len(exact)
    assert recall >= 0.4, f"semantic near-dup recall collapsed at seed {seed}: {recall}"


def test_hot_shingle_cap_bounds_candidate_blowup(spark):
    """One boilerplate shingle shared by all n docs ⇒ the uncapped candidate
    self-join materializes n(n-1)/2 pairs; with the cap the hot shingle
    degrades to a pivot star (n-1 candidates, connectivity preserved) instead
    of a quadratic join. This is the head-term-skew failure mode of web
    boilerplate at 10^12 docs.
    """
    from pyspark.sql import functions as F

    n = 80
    rows = [(d, f"common boiler plate u{d}a u{d}b u{d}c u{d}d") for d in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ex = dedup.shingles(docs)

    def cand_pairs(src):
        a, b = src.alias("a"), src.alias("b")
        return a.join(
            b, (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        ).count()

    uncapped = cand_pairs(ex)
    assert uncapped >= n * (n - 1) // 2  # the blowup is real
    capped = dedup._candidate_pairs(ex, ["shingle"], "doc_id", 10).collect()
    assert len(capped) == n - 1  # pivot star, linear not quadratic
    assert all(r["d1"] == 0 for r in capped)  # pivot = min docID
    # verification is exact over FULL shingle sets: these docs share only
    # 1 of 9 shingles (J=1/9 < 0.8) so the production default returns none
    assert dedup.ngram_jaccard_pairs(docs, threshold=0.8).count() == 0


def test_hot_shingle_cap_preserves_planted_dups(spark):
    """Skew cap drops only candidate shingles; planted J≈0.99 pairs survive."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    full = sorted(
        (r["d1"], r["d2"]) for r in dedup.ngram_jaccard_pairs(docs, threshold=0.95).collect()
    )
    capped = sorted(
        (r["d1"], r["d2"])
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.95, max_shingle_df=50).collect()
    )
    assert capped == full


def test_hot_bucket_cap_bounds_simhash_and_lsh_blowup(spark):
    """Degenerate buckets (all docs identical ⇒ identical SimHash chunks /
    MinHash bands / hyperplane signs) must not go quadratic when the cap is
    on: the hot bucket degrades to a pivot star — n-1 candidate pairs, all
    incident to the min docID, NOT zero (a duplicate mega-cluster is exactly
    what dedup must not silently miss) and not n(n-1)/2."""
    n = 60
    rows = [(d, "same exact tiny doc body here") for d in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: every pair is a candidate AND verifies (hamming 0)
    assert dedup.simhash_pairs(docs, max_bucket_df=None).count() == n * (n - 1) // 2
    # capped: the hot chunk buckets degrade to the pivot star
    sh = dedup.simhash_pairs(docs, max_bucket_df=10).collect()
    assert len(sh) == n - 1
    assert all(r["d1"] == 0 and r["hamming"] == 0 for r in sh)
    # minhash band buckets: same shape, same guard (and verify stays exact)
    mh = dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket_df=10).collect()
    assert len(mh) == n - 1
    assert all(r["d1"] == 0 and r["jaccard"] == 1.0 for r in mh)

    vecs = [(d, [1.0, 0.0, 0.5, 0.25] * 4) for d in range(n)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    uncapped = dedup.embedding_near_dup_pairs(emb, threshold=0.9, method="lsh",
                                              max_bucket_df=None).count()
    assert uncapped == n * (n - 1) // 2
    capped = dedup.embedding_near_dup_pairs(emb, threshold=0.9, method="lsh",
                                            max_bucket_df=10).collect()
    assert len(capped) == n - 1 and all(r["d1"] == 0 for r in capped)

    # the star pairs carry full cluster connectivity: resolution recovers
    # the whole 60-doc duplicate cluster from the capped candidate set
    clusters = dedup.resolve_clusters(
        dedup.simhash_pairs(docs, max_bucket_df=10), docs
    ).collect()
    assert all(r["cluster_id"] == 0 for r in clusters)
    assert sorted(r["doc_id"] for r in clusters if r["keep"]) == [0]


def test_hot_bucket_cap_preserves_planted_dups(spark):
    """Default caps leave the sf0.001 planted near-dups untouched (no bucket
    there is hot): capped results == uncapped results."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    base = sorted(
        (r["d1"], r["d2"])
        for r in dedup.simhash_pairs(docs, max_bucket_df=None).collect()
    )
    dflt = sorted(
        (r["d1"], r["d2"]) for r in dedup.simhash_pairs(docs).collect()
    )
    assert dflt == base and len(base) > 0


# ---- cluster resolution (pairs → connected components → keep-list) ----------

def _brute_min_labels(edges):
    """Pure-Python union-find closure: node → min id of its component."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_connected_components_matches_brute_closure(spark, seed):
    import random

    rng = random.Random(seed)
    edges = {(rng.randrange(120), rng.randrange(120)) for _ in range(90)}
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    labels, rounds = dedup.connected_components(pairs)
    got = {r["node"]: r["cluster_id"] for r in labels.collect()}
    assert got == _brute_min_labels(edges)
    assert rounds <= 20


def test_connected_components_long_chain_round_bound(spark):
    """A 256-node path is the adversarial case for naive min-propagation
    (O(diameter) = 255 rounds); large-star/small-star must close it in
    O(log n) rounds."""
    import math

    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "d1 long, d2 long"
    )
    labels, rounds = dedup.connected_components(pairs)
    got = labels.collect()
    assert len(got) == n and all(r["cluster_id"] == 0 for r in got)
    assert rounds <= 2 * int(math.ceil(math.log2(n))) + 4  # 20 ≪ 255


def test_resolve_clusters_transitive_and_singletons(spark, dup_docs):
    """A~B, B~C ⇒ one cluster even when A~C is below threshold; pair-free
    docs come back as kept singletons."""
    pairs = dedup.ngram_jaccard_pairs(dup_docs, threshold=0.5)
    r = {x["doc_id"]: x for x in dedup.resolve_clusters(pairs, dup_docs).collect()}
    assert len(r) == 6
    assert all(r[d]["cluster_id"] == 0 for d in (0, 1, 2, 3))
    assert r[0]["keep"] and not any(r[d]["keep"] for d in (1, 2, 3))
    assert r[4]["cluster_id"] == 4 and r[4]["keep"]
    assert r[5]["cluster_id"] == 5 and r[5]["keep"]


def test_resolve_clusters_empty_pairs(spark, dup_docs):
    empty = spark.createDataFrame([], "d1 long, d2 long")
    r = dedup.resolve_clusters(empty, dup_docs).collect()
    assert len(r) == 6
    assert all(x["keep"] and x["cluster_id"] == x["doc_id"] for x in r)


@pytest.mark.parametrize("method,kwargs,kept", [
    ("exact", {}, {0, 3, 4, 5}),
    ("minhash", {"threshold": 0.9}, {0, 3, 4, 5}),
    ("ngram", {"threshold": 0.5}, {0, 4, 5}),   # 3 joins 0's cluster at J=0.6
    ("simhash", {"max_hamming": 3}, {0, 3, 4, 5}),
])
def test_dedup_corpus_end_to_end(spark, dup_docs, method, kwargs, kept):
    got = {r["doc_id"] for r in
           dedup.dedup_corpus(dup_docs, method, **kwargs).collect()}
    assert got == kept


def test_prepare_training_corpus_statuses_and_precedence(spark):
    """Constructed corpus hitting every status, pinning the first-failing-
    rule precedence (lang beats quality beats duplicate) and that dedup runs
    ONLY among gate survivors (a duplicate of a gated-out doc is kept)."""
    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "market for a basket of fresh apples and bread " * 3)
    german = ("der hund und die katze sind nicht das problem und der tag "
              "ist lang und die nacht ist kurz " * 3)
    rows = [
        (0, good),                  # kept (canonical of the dup cluster)
        (1, good),                  # duplicate of 0
        (2, german),                # lang
        (3, "the of"),              # quality (detected en, but too short)
        (4, german),                # lang — ALSO a dup of 2, but lang wins
        (5, good + " unique trailing sentence differs enough not a dup "
            "completely different words about sailing ships and harbors "
            "where the old captain tells a story of the sea"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["status"]
        for r in dedup.prepare_training_corpus(
            docs, langs=("en",), min_quality=0.5, threshold=0.8,
            max_shingle_df=None).collect()
    }
    assert out[0] == "kept"
    assert out[1] == "duplicate"
    assert out[2] == "lang" and out[4] == "lang"  # dup-of-gated-out stays 'lang'
    assert out[3] == "quality"
    assert len(out) == 6  # one decision row per input doc
    # doc 5: near-identical prefix but diluted below threshold → kept
    assert out[5] in ("kept", "duplicate")  # sanity: gated in either way
    kept = [d for d, s in out.items() if s == "kept"]
    assert 0 in kept
