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
    self-join materializes n(n-1)/2 pairs; with the (default-on) cap the hot
    shingle is excluded from candidate generation and the join stays empty.
    This is the head-term-skew failure mode of web boilerplate at 10^12 docs.
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
    hot = ex.groupBy("shingle").count().where(F.col("count") > 10)
    capped = cand_pairs(ex.join(hot.select("shingle"), "shingle", "left_anti"))
    assert capped == 0
    # and the production default itself returns no false pairs here
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
    on: candidate generation drops the hot bucket entirely."""
    n = 60
    rows = [(d, "same exact tiny doc body here") for d in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: every pair is a candidate AND verifies (hamming 0)
    assert dedup.simhash_pairs(docs, max_bucket_df=None).count() == n * (n - 1) // 2
    # capped: the single hot chunk bucket is dropped ⇒ zero candidates
    assert dedup.simhash_pairs(docs, max_bucket_df=10).count() == 0
    # minhash band buckets: same shape, same guard
    assert dedup.minhash_lsh_pairs(docs, threshold=0.9, max_bucket_df=10).count() == 0

    vecs = [(d, [1.0, 0.0, 0.5, 0.25] * 4) for d in range(n)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    uncapped = dedup.embedding_near_dup_pairs(emb, threshold=0.9, method="lsh",
                                              max_bucket_df=None).count()
    assert uncapped == n * (n - 1) // 2
    capped = dedup.embedding_near_dup_pairs(emb, threshold=0.9, method="lsh",
                                            max_bucket_df=10).count()
    assert capped == 0


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
