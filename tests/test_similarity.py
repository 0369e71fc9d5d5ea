from __future__ import annotations

import numpy as np
import pytest

from bloqsenjin_spark import corpus
from bloqsenjin_spark.operators import similarity

QIDS = list(range(10))
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return corpus.load_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_cosine_topk_vs_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    got = similarity.cosine_topk(emb, QIDS, k=K).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in QIDS:
        qv = vecs[q]
        scores = sorted(
            (
                (-float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), vid)
                for vid, v in vecs.items() if vid != q
            )
        )[:K]
        want = [(vid, -s) for s, vid in scores]
        res = sorted(by_q[q], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in res] == [w[0] for w in want]
        for r, w in zip(res, want):
            assert r["score"] == pytest.approx(w[1], abs=1e-9)


def test_ann_scores_match_exact_pairs(spark, emb):
    """Every ANN hit's score must equal the exact cosine for that pair."""
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    got = similarity.ann_cosine_lsh(emb, QIDS, k=K).collect()
    assert len(got) > 0
    for r in got:
        qv, v = vecs[r["query_id"]], vecs[r["vec_id"]]
        exact = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        assert r["score"] == pytest.approx(exact, abs=1e-9)


@pytest.mark.parametrize("seed", [42, 7, 123])
def test_ann_recall_bound(spark, emb, seed):
    """Recall@k floor across independent hyperplane draws (measured 0.64-0.74
    on this fixture), and every returned pair carries the exact cosine —
    plane-seed dependence must not hide a broken bucketing path."""
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    brute = similarity.cosine_topk(emb, QIDS, k=K).collect()
    ann = similarity.ann_cosine_lsh(emb, QIDS, k=K, seed=seed).collect()
    for r in ann:  # precision of returned pairs is 1: scores exact per pair
        qv, v = vecs[r["query_id"]], vecs[r["vec_id"]]
        exact = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        assert r["score"] == pytest.approx(exact, abs=1e-9)
    bset = {(r["query_id"], r["vec_id"]) for r in brute}
    aset = {(r["query_id"], r["vec_id"]) for r in ann}
    recall = len(bset & aset) / len(bset)
    # banded hyperplane LSH (8×4 bits) on isotropic random vectors: pin a
    # floor so regressions (e.g. broken bucketing) are caught; real clustered
    # embeddings sit far above this
    assert recall >= 0.5, f"recall collapsed at seed {seed}: {recall}"


def test_ivf_recall_and_exact_scores(spark, emb):
    brute = similarity.cosine_topk(emb, QIDS, k=K).collect()
    ivf = similarity.ann_cosine_ivf(emb, QIDS, k=K, n_centroids=16, n_probe=6).collect()
    assert len(ivf) > 0
    rows = emb.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    for r in ivf:  # every returned score exact
        qv, v = vecs[r["query_id"]], vecs[r["vec_id"]]
        exact = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        assert r["score"] == pytest.approx(exact, abs=1e-9)
    bset = {(r["query_id"], r["vec_id"]) for r in brute}
    iset = {(r["query_id"], r["vec_id"]) for r in ivf}
    recall = len(bset & iset) / len(bset)
    assert recall >= 0.4, f"ivf recall collapsed: {recall}"


def test_ivf_full_probe_equals_brute(spark, emb):
    """n_probe == n_centroids ⇒ every cell probed ⇒ exact brute force."""
    brute = sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in similarity.cosine_topk(emb, QIDS, k=K).collect()
    )
    ivf = sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in similarity.ann_cosine_ivf(emb, QIDS, k=K, n_centroids=8, n_probe=8).collect()
    )
    assert ivf == brute


def test_ivf_deterministic(spark, emb):
    a = similarity.ivf_centroids(emb, n_centroids=8)
    b = similarity.ivf_centroids(emb, n_centroids=8)
    assert (a == b).all()


def test_ivf_auto_cells_and_sampled_training(spark, emb):
    """Round-8 training-scale rules: n_centroids=None picks ≈√N (capped at
    sample//4), the sample is the deterministic hash-coordinate rule (not
    first-ids), and full probe stays exact brute force regardless."""
    n = emb.count()
    cents = similarity.ivf_centroids(emb)  # auto cells
    assert len(cents) == round(n ** 0.5)
    # deterministic across invocations, and a different salt trains on a
    # DIFFERENT sample (so the old first-ids bias cannot be back)
    again = similarity.ivf_centroids(emb)
    assert (cents == again).all()
    other = similarity.ivf_centroids(emb, salt="ivf-train-b")
    assert not (np.asarray(other).shape == cents.shape
                and (other == cents).all())
    # small sample caps the cell count at sample//4
    few = similarity.ivf_centroids(emb, sample=32)
    assert len(few) == 8
    # full probe ≡ brute even under auto cells
    brute = sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in similarity.cosine_topk(emb, QIDS, k=K).collect()
    )
    ivf = sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in similarity.ann_cosine_ivf(
            emb, QIDS, k=K, n_probe=len(cents)).collect()
    )
    assert ivf == brute
    # pruned-probe recall floor holds under auto cells too
    ivf_p = similarity.ann_cosine_ivf(
        emb, QIDS, k=K, n_probe=max(2, len(cents) // 4)).collect()
    bset = {(r["query_id"], r["vec_id"]) for r in
            similarity.cosine_topk(emb, QIDS, k=K).collect()}
    iset = {(r["query_id"], r["vec_id"]) for r in ivf_p}
    assert len(bset & iset) / len(bset) >= 0.4


def test_lsh_buckets_deterministic(spark, emb):
    a = {(r["vec_id"], r["band"]): r["key"] for r in similarity.lsh_signatures(emb).collect()}
    b = {(r["vec_id"], r["band"]): r["key"] for r in similarity.lsh_signatures(emb).collect()}
    assert a == b
    assert len(a) == 500 * 8
    assert all(0 <= k < 16 for k in a.values())


# ---- incremental IVF (append + drift recluster) ------------------------------

def test_ivf_append_assigns_to_existing_centroids(spark, emb, tmp_path):
    """append_ivf adds ONLY the new batch, assigned to the frozen centroids
    (nearest by cosine, NumPy-checked), leaving existing cells untouched."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "ivf_append")
    n = emb.count()
    cut = int(n * 0.8)
    first = emb.where(F.col("vec_id") < cut)
    rest = emb.where(F.col("vec_id") >= cut)
    cents = similarity.write_ivf(first, d, n_centroids=8)
    before = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(f"{d}/ann_vectors")
        .select("vec_id", "cluster").collect()
    }
    assert similarity.append_ivf(rest, d, skew_threshold=None) is False
    after = spark.read.parquet(f"{d}/ann_vectors").select("vec_id", "cluster")
    rows = after.collect()
    assert len(rows) == n
    got = {(r["vec_id"], r["cluster"]) for r in rows}
    assert got >= before  # existing cells untouched
    # appended vectors sit in their nearest-centroid cell
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    new_vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
                for r in rest.collect()}
    for vid, cl in got - before:
        v = new_vecs[vid]
        sims = cn @ (v / (np.linalg.norm(v) + 1e-12))
        assert cl == int(np.argmax(sims))


def test_ivf_append_drift_triggers_recluster(spark, tmp_path):
    """A clumped append blows the cell-size skew past the threshold →
    append_ivf retrains: centroids are recomputed over ALL stored vectors,
    cells rewritten and self-consistent (every vector in its nearest new
    cell), nothing lost. (Balance itself is data-dependent — a genuinely
    near-identical clump correctly stays one cell.)"""
    rs = np.random.RandomState(7)
    spread = [(i, [float(x) for x in rs.standard_normal(8)]) for i in range(64)]
    clump_center = rs.standard_normal(8)
    clump = [(1000 + i, [float(x) for x in clump_center + 0.01 * rs.standard_normal(8)])
             for i in range(256)]
    schema = "vec_id long, embedding array<double>"
    d = str(tmp_path / "ivf_drift")
    old_cents = similarity.write_ivf(
        spark.createDataFrame(spread, schema), d, n_centroids=8)
    assert similarity.append_ivf(
        spark.createDataFrame(clump, schema), d, skew_threshold=3.0) is True
    rows = spark.read.parquet(f"{d}/ann_vectors").collect()
    assert len(rows) == 64 + 256  # nothing lost, nothing duplicated
    new_cents = np.stack([
        np.asarray(r["v"], dtype=np.float64)
        for r in sorted(spark.read.parquet(f"{d}/ann_centroids").collect(),
                        key=lambda r: r["cluster"])
    ])
    assert not np.allclose(new_cents, old_cents)  # really retrained
    # rewritten cells are self-consistent with the NEW centroids
    cn = new_cents / np.linalg.norm(new_cents, axis=1, keepdims=True)
    for r in rows:
        v = np.asarray(r["v"], dtype=np.float64)
        sims = cn @ (v / (np.linalg.norm(v) + 1e-12))
        assert r["cluster"] == int(np.argmax(sims))
    # below-threshold appends never retrain
    extra = [(5000, [float(x) for x in rs.standard_normal(8)])]
    assert similarity.append_ivf(
        spark.createDataFrame(extra, schema), d, skew_threshold=1e9) is False


def test_filtered_vector_search(spark, emb, tmp_path):
    """Filtered vector search: eligibility semi-joined BEFORE top-k — exact
    within the allowed set (equals brute force over the allowed candidates,
    never over-fetch-and-post-filter), across brute/IVF-full-probe/serving;
    LSH respects the filter on its candidates."""
    from pyspark.sql import functions as F

    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.operators.similarity import (
        ann_cosine_ivf,
        ann_cosine_lsh,
        cosine_topk,
        write_ivf,
    )

    qids = list(range(8))
    pred = F.expr("vec_id % 3 <> 0")
    allowed_df = emb.where(pred)
    allowed = {r["vec_id"] for r in allowed_df.select("vec_id").collect()}

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
            for r in df.collect()
        )

    want = rows(cosine_topk(emb, qids, k=5, allowed=allowed_df))
    assert want and all(v in allowed for _q, _r, v, _s in want)
    # independent derivation: brute force over the pre-filtered table, with
    # query vectors taken from the UNFILTERED table (queries 0,3,6 are not
    # themselves eligible but still query)
    assert 0 not in allowed
    full = rows(cosine_topk(emb, qids, k=10_000))
    refil = {}
    for q, _r, v, s in full:
        if v in allowed:
            refil.setdefault(q, []).append((-s, v))
    manual = []
    for q, cands in refil.items():
        for rank, (ns, v) in enumerate(sorted(cands)[:5], 1):
            manual.append((q, rank, v, -ns))
    assert want == sorted(manual)

    # IVF full probe filtered == brute filtered
    got_ivf = rows(ann_cosine_ivf(emb, qids, k=5, n_centroids=8, n_probe=8,
                                  allowed=allowed_df))
    assert got_ivf == want

    # serving filtered == brute filtered (full probe); the vector replica
    # lives inside an index dir (the write_ivf layout)
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.plans.build import build_index_resumable

    d = str(tmp_path / "fann")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs.limit(50), d,
                          IndexConfig(docs_per_shard=64, block_docs=8))
    write_ivf(emb, d, n_centroids=8)
    got_srv = sorted(
        (q, r, v, round(s, 9))
        for q, r, v, s in IndexServer(d).ann_batch(
            qids, k=5, n_probe=8, allowed_vec_ids=sorted(allowed))
    )
    assert got_srv == want

    # LSH: approximate, but every returned candidate honors the filter
    got_lsh = rows(ann_cosine_lsh(emb, qids, k=5, allowed=allowed_df))
    assert got_lsh and all(v in allowed for _q, _r, v, _s in got_lsh)


def test_tombstone_coupled_vector_search(spark, emb, tmp_path):
    """Coupling the text index's delete set into vector search (the
    vec_id == doc_id mapping): plans.deletes.live_doc_ids yields the live
    eligibility relation for the Spark `allowed=` path, and serving
    ann_batch(exclude_tombstoned=True) masks by the loaded tombstone
    bitmaps — both equal the brute filtered ranking over survivors."""
    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.operators.similarity import cosine_topk, write_ivf
    from bloqsenjin_spark.plans import deletes as D
    from bloqsenjin_spark.plans.build import build_index_resumable

    cfg = IndexConfig(docs_per_shard=64, block_docs=8)
    d = str(tmp_path / "tann")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs, d, cfg)
    write_ivf(emb, d, n_centroids=8)
    n_docs = docs.count()
    qids = list(range(6))
    # pick victims FROM the unmasked ranking so the coupling provably
    # changes the results
    base = IndexServer(d, cfg).ann_batch(qids, k=5, n_probe=8)
    victims = sorted({v for _q, _r, v, _s in base})[:3]
    assert victims
    D.delete_docs(spark, d, victims)

    live = D.live_doc_ids(spark, d)
    live_set = {r["doc_id"] for r in live.collect()}
    assert live_set == set(range(n_docs)) - set(victims)

    want = sorted(
        (r["query_id"], r["rank"], r["vec_id"], round(r["score"], 9))
        for r in cosine_topk(emb, qids, k=5, allowed=live,
                     allowed_col="doc_id").collect()
    )
    assert want and not any(v in victims for _q, _r, v, _s in want)
    got = sorted(
        (q, r, v, round(s, 9))
        for q, r, v, s in IndexServer(d, cfg).ann_batch(
            qids, k=5, n_probe=8, exclude_tombstoned=True)
    )
    assert got == want
    # vectors are a SEPARATE table, so UNMASKED ANN still returns the
    # victims — the coupling (exclude_tombstoned / live_doc_ids) is exactly
    # what removes them, pinned by construction above
    assert any(v in victims for _q, _r, v, _s in base)


def test_ivf_centroids_explicit_underdelivery_raises(spark):
    """Round-9 guard (round-8 ADVICE): fewer training vectors than an
    EXPLICIT n_centroids must refuse loudly instead of silently training a
    smaller codebook."""
    import pytest

    from bloqsenjin_spark.operators import similarity

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="training vectors"):
        similarity.ivf_centroids(emb, n_centroids=16)
