from __future__ import annotations

import pytest

from bloqsenjin_spark.operators import multimodal, textstats


@pytest.fixture(scope="module")
def tdocs(spark):
    rows = [
        (0, "the cat and the dog is in a house that was big for a day"),
        (1, "der hund und die katze ist nicht das problem"),
        (2, "le chat et la maison est une grande idee"),
        (3, "el perro y la casa que es los gatos"),
        (4, ""),
        (5, "zzzz qqqq xxxx wwww"),
        (6, "!!! ??? ;;; :::"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id_markers(spark, tdocs):
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(tdocs).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr" and got[3] == "es"
    assert got[4] == "und" and got[5] == "und" and got[6] == "und"


def test_quality_edges(spark, tdocs):
    q = {r["doc_id"]: r for r in textstats.quality_score(tdocs).collect()}
    assert q[4]["quality"] == 0.0 and q[4]["n_tokens"] == 0
    assert q[6]["n_tokens"] == 0 and q[6]["alnum_ratio"] == 0.0
    assert q[0]["quality"] > q[5]["quality"]  # stopword-bearing beats gibberish
    assert 0.0 <= q[0]["quality"] <= 1.0


def test_token_count(spark, tdocs):
    t = {r["doc_id"]: r["n_tokens"] for r in textstats.token_count(tdocs).collect()}
    assert t[0] == 15 and t[4] == 0 and t[6] == 0


def test_fingerprint_normalization(spark):
    docs = spark.createDataFrame(
        [(0, "Hello,  WORLD!"), (1, "hello world"), (2, "hello  world ")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in textstats.fingerprint(docs).collect()}
    assert fp[0] == fp[1] == fp[2]


def test_multimodal_fake_features_deterministic(spark, tdocs):
    assets = multimodal.assets_from_documents(tdocs)
    a = {r["asset_id"]: list(r["features"]) for r in multimodal.fake_decode_features(assets).collect()}
    b = {r["asset_id"]: list(r["features"]) for r in multimodal.fake_decode_features(assets).collect()}
    assert a == b
    assert all(len(v) == multimodal.FEATURE_DIM for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)


def test_frame_sampling_plan(spark, tdocs):
    assets = multimodal.assets_from_documents(tdocs)
    plans = multimodal.frame_sample_indices(assets, n_frames=4).collect()
    assert len(plans) > 0
    for r in plans:
        idx = list(r["frame_idx"])
        assert len(idx) == 4 and idx == sorted(idx) and idx[0] == 0
