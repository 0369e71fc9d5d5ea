"""S13 query-set ingestion: parquet + JSON(+gated protobuf) with pinned
schema, tokenizer-normalized terms, loud validation — plus a spark-submit
smoke of jobs/query_job.py over both file formats."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from bloqsenjin_spark.sources import queries as Q

QS = [
    (1, ["fast", "query"], "conjunctive", 5),
    (2, ["The,", "FAST!"], "disjunctive", 3),  # needs tokenizer normalization
]


def _write_json(tmp_path):
    p = str(tmp_path / "qs.jsonl")
    with open(p, "w") as f:
        for qid, terms, mode, k in QS:
            f.write(json.dumps(
                {"query_id": qid, "terms": terms, "mode": mode, "k": k}) + "\n")
    return p


def _write_parquet(spark, tmp_path):
    p = str(tmp_path / "qs.parquet")
    spark.createDataFrame(QS, Q.QUERY_SET_SCHEMA).write.mode("overwrite").parquet(p)
    return p


def test_load_json(spark, tmp_path):
    got = Q.load_query_set(spark, _write_json(tmp_path))
    assert sorted(got) == [
        (1, ["fast", "query"], "conjunctive", 5),
        (2, ["the", "fast"], "disjunctive", 3),
    ]


def test_load_parquet(spark, tmp_path):
    got = Q.load_query_set(spark, _write_parquet(spark, tmp_path))
    assert sorted(got)[1] == (2, ["the", "fast"], "disjunctive", 3)


def test_validation_rejects_malformed():
    with pytest.raises(ValueError, match="mode"):
        Q.validate_queries([(1, ["a"], "fuzzy", 5)])
    with pytest.raises(ValueError, match="duplicate"):
        Q.validate_queries([(1, ["a"], "conjunctive", 5), (1, ["b"], "conjunctive", 5)])
    with pytest.raises(ValueError, match="k must be"):
        Q.validate_queries([(1, ["a"], "conjunctive", 0)])
    with pytest.raises(ValueError, match="no terms"):
        Q.validate_queries([(1, ["...", "!!"], "conjunctive", 5)])


def test_protobuf_gated(spark, tmp_path):
    if Q.protobuf_available(spark):
        pytest.skip("spark-protobuf present; gate test is for bare classpaths")
    with pytest.raises(RuntimeError, match="spark-protobuf"):
        Q.load_query_set(spark, str(tmp_path / "x.pb"), fmt="protobuf")


@pytest.mark.parametrize("fmt", ["parquet", "json"])
def test_query_job_spark_submit_smoke(spark, tmp_path, fmt):
    """End-to-end: build a tiny index on disk, then run jobs/query_job.py via
    spark-submit with a --queries file in each supported format."""
    import shutil as _sh

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.plans.build import build_index_resumable

    spark_submit = _sh.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    cfg = IndexConfig(docs_per_shard=128, block_docs=16)
    idx_dir = str(tmp_path / "idx")
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    build_index_resumable(docs, idx_dir, cfg)

    qfile = _write_json(tmp_path) if fmt == "json" else _write_parquet(spark, tmp_path)
    out = str(tmp_path / f"res_{fmt}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(
        [spark_submit, "--master", "local[4]",
         os.path.join(repo, "jobs", "query_job.py"),
         "--index-dir", idx_dir, "--out", out, "--queries", qfile,
         "--docs-per-shard", "128", "--block-docs", "16"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = spark.read.parquet(out)
    assert res.count() > 0
    assert {x["query_id"] for x in res.select("query_id").distinct().collect()} == {1, 2}
