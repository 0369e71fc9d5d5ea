"""Storage-backend seam: parquet always; Iceberg tables when the runtime is
on the classpath (the 100 TB deployment shape — skipped where it isn't)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.plans import build as B
from bloqsenjin_spark.plans import store as S

CFG = IndexConfig(docs_per_shard=64, block_docs=8)


def _index_dir(spark, backend, tmp_path, name):
    if backend == "parquet":
        return str(tmp_path / name)
    if not S.iceberg_available(spark):
        pytest.skip("Iceberg runtime not on the Spark classpath in this sandbox")
    return f"iceberg://local.db.{name}"


def test_for_index_routing(spark, tmp_path):
    st = S.for_index(spark, str(tmp_path / "x"))
    assert isinstance(st, S.ParquetStore) and st.kind == "parquet"
    if not S.iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            S.for_index(spark, "iceberg://local.db.idx")
    else:
        assert S.for_index(spark, "iceberg://local.db.idx").kind == "iceberg"


def test_parquet_checkpoint_upsert_dedupes_on_read(spark, tmp_path):
    """Append-only checkpoints may hold duplicate shard rows after a crashed
    retry; completed_shards must still be the set of done shards."""
    d = str(tmp_path / "idx")
    st = S.for_index(spark, d)
    ck = spark.createDataFrame(
        [(0, "done", 1, 1, 1)], "shard int, status string, n_docs long, n_postings long, bytes long"
    ).withColumn("ts", F.current_timestamp())
    st.upsert_checkpoints(ck)
    st.upsert_checkpoints(ck)  # retried round: duplicate row appended
    assert B.completed_shards(spark, d) == {0}


@pytest.mark.parametrize("backend", ["parquet", "iceberg"])
def test_kill_and_resume_backends(spark, tmp_path, backend):
    """Kill-and-resume through the seam: resumed == uninterrupted on whichever
    backend the runtime supports."""
    docs = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    full_dir = _index_dir(spark, backend, tmp_path, "full")
    resumed_dir = _index_dir(spark, backend, tmp_path, "resumed")

    B.build_index_resumable(docs, full_dir, CFG)
    partial = docs.where(F.col("doc_id") < 2 * CFG.docs_per_shard)
    B.build_index_resumable(partial, resumed_dir, CFG)
    assert B.completed_shards(spark, resumed_dir) == {0, 1}
    B.build_index_resumable(docs, resumed_dir, CFG)
    assert B.completed_shards(spark, resumed_dir) == B.completed_shards(spark, full_dir)

    from bloqsenjin_spark.operators.postings import decode_postings

    got = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(B.read_index(spark, resumed_dir, CFG).postings, CFG).collect()
    )
    want = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_postings(B.read_index(spark, full_dir, CFG).postings, CFG).collect()
    )
    assert got == want
