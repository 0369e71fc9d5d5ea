"""S2 connector: paginated REST-style scan as a PySpark DataSource, exercised
over the deterministic file:// transport (same parser/partitioning as HTTP)."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from bloqsenjin_spark.sources import rest


def _write_pages(tmp_path, n_pages=3, rows_per_page=4):
    docs = []
    for p in range(n_pages):
        rows = []
        for i in range(rows_per_page):
            doc_id = p * rows_per_page + i
            text = f"page {p} row {i} fast query"
            rows.append(
                {
                    "url": f"doc://rest/{doc_id}",
                    "warc_ts": "2026-01-01 00:00:00",
                    "html_b64": base64.b64encode(
                        f"<p>{text}</p>".encode()).decode(),
                    "text": text,
                    "lang": "en",
                }
            )
            docs.append((f"doc://rest/{doc_id}", text))
        with open(tmp_path / f"page-{p}.json", "w") as f:
            json.dump({"rows": rows}, f)
    return docs


def test_rest_scan_pages_shape(spark, tmp_path):
    want = _write_pages(tmp_path)
    rest.register(spark)
    df = (
        spark.read.format("bloqsenjin_rest")
        .option("endpoint", f"file://{tmp_path}")
        .option("n_pages", 3)
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    got = {(r["url"], r["text"]) for r in df.collect()}
    assert got == set(want)
    # one Spark partition per REST page — the fan-out IS the pagination plan
    assert df.rdd.getNumPartitions() == 3


def test_rest_scan_feeds_the_engine(spark, tmp_path):
    """End-to-end DAL pluggability: extraction + index build over the REST
    source give the same results as over an equivalent in-memory frame."""
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.operators import wand
    from bloqsenjin_spark.plans.build import build_index

    _write_pages(tmp_path)
    rest.register(spark)
    pages = (
        spark.read.format("bloqsenjin_rest")
        .option("endpoint", f"file://{tmp_path}")
        .option("n_pages", 3)
        .load()
    )
    docs = assign_doc_ids(pages.select("url", "html")).select(
        "doc_id", extract_text("html").alias("text")
    )
    cfg = IndexConfig(docs_per_shard=8, block_docs=4)
    idx = build_index(docs, cfg)
    res = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        [(1, ["fast", "query"], "conjunctive", 100)], cfg,
    )
    assert res.count() == 12  # every page row contains 'fast query'


def test_rest_missing_page_fails_loudly(spark, tmp_path):
    _write_pages(tmp_path, n_pages=1)
    rest.register(spark)
    df = (
        spark.read.format("bloqsenjin_rest")
        .option("endpoint", f"file://{tmp_path}")
        .option("n_pages", 2)  # page-1 absent
        .load()
    )
    with pytest.raises(Exception, match="page-1.json"):
        df.count()
