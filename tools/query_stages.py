"""Isolate the single-query bm25_wand_topk cost pieces at bench scale:
stats collect job / partials job / window+count (guide §1.4)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators import wand
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.plans import build as B
    from bloqsenjin_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("query_stages", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()
    spark.createDataFrame([("warm",)], "t string").select(
        extract_text(F.encode("t", "utf-8"))).collect()
    cfg = IndexConfig(docs_per_shard=4096, block_docs=512)

    pages = corpus.synth_pages(spark, sf_dir, 20)
    ranked = assign_doc_ids(pages.select("url", "html", "lang"),
                            num_partitions=2 * cores, assume_unique=True)
    docs = ranked.select("doc_id", "url",
                         extract_text("html").alias("text"), "lang")
    idx_dir = tempfile.mkdtemp(prefix="qs_idx_")
    try:
        B.build_index_resumable(docs, idx_dir, cfg)
        idx = B.read_index(spark, idx_dir, cfg)
        idx.postings.persist(StorageLevel.MEMORY_AND_DISK).count()
        idx.doc_lens.persist(StorageLevel.MEMORY_AND_DISK).count()

        q = corpus.REFERENCE_QUERIES[0]
        out = {}
        ts: dict[str, list[float]] = {"stats_collect": [], "partials_count": [],
                                      "full_topk": [], "batch12": []}
        for _ in range(4):
            t0 = time.perf_counter()
            terms = sorted(set(q[1]))
            _ = {r["term"]: float(r["idf"]) for r in idx.term_stats.where(
                F.col("term").isin(terms)).collect()}
            ts["stats_collect"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            wand.wand_score_partials(idx.postings, idx.doc_lens,
                                     idx.term_stats, idx.avgdl, [q],
                                     cfg).count()
            ts["partials_count"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            wand.bm25_wand_topk(idx.postings, idx.doc_lens, idx.term_stats,
                                idx.avgdl, [q], cfg).count()
            ts["full_topk"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            wand.bm25_wand_topk(idx.postings, idx.doc_lens, idx.term_stats,
                                idx.avgdl, corpus.REFERENCE_QUERIES,
                                cfg).count()
            ts["batch12"].append(time.perf_counter() - t0)
        for k, v in ts.items():
            out[k] = round(min(v), 4)
        print(json.dumps(out))
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
