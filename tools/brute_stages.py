"""Instrument bm25_brute_force's internal stages (guide §1.4) — a copy of
the operator's body with per-action timers, run on the bench's exact input.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.functions import bm25
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.operators.postings import doc_term_freqs
    from bloqsenjin_spark.operators.topk import query_terms
    from bloqsenjin_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("brute_stages", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()
    spark.createDataFrame([("warm",)], "t string").select(
        extract_text(F.encode("t", "utf-8"))).collect()

    pages = corpus.synth_pages(spark, sf_dir, 20)
    ranked = assign_doc_ids(pages.select("url", "html", "lang"),
                            num_partitions=2 * cores, assume_unique=True)
    docs = ranked.select("doc_id", "url",
                         extract_text("html").alias("text"), "lang")
    bdocs = docs.select("doc_id", "text")
    queries = corpus.reference_queries(spark)

    out = {}
    for trial in range(2):
        t_all = time.perf_counter()
        t0 = time.perf_counter()
        qt = query_terms(queries)
        qterm_list = [r["term"] for r in qt.select("term").distinct().collect()]
        out["collect_qterms"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        raw = doc_term_freqs(bdocs, doc_markers=True).where(
            F.col("term").isNull()
            | (F.col("term").isin(qterm_list) if qterm_list else F.lit(False))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        n_docs, avgdl = raw.where(F.col("term").isNull()).agg(
            F.count("*"), F.avg("dl")).first()
        out["scan_cache_stats"] = round(time.perf_counter() - t0, 3)
        avgdl = float(avgdl or 0.0) or 1.0

        t0 = time.perf_counter()
        tf_q = raw.where(F.col("term").isNotNull())
        w_term = Window.partitionBy("term")
        contrib = (
            tf_q.withColumn("df", F.count("*").over(w_term))
            .withColumn("idf", bm25.idf_col(F.col("df"), int(n_docs)))
            .join(F.broadcast(qt), "term")
            .withColumn(
                "contrib",
                F.col("idf") * bm25.tf_component_col(F.col("tf"), F.col("dl"), avgdl),
            )
        )
        scored = (
            contrib.groupBy("query_id", "doc_id", "mode", "k", "n_terms")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["contrib"],
                ).alias("score"),
                F.count("*").alias("n_matched"),
            )
            .where((F.col("mode") == "disjunctive") | (F.col("n_matched") == F.col("n_terms")))
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        topk_df = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
        )
        n = topk_df.count()
        out["score_window_count"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        ckpt = topk_df.localCheckpoint(eager=True)
        out["local_checkpoint"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        raw.unpersist()
        ckpt.count()
        out["final_count"] = round(time.perf_counter() - t0, 3)
        out[f"total_trial{trial}"] = round(time.perf_counter() - t_all, 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
