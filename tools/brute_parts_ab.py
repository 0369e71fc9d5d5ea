"""Decompose the brute A/B: kernel term filter alone (noop-sinked scan),
stats action shapes, scoring job shapes — interleaved in one session."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.operators.postings import doc_term_freqs
    from bloqsenjin_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("brute_parts_ab", cores=cores)
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
    qterms = sorted({t for q in corpus.REFERENCE_QUERIES for t in q[1]})

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    runs = {
        # scan shapes
        "scan_jvm_filter": lambda: noop(
            doc_term_freqs(bdocs, doc_markers=True).where(
                F.col("term").isNull() | F.col("term").isin(qterms))),
        "scan_kernel_filter": lambda: noop(
            doc_term_freqs(bdocs, doc_markers=True, terms=qterms)),
        # stats action shapes over a fresh (uncached) filtered scan
        "stats_first_only": lambda: doc_term_freqs(
            bdocs, doc_markers=True, terms=qterms).where(
                F.col("term").isNull()).agg(
                    F.count("*"), F.avg("dl")).first(),
        "stats_groupby_term": lambda: doc_term_freqs(
            bdocs, doc_markers=True, terms=qterms).groupBy("term").agg(
                F.count("*"), F.avg("dl")).collect(),
    }
    for fn in runs.values():
        fn()
    ts: dict[str, list[float]] = {k: [] for k in runs}
    for _ in range(3):
        for name, fn in runs.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            ts[name].append(time.perf_counter() - t0)
    print(json.dumps({k: round(min(v), 3) for k, v in ts.items()}))

    # scoring shapes over an identical pre-cached raw
    raw = doc_term_freqs(bdocs, doc_markers=True, terms=qterms).persist(
        StorageLevel.MEMORY_AND_DISK)
    raw.count()
    from pyspark.sql import Window

    from bloqsenjin_spark.functions import bm25
    from bloqsenjin_spark.operators.topk import query_terms

    qdf = corpus.reference_queries(spark)
    qt = query_terms(qdf)
    n_docs, avgdl = raw.where(F.col("term").isNull()).agg(
        F.count("*"), F.avg("dl")).first()
    avgdl = float(avgdl)
    df_map = {r["term"]: int(r["c"]) for r in raw.where(
        F.col("term").isNotNull()).groupBy("term").agg(
            F.count("*").alias("c")).collect()}
    tf_q = raw.where(F.col("term").isNotNull())

    def score_window():
        w_term = Window.partitionBy("term")
        contrib = (
            tf_q.withColumn("df", F.count("*").over(w_term))
            .withColumn("idf", bm25.idf_col(F.col("df"), int(n_docs)))
            .join(F.broadcast(qt), "term")
            .withColumn("contrib", F.col("idf") * bm25.tf_component_col(
                F.col("tf"), F.col("dl"), avgdl))
        )
        return _fold_topk(contrib).count()

    def score_map():
        df_expr = F.create_map(
            *[F.lit(x) for t in sorted(df_map) for x in (t, df_map[t])]
        )[F.col("term")]
        contrib = (
            tf_q.withColumn("df", df_expr)
            .withColumn("idf", bm25.idf_col(F.col("df"), int(n_docs)))
            .join(F.broadcast(qt), "term")
            .withColumn("contrib", F.col("idf") * bm25.tf_component_col(
                F.col("tf"), F.col("dl"), avgdl))
        )
        return _fold_topk(contrib).count()

    def score_map_collect():
        df_expr = F.create_map(
            *[F.lit(x) for t in sorted(df_map) for x in (t, df_map[t])]
        )[F.col("term")]
        contrib = (
            tf_q.withColumn("df", df_expr)
            .withColumn("idf", bm25.idf_col(F.col("df"), int(n_docs)))
            .join(F.broadcast(qt), "term")
            .withColumn("contrib", F.col("idf") * bm25.tf_component_col(
                F.col("tf"), F.col("dl"), avgdl))
        )
        return len(_fold_topk(contrib).collect())

    def _fold_topk(contrib):
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
            .where((F.col("mode") == "disjunctive")
                   | (F.col("n_matched") == F.col("n_terms")))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "doc_id", "score")
        )

    sruns = {"score_window": score_window, "score_map": score_map,
             "score_map_collect": score_map_collect}
    for fn in sruns.values():
        fn()
    ts2: dict[str, list[float]] = {k: [] for k in sruns}
    for _ in range(3):
        for name, fn in sruns.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            ts2[name].append(time.perf_counter() - t0)
    print(json.dumps({k: round(min(v), 3) for k, v in ts2.items()}))


if __name__ == "__main__":
    main()
