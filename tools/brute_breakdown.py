"""Round-9 follow-up: isolate the bm25_brute phase's sub-costs (guide §1.4).

Pieces, each noop-sinked / counted separately on the SAME session, in the
same order the frozen bench reaches them (assign_doc_ids' internal persist
is created by the first action, as in bench.py where the build runs first):

  ids_noop       assign_doc_ids output (url ranged shuffle + _assign map)
  docs_noop      + extraction UDF
  scan_noop      + doc_term_freqs tokenize (all-vocab rows, no filter)
  scan_filtered  + the query-term In-filter (the brute scan shape)
  brute_full     topk.bm25_brute_force end to end

Usage: python tools/brute_breakdown.py [--sf-dir D] [--cores N] [--trials T]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ap.add_argument("--replication", type=int, default=int(
        os.environ.get("BENCH_REPLICATION", "20")))
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators import topk
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.operators.postings import doc_term_freqs
    from bloqsenjin_spark.session import get_spark

    spark = get_spark("brute_breakdown", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()
    spark.createDataFrame([("warm",)], "t string").select(
        extract_text(F.encode("t", "utf-8"))).collect()

    pages = corpus.synth_pages(spark, args.sf_dir, args.replication)
    ranked = assign_doc_ids(pages.select("url", "html", "lang"),
                            num_partitions=2 * args.cores, assume_unique=True)
    docs = ranked.select("doc_id", "url",
                         extract_text("html").alias("text"), "lang")
    bdocs = docs.select("doc_id", "text")
    qdf = corpus.reference_queries(spark)
    qterms = sorted({t for q in corpus.REFERENCE_QUERIES for t in q[1]})

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    runs = {
        "ids_noop": lambda: noop(ranked),
        "docs_noop": lambda: noop(bdocs),
        "scan_noop": lambda: noop(doc_term_freqs(bdocs, doc_markers=True)),
        "scan_filtered": lambda: noop(
            doc_term_freqs(bdocs, doc_markers=True).where(
                F.col("term").isNull() | F.col("term").isin(qterms))),
        "brute_full": lambda: topk.bm25_brute_force(bdocs, qdf).count(),
    }
    ts: dict[str, list[float]] = {k: [] for k in runs}
    for name, fn in runs.items():  # warm once in order (creates the persist)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn()
    for _ in range(args.trials):
        for name, fn in runs.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            ts[name].append(time.perf_counter() - t0)
    out = {k: round(min(v), 3) for k, v in ts.items()}
    out["sf_dir"] = args.sf_dir
    out["cores"] = args.cores
    print(json.dumps(out))


if __name__ == "__main__":
    main()
