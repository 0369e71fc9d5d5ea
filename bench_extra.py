"""Round-9 optimization micro-bench — ISOLATED phases of the frozen bench.py
(guide §1.4: noop-sink / targeted timing without the full suite). bench.py is
frozen for measurement; numbers from here are cited in OPTIMIZATION_r09.md.

Usage: python bench_extra.py [phase ...] [--sf-dir D] [--cores N]
Phases: brute wand build queries serving ann
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phases", nargs="*", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)))
    ap.add_argument("--replication", type=int, default=int(
        os.environ.get("BENCH_REPLICATION", "20")))
    args = ap.parse_args()
    phases = set(args.phases or ["brute", "wand", "build", "queries", "serving"])

    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators import topk, wand
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.plans import build as B
    from bloqsenjin_spark.session import get_spark

    spark = get_spark("bench_extra", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2_000_000).selectExpr("sum(id * 2)").collect()
    spark.createDataFrame([("warm",)], "t string").select(
        extract_text(F.encode("t", "utf-8"))).collect()
    cfg = IndexConfig(docs_per_shard=4096, block_docs=512)
    out: dict[str, float] = {}

    pages = corpus.synth_pages(spark, args.sf_dir, args.replication)
    ranked = assign_doc_ids(pages.select("url", "html", "lang"),
                            num_partitions=2 * args.cores, assume_unique=True)
    docs = ranked.select("doc_id", "url",
                         extract_text("html").alias("text"), "lang")

    if "brute" in phases:
        spark.sparkContext.setJobDescription("bench_extra: bm25_brute")
        bdocs = docs.select("doc_id", "text")
        t0 = time.perf_counter()
        n = topk.bm25_brute_force(bdocs, corpus.reference_queries(spark)).count()
        out["bm25_brute"] = round(time.perf_counter() - t0, 3)
        out["brute_rows"] = n

    need_idx = phases & {"wand", "build", "queries", "serving"}
    if need_idx:
        idx_dir = tempfile.mkdtemp(prefix="bx_idx_")
        try:
            spark.sparkContext.setJobDescription("bench_extra: index_build")
            t0 = time.perf_counter()
            B.build_index_resumable(docs, idx_dir, cfg)
            out["index_build"] = round(time.perf_counter() - t0, 3)
            idx = B.read_index(spark, idx_dir, cfg)
            idx.postings.persist(StorageLevel.MEMORY_AND_DISK).count()
            idx.doc_lens.persist(StorageLevel.MEMORY_AND_DISK).count()
            if "wand" in phases:
                spark.sparkContext.setJobDescription("bench_extra: bm25_wand")
                t0 = time.perf_counter()
                wand.bm25_wand_topk(
                    idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
                    corpus.REFERENCE_QUERIES, cfg).count()
                out["bm25_wand"] = round(time.perf_counter() - t0, 3)
            if "queries" in phases:
                trials: dict[int, list[float]] = {
                    q[0]: [] for q in corpus.REFERENCE_QUERIES}
                for _ in range(3):
                    for q in corpus.REFERENCE_QUERIES:
                        spark.sparkContext.setJobDescription(
                            f"bench_extra: q{q[0]}")
                        t0 = time.perf_counter()
                        wand.bm25_wand_topk(
                            idx.postings, idx.doc_lens, idx.term_stats,
                            idx.avgdl, [q], cfg).count()
                        trials[q[0]].append(time.perf_counter() - t0)
                for qid, ts in trials.items():
                    out[f"q{qid}"] = round(min(ts), 4)
                lat = sorted(min(ts) for ts in trials.values())
                out["p50_query_sec"] = round(lat[len(lat) // 2], 4)
                out["p95_query_sec"] = round(
                    lat[min(len(lat) - 1, int(0.95 * len(lat)))], 4)
            if "serving" in phases:
                from bloqsenjin_spark.operators.serving import IndexServer

                srv = IndexServer(idx_dir, cfg)
                srv.query_batch(corpus.REFERENCE_QUERIES)
                st: dict[int, list[float]] = {
                    q[0]: [] for q in corpus.REFERENCE_QUERIES}
                for _ in range(3):
                    for q in corpus.REFERENCE_QUERIES:
                        t0 = time.perf_counter()
                        srv.query_batch([q])
                        st[q[0]].append(time.perf_counter() - t0)
                slat = sorted(min(ts) for ts in st.values())
                out["serving_batch"] = round(sum(slat), 4)
                out["p95_serving_sec"] = round(
                    slat[min(len(slat) - 1, int(0.95 * len(slat)))], 5)
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)

    if "ann" in phases:
        from bloqsenjin_spark.operators import similarity as SIM
        from bloqsenjin_spark.operators.serving import IndexServer

        ann_dir = tempfile.mkdtemp(prefix="bx_ann_")
        try:
            emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
            t0 = time.perf_counter()
            SIM.write_ivf(emb, ann_dir, n_centroids=16)
            out["ivf_build_sec"] = round(time.perf_counter() - t0, 3)
            srv = IndexServer.__new__(IndexServer)
            # minimal shim: ann_batch needs _ds/_replica_handles/index_dir
            import pyarrow.dataset as pads

            srv._ds = pads
            srv.index_dir = ann_dir
            srv._replica_handles = {}
            srv._is_snap = True
            srv.tomb_masks = {}
            srv.ann_batch(list(range(10)), k=5, n_probe=4)  # warm
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                srv.ann_batch(list(range(10)), k=5, n_probe=4)
                ts.append(time.perf_counter() - t0)
            out["ann_batch"] = round(min(ts), 5)
        finally:
            shutil.rmtree(ann_dir, ignore_errors=True)

    out["sf_dir"] = args.sf_dir
    out["cores"] = args.cores
    print(json.dumps(out))


if __name__ == "__main__":
    main()
