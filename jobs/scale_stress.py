"""Scale-stress evidence run (round 7): one 5M-doc build at local[32].

The closest this single-box sandbox gets to the 100× question: build the
REAL production path (assign_doc_ids → extract → build_index(cache=True) →
write_index) over a web-shaped corpus (corpus.gen_zipf_pages: Zipf s≈1.1
vocabulary, planted head terms — 'the' in >50% of docs — log-normal doc
lengths, noisy-html extraction), and record

  * docs/s end-to-end + per-stage seconds (which stage saturates first),
  * peak resident memory of the JVM + this Python driver (/proc VmHWM),
  * the per-shard postings size histogram and the HEAD term's per-shard
    spread — the (term, shard) co-sharding is the skew treatment: a
    df≈N term's posting list is split across every doc-range shard, so
    no single task ever owns a corpus-wide posting list,
  * serving-tier latencies over the resulting index (eager + lazy stats).

Usage: python jobs/scale_stress.py [--docs 5000000] [--cores 32]
Prints ONE JSON line; the narrative lives in BENCH.md §scale-stress.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fanout_worker(args):
    """One slice owner in a spawned process: open the slice server, warm
    the head-term batch, return (rows, best-of-3 seconds). No Spark, no
    shared state — the multi-server deployment shape."""
    index_dir, cfg_kw, shard_slice, queries = args
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.operators.serving import IndexServer

    srv = IndexServer(index_dir, IndexConfig(**cfg_kw), shards=shard_slice)
    rows = srv.query_batch(queries)  # warm (decodes + caches the slice)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rows = srv.query_batch(queries)
        best = min(best, time.perf_counter() - t0)
    return rows, best


def _peak_rss_gb() -> dict:
    """Peak resident set (VmHWM) of every live java process + self."""
    peaks = {}
    for p in glob.glob("/proc/[0-9]*/status"):
        try:
            txt = open(p).read()
        except OSError:
            continue
        name = txt.split("Name:", 1)[1].split(None, 1)[0]
        if name not in ("java", "python3", "python"):
            continue
        if "VmHWM" in txt:
            kb = int(txt.split("VmHWM:", 1)[1].split()[0])
            key = "jvm" if name == "java" else "python"
            peaks[key] = max(peaks.get(key, 0), kb)
    return {k: round(v / 1024 / 1024, 2) for k, v in peaks.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=50_000)
    ap.add_argument("--keep-dir", default=None,
                    help="persist corpus+index here instead of a tmpdir")
    ap.add_argument("--ann-vectors", type=int, default=5_000_000,
                    help="IVF ANN stress size (0 skips the section)")
    ap.add_argument("--ann-dim", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bloqsenjin_spark import corpus
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.functions.text import extract_text
    from bloqsenjin_spark.operators.docids import assign_doc_ids
    from bloqsenjin_spark.operators.serving import IndexServer
    from bloqsenjin_spark.plans import build as B
    from bloqsenjin_spark.session import get_spark

    spark = get_spark("scale-stress", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(docs_per_shard=4096, block_docs=512)
    root = args.keep_dir or tempfile.mkdtemp(prefix="scale_stress_")
    pages_dir, idx_dir = f"{root}/pages", f"{root}/idx"
    out: dict = {"metric": "scale_stress_build", "unit": "sec",
                 "n_docs_target": args.docs, "cores": args.cores,
                 "vocab": args.vocab, "cfg": {"docs_per_shard": 4096,
                                              "block_docs": 512}}
    stages: dict[str, float] = {}
    try:
        # corpus ON DISK first (the input contract — a 100 TB corpus is a
        # table, not a generator); generation time reported separately
        t0 = time.perf_counter()
        corpus.gen_zipf_pages(spark, args.docs, vocab_size=args.vocab) \
            .write.mode("overwrite").parquet(pages_dir)
        out["corpus_gen_sec"] = round(time.perf_counter() - t0, 1)

        build_t0 = time.perf_counter()
        pages = spark.read.parquet(pages_dir)
        t0 = time.perf_counter()
        ranked = assign_doc_ids(pages.select("url", "html", "lang"),
                                num_partitions=2 * args.cores,
                                assume_unique=True)
        stages["ids_range_shuffle"] = round(time.perf_counter() - t0, 1)
        docs = ranked.select("doc_id", "url",
                             extract_text("html").alias("text"), "lang")
        t0 = time.perf_counter()
        # build_index(cache=True) materializes the ONE corpus scan
        # (extract + tokenize + tf) into the persist at the stats action
        idx = B.build_index(docs, cfg, cache=True)
        stages["extract_tokenize_tf_scan"] = round(time.perf_counter() - t0, 1)
        B.write_index(idx, idx_dir, timings=stages)
        idx.unpersist()
        build_sec = round(time.perf_counter() - build_t0, 1)
        out["build_sec"] = build_sec
        out["n_docs"] = idx.n_docs
        out["docs_per_sec"] = round(idx.n_docs / build_sec, 1)
        out["stages"] = stages
        out["peak_rss_gb"] = _peak_rss_gb()

        # ---- shard balance + head-term spread (the skew evidence) --------
        post = spark.read.parquet(f"{idx_dir}/postings")
        rows = (post.groupBy("shard")
                .agg(F.sum(F.length("doc_deltas") + F.length("tfs"))
                     .alias("bytes"),
                     F.count("*").alias("blocks"))
                .collect())
        sizes = sorted(r["bytes"] for r in rows)
        out["shards"] = len(sizes)
        out["shard_bytes"] = {
            "min": sizes[0], "p50": sizes[len(sizes) // 2],
            "p95": sizes[int(len(sizes) * 0.95)], "max": sizes[-1],
            "max_over_p50": round(sizes[-1] / sizes[len(sizes) // 2], 3),
        }
        head = (spark.read.parquet(f"{idx_dir}/term_stats")
                .orderBy(F.desc("df")).limit(3).collect())
        out["head_terms"] = [
            {"term": r["term"], "df": r["df"]} for r in head
        ]
        ht = head[0]["term"]
        spread = (post.where(F.col("term") == ht)
                  .groupBy("shard").agg(F.count("*").alias("blocks"))
                  .agg(F.count("*"), F.max("blocks")).first())
        out["head_term_shards"] = int(spread[0])     # shards it spans
        out["head_term_max_blocks_per_shard"] = int(spread[1])

        # ---- serving latencies over the 5M-doc index ---------------------
        t0 = time.perf_counter()
        B.write_fuzzy_index(spark, idx_dir, max_dist=1)
        out["fuzzy_replica_build_sec"] = round(time.perf_counter() - t0, 1)
        qs = [(1, ["the", "term0003"], "disjunctive", 10),
              (2, ["term0001", "term0010"], "conjunctive", 10),
              (3, ["of", "and"], "disjunctive", 10)]
        pq = [(1, "term00", 10), (2, "solo", 5)]
        fq = [(1, "term001", 1, 10), (2, "term077", 1, 10)]
        lat: dict[str, float] = {}
        servers = {}
        for tag, kw in (("eager", {}), ("lazy", {"stats_mode": "lazy"})):
            t0 = time.perf_counter()
            srv = IndexServer(idx_dir, cfg, **kw)
            srv._snap()  # replica load (eager: full stats dict; lazy: none)
            lat[f"open_{tag}"] = round(time.perf_counter() - t0, 3)
            servers[tag] = srv
        for tag, srv in servers.items():
            runs = {
                f"query_{tag}": lambda s=srv: s.query_batch(qs),
                f"prefix_{tag}": lambda s=srv: s.prefix_topk_batch(
                    pq, max_expansions=8),
                f"fuzzy_{tag}": lambda s=srv: s.fuzzy_topk_batch(
                    fq, max_expansions=8),
            }
            for fn in runs.values():
                fn()  # warm
            for name, fn in runs.items():
                best = min(
                    (lambda t=time.perf_counter(): (fn(),
                                                    time.perf_counter() - t)
                     )()[1]
                    for _ in range(3)
                )
                lat[name] = round(best, 4)
        out["serving_sec"] = lat

        # ---- serving fan-out: head-term batch vs slice count --------------
        # (round-8 verdict #3) N slice-owner servers in SEPARATE PROCESSES,
        # each owning a contiguous doc-range shard slice; wall-clock is the
        # slowest slice (+ merge), and merge_topk must reproduce the
        # single-process rows exactly. This is the case slicing exists for:
        # the head-term batch costs seconds in one process.
        import multiprocessing as _mp

        import pyarrow.dataset as _ds

        from bloqsenjin_spark.operators.serving import merge_topk

        head_q = [(1, ["the", "of"], "disjunctive", 10),
                  (2, ["the"], "disjunctive", 10),
                  (3, ["of", "and"], "disjunctive", 10)]
        # derive from the build cfg — slice servers MUST share geometry
        cfg_kw = dict(docs_per_shard=cfg.docs_per_shard,
                      block_docs=cfg.block_docs)
        single_rows, single_best = _fanout_worker(
            (idx_dir, cfg_kw, None, head_q))
        tbl = _ds.dataset(f"{idx_dir}/doc_lens", format="parquet",
                          partitioning="hive").to_table(columns=["shard"])
        all_shards = sorted({int(s.as_py()) for s in tbl["shard"]})
        fan: dict = {"queries": len(head_q),
                     "single_process_sec": round(single_best, 3),
                     "shards": len(all_shards)}
        ctx = _mp.get_context("spawn")
        for n in (2, 4, 8):
            size = (len(all_shards) + n - 1) // n
            slices = [all_shards[i * size:(i + 1) * size] for i in range(n)]
            t_wall = time.perf_counter()
            with ctx.Pool(n) as pool:
                parts = pool.map(
                    _fanout_worker,
                    [(idx_dir, cfg_kw, sl, head_q) for sl in slices])
            wall = time.perf_counter() - t_wall
            t_m = time.perf_counter()
            merged = merge_topk([p[0] for p in parts], head_q)
            merge_sec = time.perf_counter() - t_m
            assert merged == single_rows, "slice merge diverged!"
            fan[f"slices_{n}"] = {
                "max_slice_sec": round(max(p[1] for p in parts), 3),
                "merge_sec": round(merge_sec, 4),
                "wall_incl_open_sec": round(wall, 1),
                "speedup_vs_single": round(
                    single_best / max(p[1] for p in parts), 2),
            }
        fan["merged_identical"] = True
        out["serving_fanout"] = fan

        # ---- IVF ANN stress (round-8 verdict #4) ---------------------------
        if args.ann_vectors > 0:
            from bloqsenjin_spark.operators import similarity
            from bloqsenjin_spark.operators.serving import IndexServer

            emb_dir = f"{root}/embeddings"
            t0 = time.perf_counter()
            corpus.gen_embeddings(spark, args.ann_vectors, dim=args.ann_dim) \
                .write.mode("overwrite").parquet(emb_dir)
            ann: dict = {"n_vectors": args.ann_vectors, "dim": args.ann_dim,
                         "gen_sec": round(time.perf_counter() - t0, 1)}
            emb = spark.read.parquet(emb_dir)
            t0 = time.perf_counter()
            cents = similarity.write_ivf(emb, idx_dir)  # auto ≈√N cells
            ann["n_cells"] = int(len(cents))
            ann["write_ivf_sec"] = round(time.perf_counter() - t0, 1)
            qids = [i * 317 for i in range(16)]
            t0 = time.perf_counter()
            brute = similarity.cosine_topk(emb, qids, k=10).collect()
            ann["brute_16q_sec"] = round(time.perf_counter() - t0, 1)
            bset: dict = {}
            for r in brute:
                bset.setdefault(r["query_id"], set()).add(r["vec_id"])
            srv = IndexServer(idx_dir, cfg)
            for n_probe in (1, 4, 16, 64):
                t0 = time.perf_counter()
                got = srv.ann_batch(qids, k=10, n_probe=n_probe)
                probe_sec = time.perf_counter() - t0
                gset: dict = {}
                for qid, _rank, vid, _s in got:
                    gset.setdefault(qid, set()).add(vid)
                hits = sum(len(bset[q] & gset.get(q, set())) for q in bset)
                total = sum(len(v) for v in bset.values())
                ann[f"probe_{n_probe}"] = {
                    "batch_sec": round(probe_sec, 3),
                    "recall_at_10": round(hits / total, 3),
                }
            out["ann_stress"] = ann
        out["peak_rss_gb_final"] = _peak_rss_gb()
    finally:
        if not args.keep_dir:
            shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
