"""Corpus loading: driver testdata → the ``pages`` shape, plus the reference
query set and a deterministic synthetic corpus generator for skew/scale tests.

``pages(url, warc_ts, html, text, lang)`` is authoritative
(BASELINE.json:15). The driver's ``documents.parquet`` stands in at small
scale (FIXTURES.md §1): url := 'doc://{source}/{doc_id}', warc_ts synthesized
from doc_id, html := encode(text) so the extraction invariant round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages. Deterministic, no data invented."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"), F.col("doc_id")).alias("url"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synth_pages(spark: SparkSession, sf_dir: str, replication: int) -> DataFrame:
    """Deterministic corpus enlargement for bench/scale runs: each source doc
    is replicated ``replication`` times with a copy-index baked into the url
    (and a copy-specific rare token appended so replicas aren't pure dups).
    Seeded by construction — no randomness, no external data.
    """
    # the base parquet is a single small file → 1 input partition; without a
    # repartition the whole replicated corpus would be generated (and range-
    # sampled) by one task, serializing every downstream stage
    par = spark.sparkContext.defaultParallelism * 2
    d = load_table(spark, sf_dir, "documents").repartition(par)
    copies = spark.range(replication).withColumnRenamed("id", "copy")
    return (
        d.crossJoin(F.broadcast(copies))
        .select(
            F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                     F.col("doc_id"), F.lit("#"), F.col("copy")).alias("url"),
            (F.to_timestamp(F.lit("2026-01-01 00:00:00"))
             + F.make_interval(secs=(F.col("doc_id") + F.col("copy")).cast("double"))).alias("warc_ts"),
            F.encode(
                F.concat(F.col("text"), F.lit(" copytok"), F.col("copy") % 1000),
                "utf-8",
            ).alias("html"),
            F.concat(F.col("text"), F.lit(" copytok"), F.col("copy") % 1000).alias("text"),
            F.col("lang"),
        )
    )


def gen_zipf_pages(spark: SparkSession, n_docs: int, vocab_size: int = 10_000,
                   seed: int = 42) -> DataFrame:
    """FIXTURES.md §1 synthetic corpus: Zipf(s≈1.1) vocabulary with planted
    head terms ('the' >50% of docs, 'of', 'and'), log-normal doc lengths,
    empty docs (doc_id % 997 == 0), one single-repeated-term doc (id 17), and
    5% of pages wrapped in noisy html (script blocks, comments, entity-coded
    spaces) that must still extract byte-identically.

    Fully distributed + deterministic: each doc's stream comes from a
    counter-based Philox generator keyed (seed, doc_id) — independent of
    partitioning, so the corpus is identical at any parallelism.
    """
    import numpy as np
    import pandas as pd

    def gen(batches):
        # Zipf pmf over ranks 1..V (s=1.1), precomputed once per worker
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        pmf = ranks ** -1.1
        pmf /= pmf.sum()
        cdf = np.cumsum(pmf)
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                doc_id = int(doc_id)
                rng = np.random.Generator(np.random.Philox(key=[seed, doc_id]))
                if doc_id % 997 == 0:
                    text = ""
                elif doc_id == 17:
                    text = " ".join(["solo"] * 40)
                else:
                    dl = max(1, int(rng.lognormal(mean=4.4, sigma=0.6)))
                    idx = np.searchsorted(cdf, rng.random(dl))
                    words = [f"term{i:04d}" for i in idx]
                    # planted head terms
                    if rng.random() < 0.55:
                        words.insert(int(rng.integers(0, len(words) + 1)), "the")
                    if rng.random() < 0.40:
                        words.insert(int(rng.integers(0, len(words) + 1)), "of")
                    if rng.random() < 0.30:
                        words.insert(int(rng.integers(0, len(words) + 1)), "and")
                    text = " ".join(words)
                if doc_id % 20 == 3 and text:
                    # noisy html that still extracts to `text` byte-identically:
                    # script/comment stripped, &#32; decodes to the join space
                    mid = len(text) // 2
                    sp = text.rfind(" ", 0, mid)
                    if sp > 0:
                        html = (
                            "<html><!-- c --><body><p>" + text[:sp]
                            + "<script>var x='<p>';</script>&#32;"
                            + text[sp + 1:] + "</p></body></html>"
                        )
                    else:
                        html = f"<html><body><p>{text}</p></body></html>"
                else:
                    html = f"<html><body><p>{text}</p></body></html>" if text else "<html><body></body></html>"
                rows.append((f"https://site{doc_id % 997}.example/p/{doc_id}", html.encode(), text))
            out = pd.DataFrame(rows, columns=["url", "html", "text"])
            out["lang"] = "en"
            yield out

    return (
        spark.range(n_docs)
        .repartition(max(8, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="url string, html binary, text string, lang string")
        .withColumn("warc_ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
        .select("url", "warc_ts", "html", "text", "lang")
    )


def gen_embeddings(spark: SparkSession, n_vecs: int, dim: int = 64,
                   clusters: int = 256, seed: int = 7) -> DataFrame:
    """Synthetic clustered embedding corpus for ANN scale runs →
    (vec_id long, embedding array<float>): vector = unit cluster center
    (vec_id % clusters) + Gaussian noise of expected NORM ≈ 0.5 (σ scaled
    by 1/√dim — per-dim σ would make the noise norm ≈ σ√dim dominate the
    unit center and the corpus near-isotropic). Clustered — not
    isotropic — so IVF recall measurements are meaningful. Fully
    distributed + deterministic: centers AND noise come from counter-based
    Philox streams keyed (seed, cluster) / (seed, vec_id), independent of
    partitioning, like gen_zipf_pages."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        centers = np.stack([
            np.random.Generator(
                np.random.Philox(key=[seed, 1 << 40 | c])
            ).standard_normal(dim)
            for c in range(clusters)
        ])
        centers /= np.linalg.norm(centers, axis=1, keepdims=True) + 1e-12
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for vid in ids:
                rng = np.random.Generator(
                    np.random.Philox(key=[seed, int(vid)]))
                v = (centers[int(vid) % clusters]
                     + (0.5 / dim ** 0.5) * rng.standard_normal(dim))
                vecs.append(v.astype(np.float32))
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n_vecs)
        .repartition(max(8, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="vec_id long, embedding array<float>")
    )


# ---- reference query set (FIXTURES.md §2) ------------------------------------
# Fixed literals: head terms, mid terms, the rare term 'dup', absent terms
# (zero-hit), duplicate terms (policy: query terms are DEDUPED before scoring
# — bag-of-words with unique terms; pinned here and in the oracle SQL).
REFERENCE_QUERIES: list[tuple[int, list[str], str, int]] = [
    (1, ["spark"], "disjunctive", 10),
    (2, ["the", "fast"], "disjunctive", 10),
    (3, ["join", "hash", "row"], "conjunctive", 10),
    (4, ["customer", "order"], "conjunctive", 100),
    (5, ["dup"], "disjunctive", 100),
    (6, ["zebra"], "disjunctive", 10),
    (7, ["stream", "window", "agg", "group"], "disjunctive", 25),
    (8, ["query", "query", "fast"], "disjunctive", 10),
    (9, ["a", "the"], "conjunctive", 50),
    (10, ["vector", "zebra"], "conjunctive", 10),
    (11, ["merge", "sort", "slow"], "disjunctive", 1),
    (12, ["big", "data"], "conjunctive", 10),
]


def reference_queries(spark: SparkSession) -> DataFrame:
    from bloqsenjin_spark import schemas

    rows = [(q, sorted(set(t)), m, k) for q, t, m, k in REFERENCE_QUERIES]
    return spark.createDataFrame(rows, schema=schemas.QUERIES)
