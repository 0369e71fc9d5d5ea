"""More-Like-This: rank documents similar to a SEED document.

Lucene's MoreLikeThis shape (build a representative term query from the
seed's content, then run it as an ordinary disjunction), with one
deliberate deviation pinned for engine-neutral verification: Lucene
selects terms by float tf·idf; here the selection key is the
INTEGER-EXACT triple

    (tf in seed DESC, df ASC, term ASC)

— monotone in the same signals (frequent in the seed = representative,
rare in the corpus = informative) but bit-portable across Spark, NumPy
and DuckDB, so the driver can value-check the WHOLE pipeline including
term selection (oracle.mlt_topk_sql re-derives it independently).

The seed itself never appears in the results: ranking runs at depth k+1
and seed rows are dropped with ranks renumbered — exact, because
removing one candidate can only promote the rest (every top-k winner
excluding the seed is inside the top-(k+1) including it).

No reference analog (the reference has no text search); this is the
standard recommendation form over an inverted index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloqsenjin_spark.config import DEFAULT_CONFIG, IndexConfig


def mlt_select_terms(
    docs: DataFrame,
    term_stats: DataFrame,
    mlt_queries: list[tuple[int, int, int]],
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[int, list[str]]:
    """→ {query_id: [terms]} — each seed's representative terms under THE
    selection rule (tf DESC, df ASC, term ASC; tf ≥ min_term_freq, df ≥
    min_doc_freq, capped at max_query_terms). ONE job: the seed scan is
    doc_id-pushdown-pruned, tf is a per-seed explode/count over ≤ |seeds|
    docs, and the df join touches only the seeds' own terms. The collect
    is bounded by seeds × max_query_terms."""
    from bloqsenjin_spark.operators import topk

    if len({q[0] for q in mlt_queries}) != len(mlt_queries):
        raise ValueError("duplicate query_ids in mlt_queries")
    spark = docs.sparkSession
    seeds = spark.createDataFrame(
        [(int(qid), int(seed)) for qid, seed, _k in mlt_queries],
        "query_id long, seed long",
    )
    tok = topk.tokenized(
        docs.where(F.col(id_col).isin([int(s) for _q, s, _k in mlt_queries])),
        text_col=text_col, id_col=id_col,
    )
    tf = (
        tok.join(F.broadcast(seeds), tok["doc_id"] == seeds["seed"])
        .select("query_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("tf"))
        .where(F.col("tf") >= int(min_term_freq))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term"))
    rows = (
        tf.join(term_stats.select("term", "df"), "term")
        .where(F.col("df") >= int(min_doc_freq))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(max_query_terms))
        .select("query_id", "term", "rn")
        .collect()
    )
    sel: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rn"])):
        sel.setdefault(int(r["query_id"]), []).append(r["term"])
    return sel


def more_like_this_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    docs: DataFrame,
    mlt_queries: list[tuple[int, int, int]],
    cfg: IndexConfig = DEFAULT_CONFIG,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    tomb_map: "DataFrame | None" = None,
    allow_map: "DataFrame | None" = None,
) -> DataFrame:
    """→ (query_id, rank, doc_id, score): docs most similar to each seed —
    ``(query_id, seed_doc_id, k)`` — the seed's representative terms
    (mlt_select_terms) run as ONE ordinary disjunctive BM25 batch at depth
    k+1, the seed is dropped, ranks renumber. Result volume is tiny
    (≤ (k+1) rows per query), so the renumbering window is free."""
    from bloqsenjin_spark.operators import wand

    sel = mlt_select_terms(
        docs, term_stats, mlt_queries, max_query_terms=max_query_terms,
        min_term_freq=min_term_freq, min_doc_freq=min_doc_freq,
    )
    queries = [
        (int(qid), sel[int(qid)], "disjunctive", int(k) + 1)
        for qid, _s, k in mlt_queries
        if sel.get(int(qid))
    ]
    if not queries:
        return postings.sparkSession.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    res = wand.bm25_wand_topk(
        postings, doc_lens, term_stats, avgdl, queries, cfg,
        tomb_map=tomb_map, allow_map=allow_map,
    )
    seed_map = F.create_map(
        *[x for q in mlt_queries
          for x in (F.lit(int(q[0])), F.lit(int(q[1])))]
    )
    kmap = F.create_map(
        *[x for q in mlt_queries
          for x in (F.lit(int(q[0])), F.lit(int(q[2])))]
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("rank"))
    return (
        res.where(F.col("doc_id") != seed_map[F.col("query_id")])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= kmap[F.col("query_id")])
        .select("query_id", "rank", "doc_id", "score")
    )
