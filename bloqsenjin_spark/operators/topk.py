"""M1: brute-force BM25 top-k — entirely built-in DataFrame operators.

This is both the minimum end-to-end slice (SURVEY.md §7.1) and the permanent
correctness oracle for the index-backed engine (operators/wand.py must be
rank-identical to this on every query set).

Plan shape (all Catalyst, no UDF):
  tokens (split+filter, codegen) → explode → groupBy(term, doc_id) [partial
  agg map-side] → broadcast-join the query terms (tiny) → join term stats
  (broadcast, semi-joined to query terms first) → per-(query,doc) fold of
  term contributions in sorted term order (deterministic double summation)
  → window top-k with (score DESC, doc_id ASC) tie-break.

Reference parity: conjunctive = posting-list intersection is the semi-join
family (/root/reference/internal/models/preferences.go:300-309); disjunctive =
union is the OR-folded permission-mask family
(/root/reference/pkg/auth/http/log.go:170-196); the groupBy df-count is the
follower-count view (/root/reference/internal/models/profile.go:103-117).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bloqsenjin_spark.functions import bm25
from bloqsenjin_spark.functions.text import tokens


def tokenized(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """docs → (doc_id, tokens array<string>, dl long). Empty/null text → dl=0."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("tokens"),
    ).withColumn("dl", F.size("tokens").cast("long"))


def term_freqs(tok: DataFrame) -> DataFrame:
    """(doc_id, term, tf). One shuffle; map-side partial count via hash agg."""
    return (
        tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def corpus_stats_df(tok: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl, n_tokens). Exact — rank-identity forbids
    approx (SURVEY.md §2.4 A8). Empty docs count toward N and avgdl with dl=0
    (policy pinned in FIXTURES.md §3)."""
    return tok.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("n_tokens"),
    )


def term_stats_df(tf: DataFrame, n_docs: int) -> DataFrame:
    """(term, df, cf, idf) — exact document frequency per term."""
    return tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).withColumn("idf", bm25.idf_col(F.col("df"), n_docs))


def query_terms(queries: DataFrame) -> DataFrame:
    """Explode query term arrays; dedupe (pinned policy: unique-term bag)."""
    return queries.select(
        "query_id", "mode", "k",
        F.size(F.array_distinct("terms")).alias("n_terms"),
        F.explode(F.array_distinct("terms")).alias("term"),
    )


def bm25_brute_force(docs: DataFrame, queries: DataFrame) -> DataFrame:
    """→ TOPK_RESULT (query_id, rank, doc_id, score).

    Zero-hit queries produce no rows; conjunctive queries containing a term
    absent from the corpus produce no rows (intersection with ∅).
    """
    tok = tokenized(docs)
    tf = term_freqs(tok)
    n_docs, avgdl = tok.agg(F.count("*"), F.avg("dl")).first()
    avgdl = float(avgdl or 0.0) or 1.0  # all-empty corpus guard

    qt = query_terms(queries)
    # semi-join stats down to query terms, then broadcast both small sides
    stats = term_stats_df(tf, int(n_docs)).join(
        qt.select("term").distinct(), "term", "left_semi"
    )

    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(stats.select("term", "idf")), "term")
        .join(tok.select("doc_id", "dl"), "doc_id")
        .withColumn(
            "contrib",
            F.col("idf") * bm25.tf_component_col(F.col("tf"), F.col("dl"), avgdl),
        )
    )

    # Deterministic double summation: fold contributions in sorted term order.
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
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )
