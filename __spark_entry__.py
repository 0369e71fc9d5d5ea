"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine package: ``bloqsenjin_spark`` (see SURVEY.md §7).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloqsenjin_spark import corpus, oracle
from bloqsenjin_spark.config import SCORE_ROUND_DECIMALS, IndexConfig
from bloqsenjin_spark.operators import topk, wand
from bloqsenjin_spark.operators.postings import decode_postings
from bloqsenjin_spark.plans.build import build_index

_R = SCORE_ROUND_DECIMALS
# small shard/block sizes so sf0.01 (500 docs) exercises multi-shard paths
_SF_CFG = IndexConfig(docs_per_shard=128, block_docs=16)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.load_table(spark, sf_dir, "documents")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the reference query set at sf0.001."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    qs = corpus.reference_queries(spark)
    return topk.bm25_brute_force(docs, qs)


# ---- query implementations ---------------------------------------------------

def _q_bm25_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = topk.bm25_brute_force(_docs(spark, sf_dir), corpus.reference_queries(spark))
    return res.withColumn("score", F.round("score", _R))


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = topk.tokenized(_docs(spark, sf_dir))
    n_docs = tok.count()
    ts = topk.term_stats_df(topk.term_freqs(tok), n_docs)
    return ts.withColumn("idf", F.round("idf", _R))


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = topk.corpus_stats_df(topk.tokenized(_docs(spark, sf_dir)))
    return cs.withColumn("avgdl", F.round("avgdl", _R))


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.tokenized(_docs(spark, sf_dir)).select("doc_id", "dl")


def _q_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed engine (build postings → block-max top-k); oracle is the
    SAME SQL as the brute-force path — rank identity checked by the driver."""
    idx = build_index(_docs(spark, sf_dir), _SF_CFG)
    res = wand.bm25_wand_topk(
        idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
        corpus.REFERENCE_QUERIES, _SF_CFG,
    )
    return res.withColumn("score", F.round("score", _R))


def _q_postings_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed index decodes back to the exact (term, doc_id, tf) relation."""
    idx = build_index(_docs(spark, sf_dir), _SF_CFG)
    return decode_postings(idx.postings, _SF_CFG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk_brute": _q_bm25_brute,
        "bm25_topk_wand": _q_bm25_wand,
        "postings_roundtrip": _q_postings_roundtrip,
        "term_stats": _q_term_stats,
        "corpus_stats": _q_corpus_stats,
        "doc_lengths": _q_doc_lengths,
    }


def oracle_sql() -> dict[str, str]:
    toks = oracle.DUCKDB_TOKENS_SQL.format(col="text")
    return {
        "bm25_topk_brute": oracle.bm25_topk_sql(corpus.REFERENCE_QUERIES),
        "bm25_topk_wand": oracle.bm25_topk_sql(corpus.REFERENCE_QUERIES),
        "postings_roundtrip": (
            "WITH tok AS (SELECT doc_id, unnest(" + toks + ") AS term FROM documents) "
            "SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id"
        ),
        "term_stats": oracle.term_stats_sql(),
        "corpus_stats": oracle.corpus_stats_sql(),
        "doc_lengths": oracle.doc_lengths_sql(),
    }
