"""DuckDB oracle SQL generators.

Every SQL string here must be semantically identical to the matching Spark
operator (same tokenizer regex, same BM25 closed form from functions/bm25.py,
same dedup/tie-break policies). Scores are rounded to
config.SCORE_ROUND_DECIMALS on BOTH sides purely for the driver's value-hash
comparison — ranking itself always uses unrounded doubles.
"""

from __future__ import annotations

from bloqsenjin_spark.config import SCORE_ROUND_DECIMALS
from bloqsenjin_spark.functions.bm25 import idf_sql, tf_component_sql
from bloqsenjin_spark.functions.text import DUCKDB_TOKENS_SQL


def _queries_values(queries: list[tuple[int, list[str], str, int]]) -> str:
    rows = []
    for qid, terms, mode, k in queries:
        uniq = sorted(set(terms))
        lit = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in uniq) + "]"
        rows.append(f"({qid}, {lit}, '{mode}', {k})")
    return ",\n        ".join(rows)


def bm25_topk_sql(
    queries: list[tuple[int, list[str], str, int]],
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Full BM25 top-k over the given literal query set, on DuckDB."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    return f"""
WITH q(query_id, terms, mode, k) AS (VALUES
        {_queries_values(queries)}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qt AS (
    SELECT query_id, mode, k, len(terms) AS n_terms, unnest(terms) AS term
    FROM q
),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.mode, qt.k, qt.n_terms,
           {idf} * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, mode, k, n_terms,
           sum(contrib) AS score, count(*) AS nm
    FROM contrib
    GROUP BY query_id, doc_id, mode, k, n_terms
    HAVING (mode = 'disjunctive' OR count(*) = n_terms)
),
ranked AS (
    SELECT query_id, doc_id, score, k,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def term_stats_sql(doc_table: str = "documents", text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    idf = idf_sql("df", "(SELECT count(*)::DOUBLE FROM " + doc_table + ")")
    return f"""
WITH tok AS (
    SELECT {id_col} AS doc_id, unnest({toks}) AS term FROM {doc_table}
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term, count(*) AS df, sum(tf) AS cf,
       round({idf}, {SCORE_ROUND_DECIMALS}) AS idf
FROM tf GROUP BY term
""".strip()


def corpus_stats_sql(doc_table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    return f"""
WITH dl AS (SELECT {id_col} AS doc_id, len({toks}) AS dl FROM {doc_table})
SELECT count(*) AS n_docs, round(avg(dl), {SCORE_ROUND_DECIMALS}) AS avgdl,
       sum(dl) AS n_tokens
FROM dl
""".strip()


def doc_lengths_sql(doc_table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    return f"SELECT {id_col} AS doc_id, len({toks}) AS dl FROM {doc_table}"
