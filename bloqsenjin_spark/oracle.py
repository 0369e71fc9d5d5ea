"""DuckDB oracle SQL generators.

Every SQL string here must be semantically identical to the matching Spark
operator (same tokenizer regex, same BM25 closed form from functions/bm25.py,
same dedup/tie-break policies). Scores are rounded to
config.SCORE_ROUND_DECIMALS on BOTH sides purely for the driver's value-hash
comparison — ranking itself always uses unrounded doubles.
"""

from __future__ import annotations

from bloqsenjin_spark.config import SCORE_ROUND_DECIMALS, TOKEN_SPLIT_REGEX
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
    round_score: bool = True,
    filter_pred: str | None = None,
    must_not: "dict[int, list[str]] | None" = None,
) -> str:
    """Full BM25 top-k over the given literal query set, on DuckDB.
    ``round_score=False`` keeps raw doubles — needed when a caller re-ranks
    on the score (rounding before a rank would change tie-breaks).
    ``filter_pred``: optional SQL predicate over ``doc_table`` restricting
    RANK ELIGIBILITY only — stats (N, avgdl, df) stay full-corpus, matching
    the engine's bm25_topk_filtered faceted-search contract.
    ``must_not``: query_id → negative terms; docs containing ANY of them are
    excluded from that query's ranking (the engine's 5-tuple MUST_NOT)."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    score_out = (
        f"round(score, {SCORE_ROUND_DECIMALS})" if round_score else "score"
    )
    flt = (
        f"JOIN (SELECT {id_col} AS doc_id FROM {doc_table} "
        f"WHERE {filter_pred}) flt USING (doc_id)"
        if filter_pred else ""
    )
    neg_cte, neg_join = "", ""
    if must_not:
        neg_rows = ", ".join(
            "({}, '{}')".format(qid, t.replace("'", "''"))
            for qid, ts_ in must_not.items() for t in ts_
        )
        neg_cte = (
            f"qn(query_id, term) AS (VALUES {neg_rows}),\n"
            "excl AS (SELECT DISTINCT qn.query_id, tf.doc_id "
            "FROM qn JOIN tf USING (term)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
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
{neg_cte}qt AS (
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
    FROM scored {flt} {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       {score_out} AS score
FROM ranked WHERE rank <= k
""".strip()


def match_counts_sql(
    queries: list[tuple[int, list[str], str, int]],
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    must_not: "dict[int, list[str]] | None" = None,
) -> str:
    """Oracle for match_counts: count of docs satisfying each query's
    conjunctive/disjunctive (and MUST_NOT) semantics; zero-hit queries
    report 0."""
    # unbounded k: counts need every match, not a top-k truncation
    unb = [(qid, terms, mode, 1 << 30) for qid, terms, mode, _k in queries]
    base = bm25_topk_sql(unb, doc_table, text_col, id_col,
                         must_not=must_not)
    qvals = ", ".join(f"({qid})" for qid, _t, _m, _k in queries)
    return f"""
WITH hits AS ({base}),
qs(query_id) AS (VALUES {qvals})
SELECT qs.query_id, count(hits.doc_id)::BIGINT AS n_hits
FROM qs LEFT JOIN hits USING (query_id)
GROUP BY qs.query_id
""".strip()


def facet_counts_sql(
    queries: list[tuple[int, list[str], str, int]],
    facet_col: str,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    must_not: "dict[int, list[str]] | None" = None,
) -> str:
    """Oracle for wand.facet_counts: each query's match set (same
    conjunctive/disjunctive/MUST_NOT semantics as the ranking oracle,
    unbounded k) grouped by the docs' facet column — NULL values under the
    '(missing)' bucket, zero buckets omitted."""
    unb = [(qid, terms, mode, 1 << 30) for qid, terms, mode, _k in queries]
    base = bm25_topk_sql(unb, doc_table, text_col, id_col,
                         must_not=must_not)
    return f"""
WITH hits AS ({base}),
fx AS (SELECT {id_col} AS doc_id,
              coalesce({facet_col}, '(missing)') AS facet
       FROM {doc_table})
SELECT hits.query_id, fx.facet, count(*)::BIGINT AS n_hits
FROM hits JOIN fx USING (doc_id)
GROUP BY hits.query_id, fx.facet
""".strip()


def topk_highlights_sql(
    queries: list[tuple[int, list[str], str, int]],
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for topk_highlights: the top-k ranking joined with every
    (query term, token position) occurrence in the ranked docs — positions
    from unnest + generate_subscripts over the SAME tokenizer."""
    base = bm25_topk_sql(queries, doc_table, text_col, id_col)
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    qt_rows = ", ".join(
        "({}, '{}')".format(qid, t.replace("'", "''"))
        for qid, terms, _m, _k in queries for t in sorted(set(terms))
    )
    return f"""
WITH topk AS ({base}),
qt(query_id, term) AS (VALUES {qt_rows}),
dtok AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}),
tokpos AS (
    SELECT doc_id, unnest(toks) AS term,
           (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
    FROM dtok
)
SELECT t.query_id, t.rank, t.doc_id, tp.term, tp.pos
FROM topk t
JOIN qt ON qt.query_id = t.query_id
JOIN tokpos tp ON tp.doc_id = t.doc_id AND tp.term = qt.term
""".strip()


def topk_snippets_sql(
    queries: list[tuple[int, list[str], str, int]],
    window: int = 8,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for topk_snippets: min query-term position per ranked (query,
    doc) from the tokenized stream, then a ``window``-token slice of the same
    stream joined back onto the ranking."""
    base = bm25_topk_sql(queries, doc_table, text_col, id_col,
                         round_score=False)
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    qt_rows = ", ".join(
        "({}, '{}')".format(qid, t.replace("'", "''"))
        for qid, terms, _m, _k in queries for t in sorted(set(terms))
    )
    return f"""
WITH topk AS ({base}),
qt(query_id, term) AS (VALUES {qt_rows}),
dtok AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}),
tokpos AS (
    SELECT doc_id, unnest(toks) AS term,
           (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
    FROM dtok
),
best AS (
    SELECT t.query_id, t.doc_id, min(tp.pos) AS snip_pos
    FROM topk t
    JOIN qt ON qt.query_id = t.query_id
    JOIN tokpos tp ON tp.doc_id = t.doc_id AND tp.term = qt.term
    GROUP BY t.query_id, t.doc_id
)
SELECT t.query_id, t.rank, t.doc_id,
       round(t.score, {SCORE_ROUND_DECIMALS}) AS score, b.snip_pos,
       array_to_string(
           list_slice(d.toks, (b.snip_pos + 1)::INT,
                      (b.snip_pos + {window})::INT), ' ') AS snippet
FROM topk t
JOIN best b ON b.query_id = t.query_id AND b.doc_id = t.doc_id
JOIN dtok d ON d.doc_id = t.doc_id
""".strip()


def prefix_topk_sql(
    prefix_queries: list[tuple[int, str, int]],
    max_expansions: int = 100,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for prefix_bm25_topk: the SAME expansion rule computed in SQL —
    vocabulary terms LIKE prefix%, capped at max_expansions by df DESC,
    term ASC — then disjunctive BM25 with full-corpus stats."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = ", ".join(
        "({}, '{}', {})".format(qid, p.replace("'", "''"), k)
        for qid, p, k in prefix_queries
    )
    return f"""
WITH q(query_id, prefix, k) AS (VALUES {rows}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
exp AS (
    SELECT q.query_id, q.k, ts.term,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY ts.df DESC, ts.term ASC) AS rn
    FROM q JOIN ts ON ts.term LIKE q.prefix || '%'
),
qt AS (SELECT query_id, k, term FROM exp WHERE rn <= {max_expansions}),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, {idf} * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
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


def wildcard_topk_sql(
    wc_queries: list[tuple[int, str, int]],
    max_expansions: int = 100,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for wildcard_bm25_topk: the SAME expansion rule in SQL —
    vocabulary terms matching the pattern's anchored regex (* = .*,
    ? = .; literal prefix as a LIKE prune mirrors the engine's dictionary
    range scan), capped at max_expansions by df DESC / term ASC — then
    disjunctive BM25 with full-corpus stats. The regex translation is
    shared verbatim with the engine (wand.wildcard_parts): normalized
    tokens are [a-z0-9]+, so the pattern body is dialect-portable."""
    from bloqsenjin_spark.operators.wand import wildcard_parts

    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = []
    for qid, p, k in wc_queries:
        pre, rx = wildcard_parts(p)
        rows.append("({}, '{}', '{}', {})".format(
            int(qid), pre.replace("'", "''"), rx.replace("'", "''"), int(k)))
    return f"""
WITH q(query_id, prefix, rx, k) AS (VALUES {', '.join(rows)}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
exp AS (
    SELECT q.query_id, q.k, ts.term,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY ts.df DESC, ts.term ASC) AS rn
    FROM q JOIN ts ON ts.term LIKE q.prefix || '%'
                  AND regexp_matches(ts.term, q.rx)
),
qt AS (SELECT query_id, k, term FROM exp WHERE rn <= {max_expansions}),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, {idf} * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
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


def bm25f_wildcard_topk_sql(
    wc_queries: list[tuple[int, str, int]],
    field_toks: dict[str, str],
    field_weights: dict[str, float],
    max_expansions: int = 100,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fielded.bm25f_wildcard_topk — wildcard expansion × BM25F:
    patterns expand against the cross-field vocabulary (df summed, regex
    over tsx), then each term contributes (idf_field · w_field) · tfc per
    field it occurs in."""
    from bloqsenjin_spark.operators.wand import wildcard_parts

    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = []
    for qid, p, k in wc_queries:
        pre, rx = wildcard_parts(p)
        rows.append("({}, '{}', '{}', {})".format(
            int(qid), pre.replace("'", "''"), rx.replace("'", "''"), int(k)))
    return f"""
WITH q(query_id, prefix, rx, k) AS (VALUES {', '.join(rows)}),
{_fielded_ctes(field_toks, field_weights, toks, id_col, doc_table)},
exp AS (
    SELECT q.query_id, q.k, tsx.term,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY tsx.df DESC, tsx.term ASC) AS rn
    FROM q JOIN tsx ON tsx.term LIKE q.prefix || '%'
                   AND regexp_matches(tsx.term, q.rx)
),
qt AS (SELECT query_id, k, term FROM exp WHERE rn <= {max_expansions}),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k,
           ({idf} * fw.w) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts ON ts.field = tf.field AND ts.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
    JOIN cs ON cs.field = tf.field
    JOIN fw ON fw.field = tf.field
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
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


def mlt_topk_sql(
    mlt_queries: list[tuple[int, int, int]],
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for operators/mlt.more_like_this_topk: the seed's
    representative terms re-derived in SQL under the SAME integer-exact
    selection rule (tf in seed DESC, df ASC, term ASC; tf ≥ min_term_freq,
    df ≥ min_doc_freq, capped), then standard disjunctive BM25 with the
    seed excluded and ranks renumbered (rank over the seed-free set)."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = ", ".join(
        f"({int(qid)}, {int(seed)}, {int(k)})"
        for qid, seed, k in mlt_queries
    )
    return f"""
WITH s(query_id, seed, k) AS (VALUES {rows}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
sel AS (
    SELECT s.query_id, s.k, tf.term,
           row_number() OVER (PARTITION BY s.query_id
                              ORDER BY tf.tf DESC, ts.df ASC,
                                       tf.term ASC) AS rn
    FROM s
    JOIN tf ON tf.doc_id = s.seed
    JOIN ts USING (term)
    WHERE tf.tf >= {int(min_term_freq)} AND ts.df >= {int(min_doc_freq)}
),
qt AS (SELECT query_id, k, term FROM sel WHERE rn <= {int(max_query_terms)}),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, {idf} * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
),
ranked AS (
    SELECT sc.query_id, sc.doc_id, sc.score, sc.k,
           row_number() OVER (PARTITION BY sc.query_id
                              ORDER BY sc.score DESC, sc.doc_id ASC) AS rank
    FROM scored sc
    JOIN s ON s.query_id = sc.query_id
    WHERE sc.doc_id != s.seed
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def bm25f_topk_sql(
    queries: list[tuple[int, list[str], str, int]],
    field_toks: dict[str, str],
    field_weights: dict[str, float],
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fielded search (operators/fielded.bm25f_topk):
    score = Σ_field w_field · BM25_field with per-field df/avgdl/dl.
    ``field_toks`` maps field name → a SQL list expression over ``toks``
    (the full tokenized stream) defining that field's token list — the SAME
    derivation the Spark side uses. Conjunctive = the document-level
    reading (every term in SOME field): HAVING count(DISTINCT term) =
    n_terms over the field-union contributions."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    qrows, neg_rows = [], []
    for q in queries:
        qid, terms, mode, k = q[:4]
        assert mode in ("disjunctive", "conjunctive"), mode
        uniq = sorted(set(terms))
        lit = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in uniq) + "]"
        qrows.append(f"({qid}, {lit}, {int(k)}, '{mode}', {len(uniq)})")
        for t in sorted(set(q[4])) if len(q) > 4 and q[4] else ():
            neg_rows.append("({}, '{}')".format(qid, t.replace("'", "''")))
    # MUST_NOT: a doc is excluded when a neg term occurs in ANY field
    neg_cte, neg_join = "", ""
    if neg_rows:
        neg_cte = (
            f"qn(query_id, term) AS (VALUES {', '.join(neg_rows)}),\n"
            "excl AS (SELECT DISTINCT qn.query_id, tf.doc_id "
            "FROM qn JOIN tf USING (term)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
    ft_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{f}' AS field, {expr} AS ftoks FROM dtok"
        for f, expr in sorted(field_toks.items())
    )
    wrows = ", ".join(
        f"('{f}', {float(field_weights.get(f, 1.0))!r}::DOUBLE)"
        for f in sorted(field_toks)
    )
    return f"""
WITH q(query_id, terms, k, mode, n_terms) AS (VALUES {', '.join(qrows)}),
dtok AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}),
ft AS (
{ft_selects}
),
tok AS (SELECT doc_id, field, unnest(ftoks) AS term FROM ft),
dl AS (SELECT doc_id, field, len(ftoks) AS dl FROM ft),
cs AS (SELECT field, count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl GROUP BY field),
tf AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
ts AS (SELECT field, term, count(*) AS df FROM tf GROUP BY 1, 2),
fw(field, w) AS (VALUES {wrows}),
{neg_cte}qt AS (SELECT query_id, k, mode, n_terms, unnest(terms) AS term FROM q),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, qt.mode, qt.n_terms, qt.term,
           ({idf} * fw.w) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts ON ts.field = tf.field AND ts.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
    JOIN cs ON cs.field = tf.field
    JOIN fw ON fw.field = tf.field
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k, mode, n_terms
    HAVING (mode = 'disjunctive' OR count(DISTINCT term) = n_terms)
),
ranked AS (
    SELECT query_id, doc_id, score, k,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def bm25f_routed_topk_sql(
    rqueries: list,
    field_toks: dict[str, str],
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for per-term field routing (operators/fielded.
    bm25f_routed_topk): ``(qid, [(field, term), ...], mode, k[, negs
    [, boosts]])`` — each clause scores idf_field(term) · w · tfc_field on
    its named field's statistics; conjunctive = every clause matched
    (HAVING count(DISTINCT field ⟂ term) = n_clauses); ``negs`` rows are
    (field | None, term) with None meaning any-field exclusion.
    Independent SQL re-derivation over the per-field CTE block."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    qrows, neg_rows = [], []
    for q in rqueries:
        qid, clauses, mode, k = int(q[0]), q[1], q[2], int(q[3])
        assert mode in ("disjunctive", "conjunctive"), mode
        negs = q[4] if len(q) > 4 and q[4] else ()
        boosts = dict(q[5]) if len(q) > 5 and q[5] else {}
        uniq = sorted({(f, t) for f, t in clauses})
        for f, t in uniq:
            w = float(boosts.get((f, t), 1.0))
            qrows.append(
                f"({qid}, '{f}', '" + t.replace("'", "''")
                + f"', {w!r}::DOUBLE, {k}, '{mode}', {len(uniq)})"
            )
        for nf, nt in negs:
            neg_rows.append(
                f"({qid}, '{nf or ''}', '" + nt.replace("'", "''") + "')"
            )
    neg_cte, neg_join = "", ""
    if neg_rows:
        neg_cte = (
            f"qn(query_id, field, term) AS (VALUES {', '.join(neg_rows)}),\n"
            "excl AS (SELECT DISTINCT qn.query_id, tf.doc_id FROM qn "
            "JOIN tf ON tf.term = qn.term "
            "AND (qn.field = '' OR qn.field = tf.field)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
    ft_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{f}' AS field, {expr} AS ftoks FROM dtok"
        for f, expr in sorted(field_toks.items())
    )
    return f"""
WITH qt(query_id, field, term, w, k, mode, n_clauses) AS (VALUES
        {(',' + chr(10) + '        ').join(qrows)}),
dtok AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}),
ft AS (
{ft_selects}
),
tok AS (SELECT doc_id, field, unnest(ftoks) AS term FROM ft),
dl AS (SELECT doc_id, field, len(ftoks) AS dl FROM ft),
cs AS (SELECT field, count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl GROUP BY field),
tf AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
ts AS (SELECT field, term, count(*) AS df FROM tf GROUP BY 1, 2),
{neg_cte}contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, qt.mode, qt.n_clauses,
           qt.field || chr(0) || qt.term AS clause,
           ({idf} * qt.w) * {tfc} AS contrib
    FROM qt
    JOIN tf ON tf.field = qt.field AND tf.term = qt.term
    JOIN ts ON ts.field = qt.field AND ts.term = qt.term
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = qt.field
    JOIN cs ON cs.field = qt.field
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k, mode, n_clauses
    HAVING (mode = 'disjunctive' OR count(DISTINCT clause) = n_clauses)
),
ranked AS (
    SELECT query_id, doc_id, score, k,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def bm25f_merged_topk_sql(
    queries: list[tuple[int, list[str], str, int]],
    field_toks: dict[str, str],
    field_weights: dict[str, float],
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for TRUE merged-tf BM25F (operators/fielded.bm25f_merged_topk):

        tf̃ = Σ_f w_f · tf_{f,t,d} / (1 − b + b·dl_f/avgdl_f)
        score = Σ_t idf_doc(t) · (k1+1)·tf̃ / (tf̃ + k1)

    Independently re-derived: per-field tf/dl/avgdl CTEs as in the fielded
    oracle, but the weighted normalized tfs are SUMMED FIRST (tfm) and
    saturated once, with idf from whole-document df. Conjunctive = the
    document-level reading: HAVING count(DISTINCT term) = n_terms."""
    from bloqsenjin_spark.config import BM25_B, BM25_K1

    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    k1, b = BM25_K1, BM25_B
    idf = idf_sql("dts.df", "(SELECT count(*) FROM dtok)")
    qrows, neg_rows = [], []
    for q in queries:
        qid, terms, mode, k = q[:4]
        assert mode in ("disjunctive", "conjunctive"), mode
        uniq = sorted(set(terms))
        lit = "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in uniq) + "]"
        qrows.append(f"({qid}, {lit}, {int(k)}, '{mode}', {len(uniq)})")
        for t in sorted(set(q[4])) if len(q) > 4 and q[4] else ():
            neg_rows.append("({}, '{}')".format(qid, t.replace("'", "''")))
    neg_cte, neg_join = "", ""
    if neg_rows:
        neg_cte = (
            f"qn(query_id, term) AS (VALUES {', '.join(neg_rows)}),\n"
            "excl AS (SELECT DISTINCT qn.query_id, tf.doc_id "
            "FROM qn JOIN tf USING (term)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
    ft_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{f}' AS field, {expr} AS ftoks FROM dtok"
        for f, expr in sorted(field_toks.items())
    )
    wrows = ", ".join(
        f"('{f}', {float(field_weights.get(f, 1.0))!r}::DOUBLE)"
        for f in sorted(field_toks)
    )
    return f"""
WITH q(query_id, terms, k, mode, n_terms) AS (VALUES {', '.join(qrows)}),
dtok AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}),
ft AS (
{ft_selects}
),
tok AS (SELECT doc_id, field, unnest(ftoks) AS term FROM ft),
dl AS (SELECT doc_id, field, len(ftoks) AS dl FROM ft),
cs AS (SELECT field, avg(dl) AS avgdl FROM dl GROUP BY field),
tf AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
dtf AS (SELECT term, doc_id FROM (SELECT doc_id, unnest(toks) AS term FROM dtok)
        GROUP BY term, doc_id),
dts AS (SELECT term, count(*) AS df FROM dtf GROUP BY term),
fw(field, w) AS (VALUES {wrows}),
{neg_cte}qt AS (SELECT query_id, k, mode, n_terms, unnest(terms) AS term FROM q),
tfm AS (
    SELECT qt.query_id, tf.doc_id, qt.term, qt.k, qt.mode, qt.n_terms,
           sum(fw.w * tf.tf / ({1.0 - b} + {b} * dl.dl / cs.avgdl)) AS tfm
    FROM qt
    JOIN tf USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
    JOIN cs ON cs.field = tf.field
    JOIN fw ON fw.field = tf.field
    GROUP BY 1, 2, 3, 4, 5, 6
),
contrib AS (
    SELECT tfm.query_id, tfm.doc_id, tfm.k, tfm.mode, tfm.n_terms, tfm.term,
           {idf} * ({k1 + 1.0} * tfm.tfm / (tfm.tfm + {k1})) AS contrib
    FROM tfm JOIN dts ON dts.term = tfm.term
    WHERE tfm.tfm > 0
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k, mode, n_terms
    HAVING (mode = 'disjunctive' OR count(DISTINCT term) = n_terms)
),
ranked AS (
    SELECT query_id, doc_id, score, k,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def _fielded_ctes(field_toks: dict[str, str], field_weights: dict[str, float],
                  toks: str, id_col: str, doc_table: str) -> str:
    """The shared fielded CTE block (per-field tok/dl/cs/tf/ts + weights +
    the cross-field expansion vocabulary tsx = df summed across fields)."""
    ft_selects = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{f}' AS field, {expr} AS ftoks FROM dtok"
        for f, expr in sorted(field_toks.items())
    )
    wrows = ", ".join(
        f"('{f}', {float(field_weights.get(f, 1.0))!r}::DOUBLE)"
        for f in sorted(field_toks)
    )
    return f"""dtok AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}),
ft AS (
{ft_selects}
),
tok AS (SELECT doc_id, field, unnest(ftoks) AS term FROM ft),
dl AS (SELECT doc_id, field, len(ftoks) AS dl FROM ft),
cs AS (SELECT field, count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl GROUP BY field),
tf AS (SELECT field, term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2, 3),
ts AS (SELECT field, term, count(*) AS df FROM tf GROUP BY 1, 2),
tsx AS (SELECT term, sum(df) AS df FROM ts GROUP BY term),
fw(field, w) AS (VALUES {wrows})"""


def bm25f_fuzzy_topk_sql(
    multi_queries: list[tuple[int, list[str], int, int]],
    field_toks: dict[str, str],
    field_weights: dict[str, float],
    max_expansions: int = 50,
    distance_decay: "float | None" = None,
    conjunctive: bool = False,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fielded.bm25f_fuzzy_topk — fuzzy expansion × BM25F: each
    word expands against the CROSS-FIELD vocabulary (tsx: union of the
    fields' vocabularies, df summed) under the standard rule (levenshtein ≤
    max_dist, (distance ASC, df DESC, term ASC), capped per word), unioned
    per query with MIN distance; each expansion term then contributes
    ({{idf_field}} · (w_field · decay^dist)) · tfc per field — the kernel's
    (idf · boost) · tfc multiplication order, dyadic decays exact.
    ``conjunctive``: the word-level AND reading — a doc is eligible iff
    EVERY query word's expansion set matches it in SOME field."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = ", ".join(
        "({}, '{}', {}, {})".format(qid, str(w).replace("'", "''"), d, k)
        for qid, words, d, k in multi_queries
        # dedup per query: a repeated word would double its expansion
        # partition's rows and corrupt the per-word row_number cap
        for w in dict.fromkeys(str(w) for w in words)
    )
    wexpr = (
        f"power({float(distance_decay)!r}, qt.dist)"
        if distance_decay is not None else "1.0"
    )
    conj_cte, conj_join = "", ""
    if conjunctive:
        conj_cte = f"""
nw AS (SELECT query_id, count(DISTINCT word) AS n_words FROM q GROUP BY query_id),
wexp AS (SELECT DISTINCT query_id, word, term
         FROM exp WHERE rn <= {max_expansions}),
wmatch AS (
    SELECT w.query_id, tf.doc_id
    FROM wexp w JOIN tf USING (term) JOIN nw ON nw.query_id = w.query_id
    GROUP BY w.query_id, tf.doc_id, nw.n_words
    HAVING count(DISTINCT w.word) = nw.n_words
),"""
        conj_join = "JOIN wmatch USING (query_id, doc_id)"
    return f"""
WITH q(query_id, word, max_dist, k) AS (VALUES {rows}),
{_fielded_ctes(field_toks, field_weights, toks, id_col, doc_table)},
exp AS (
    SELECT q.query_id, q.k, q.word, tsx.term,
           levenshtein(tsx.term, q.word) AS dist,
           row_number() OVER (PARTITION BY q.query_id, q.word
                              ORDER BY levenshtein(tsx.term, q.word) ASC,
                                       tsx.df DESC, tsx.term ASC) AS rn
    FROM q JOIN tsx ON levenshtein(tsx.term, q.word) <= q.max_dist
),
qt AS (
    SELECT query_id, k, term, min(dist) AS dist
    FROM exp WHERE rn <= {max_expansions}
    GROUP BY query_id, k, term
),{conj_cte}
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k,
           ({idf} * (fw.w * {wexpr})) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts ON ts.field = tf.field AND ts.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
    JOIN cs ON cs.field = tf.field
    JOIN fw ON fw.field = tf.field
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib {conj_join} GROUP BY query_id, doc_id, k
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


def bm25f_prefix_topk_sql(
    prefix_queries: list[tuple[int, str, int]],
    field_toks: dict[str, str],
    field_weights: dict[str, float],
    max_expansions: int = 100,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fielded.bm25f_prefix_topk — prefix expansion × BM25F:
    prefixes expand against the cross-field vocabulary (df summed across
    fields, LIKE prefix%, capped by df DESC / term ASC), then each term
    contributes (idf_field · w_field) · tfc per field it occurs in."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = ", ".join(
        "({}, '{}', {})".format(qid, p.replace("'", "''"), k)
        for qid, p, k in prefix_queries
    )
    return f"""
WITH q(query_id, prefix, k) AS (VALUES {rows}),
{_fielded_ctes(field_toks, field_weights, toks, id_col, doc_table)},
exp AS (
    SELECT q.query_id, q.k, tsx.term,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY tsx.df DESC, tsx.term ASC) AS rn
    FROM q JOIN tsx ON tsx.term LIKE q.prefix || '%'
),
qt AS (SELECT query_id, k, term FROM exp WHERE rn <= {max_expansions}),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k,
           ({idf} * fw.w) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts ON ts.field = tf.field AND ts.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
    JOIN cs ON cs.field = tf.field
    JOIN fw ON fw.field = tf.field
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
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


def bm25f_phrase_topk_sql(
    phrase_queries: list,
    field_toks: dict[str, str],
    field_weights: dict[str, float],
    ordered: bool = True,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fielded.bm25f_phrase_topk — cross-field phrase/proximity
    ranking: ``(query_id, phrase, k)`` (exact phrase) or ``(query_id,
    phrase, k, slop)`` (proximity; ``ordered=False`` for the symmetric
    window). A doc matches iff the phrase occurs in AT LEAST one field
    (per-field positional joins over the field's own token sub-stream);
    each matching field contributes w_field · phraseBM25_field =
    Σ_t (idf_field · w_field) · tfc_field over the deduped terms —
    independent SQL re-derivation (position-window joins + per-field
    stats), not a mirror of the engine's kernel."""
    import re

    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    qrows, pm_selects = [], []
    for q in phrase_queries:
        qid, phrase, k = int(q[0]), q[1], int(q[2])
        slop = int(q[3]) if len(q) > 3 else 0
        words = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        if not words:
            continue
        uniq = sorted(set(words))
        lit = "[" + ", ".join(
            "'" + t.replace("'", "''") + "'" for t in uniq) + "]"
        qrows.append(f"({qid}, {lit}, {k})")
        lits = ["'" + t.replace("'", "''") + "'" for t in words]
        if ordered:
            joins = []
            for i in range(1, len(words)):
                joins.append(
                    f"JOIN tokpos p{i} ON p{i}.doc_id = p0.doc_id "
                    f"AND p{i}.field = p0.field AND p{i}.term = {lits[i]} "
                    f"AND p{i}.pos BETWEEN p{i - 1}.pos + 1 "
                    f"AND p{i - 1}.pos + 1 + {slop}"
                )
            pm_selects.append(
                f"SELECT DISTINCT {qid} AS query_id, p0.field, p0.doc_id\n"
                f"FROM tokpos p0 {' '.join(joins)}\n"
                f"WHERE p0.term = {lits[0]}"
            )
        else:
            w = (len(words) - 1) * (slop + 1)
            inlits = ", ".join(
                "'" + t.replace("'", "''") + "'" for t in uniq)
            pm_selects.append(
                f"SELECT DISTINCT query_id, field, doc_id FROM (\n"
                f"  SELECT {qid} AS query_id, a.field, a.doc_id\n"
                f"  FROM tokpos a JOIN tokpos p ON p.doc_id = a.doc_id\n"
                f"    AND p.field = a.field\n"
                f"    AND p.pos BETWEEN a.pos AND a.pos + {w}\n"
                f"  WHERE a.term IN ({inlits}) AND p.term IN ({inlits})\n"
                f"  GROUP BY a.field, a.doc_id, a.pos\n"
                f"  HAVING count(DISTINCT p.term) = {len(uniq)}\n"
                f")"
            )
    pm_body = "\nUNION ALL\n".join(pm_selects) if pm_selects else (
        "SELECT NULL::BIGINT AS query_id, NULL::VARCHAR AS field, "
        "NULL::BIGINT AS doc_id WHERE FALSE"
    )
    return f"""
WITH q(query_id, terms, k) AS (VALUES {', '.join(qrows)}),
{_fielded_ctes(field_toks, field_weights, toks, id_col, doc_table)},
tokpos AS (
    SELECT doc_id, field, unnest(ftoks) AS term,
           (generate_subscripts(ftoks, 1) - 1)::BIGINT AS pos
    FROM ft
),
pm AS (
{pm_body}
),
qt AS (SELECT query_id, k, unnest(terms) AS term FROM q),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k,
           ({idf} * fw.w) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN pm ON pm.query_id = qt.query_id AND pm.doc_id = tf.doc_id
           AND pm.field = tf.field
    JOIN ts ON ts.field = tf.field AND ts.term = tf.term
    JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
    JOIN cs ON cs.field = tf.field
    JOIN fw ON fw.field = tf.field
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
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


def weighted_topk_sql(
    wqueries: list,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for boosted queries (6-tuples (qid, terms, mode, k, must_not,
    {term: weight})): per-term contribution = (idf · w) · tfc — the SAME
    multiplication order as the kernel, so rounded scores agree exactly.
    Unweighted terms default to w = 1."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    qt_rows, neg_rows = [], []
    for qid, terms, mode, k, negs, weights in wqueries:
        uniq = sorted(set(terms))
        for t in uniq:
            w = float((weights or {}).get(t, 1.0))
            qt_rows.append(
                "({}, '{}', {!r}::DOUBLE, '{}', {}, {})".format(
                    qid, t.replace("'", "''"), w, mode, k, len(uniq))
            )
        for t in sorted(set(negs or ())):
            neg_rows.append("({}, '{}')".format(qid, t.replace("'", "''")))
    neg_cte, neg_join = "", ""
    if neg_rows:
        neg_cte = (
            f"qn(query_id, term) AS (VALUES {', '.join(neg_rows)}),\n"
            "excl AS (SELECT DISTINCT qn.query_id, tf.doc_id "
            "FROM qn JOIN tf USING (term)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
    return f"""
WITH qt(query_id, term, w, mode, k, n_terms) AS (VALUES
        {', '.join(qt_rows)}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{neg_cte}contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.mode, qt.k, qt.n_terms,
           ({idf} * qt.w) * {tfc} AS contrib
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
    FROM scored {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def grouped_bool_topk_sql(
    gqueries: list,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for grouped-conjunctive boolean queries (the DSL's
    ``(a b) (c d)`` → kernel 7-slot group map): ``(qid, [[group terms],
    ...], k, negs, {term: boost})`` — a doc matches iff EVERY group has
    ≥ 1 member present (HAVING count(DISTINCT matched group) = n_groups
    over a membership relation), scored as the sum over DISTINCT matched
    terms of (idf · boost) · tfc. Independent re-derivation of the group
    rule in SQL, not a mirror of the kernel's bitmask."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    qt_rows, qg_rows, qn_rows, neg_rows = [], [], [], []
    for q in gqueries:
        qid, groups, k = int(q[0]), q[1], int(q[2])
        negs = q[3] if len(q) > 3 else ()
        boosts = q[4] if len(q) > 4 and q[4] else {}
        uniq = sorted({t for g in groups for t in g})
        for t in uniq:
            w = float(boosts.get(t, 1.0))
            qt_rows.append("({}, '{}', {!r}::DOUBLE, {})".format(
                qid, t.replace("'", "''"), w, k))
        for gi, g in enumerate(groups):
            for t in sorted(set(g)):
                qg_rows.append("({}, {}, '{}')".format(
                    qid, gi, t.replace("'", "''")))
        qn_rows.append(f"({qid}, {len(groups)})")
        for t in sorted(set(negs or ())):
            neg_rows.append("({}, '{}')".format(qid, t.replace("'", "''")))
    neg_cte, neg_join = "", ""
    if neg_rows:
        neg_cte = (
            f"qneg(query_id, term) AS (VALUES {', '.join(neg_rows)}),\n"
            "excl AS (SELECT DISTINCT qneg.query_id, tf.doc_id "
            "FROM qneg JOIN tf USING (term)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
    return f"""
WITH qt(query_id, term, w, k) AS (VALUES {', '.join(qt_rows)}),
qg(query_id, grp, term) AS (VALUES {', '.join(qg_rows)}),
qn(query_id, n_groups) AS (VALUES {', '.join(qn_rows)}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{neg_cte}matched AS (
    SELECT qg.query_id, tf.doc_id
    FROM qg JOIN tf USING (term) JOIN qn USING (query_id)
    GROUP BY qg.query_id, tf.doc_id, qn.n_groups
    HAVING count(DISTINCT qg.grp) = qn.n_groups
),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k,
           ({idf} * qt.w) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN matched ON matched.query_id = qt.query_id
                AND matched.doc_id = tf.doc_id
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
),
ranked AS (
    SELECT query_id, doc_id, score, k,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM scored {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {SCORE_ROUND_DECIMALS}) AS score
FROM ranked WHERE rank <= k
""".strip()


def paged_topk_sql(
    queries: list[tuple[int, list[str], str, int]],
    offsets: dict[int, int],
) -> str:
    """Oracle for bm25_topk_paged: rank at depth offset+k, keep the page
    (offset, offset+k] with GLOBAL ranks."""
    deep = [
        (qid, terms, mode, int(k) + int(offsets.get(qid, 0)))
        for qid, terms, mode, k in queries
    ]
    base = bm25_topk_sql(deep, round_score=False)
    po = ", ".join(
        f"({qid}, {int(offsets.get(qid, 0))}, {int(k)})"
        for qid, _t, _m, k in queries
    )
    return f"""
WITH deep AS ({base}),
po(query_id, poff, page_k) AS (VALUES {po})
SELECT d.query_id, d.rank, d.doc_id,
       round(d.score, {SCORE_ROUND_DECIMALS}) AS score
FROM deep d JOIN po USING (query_id)
WHERE d.rank > po.poff AND d.rank <= po.poff + po.page_k
""".strip()


def fuzzy_topk_sql(
    fuzzy_queries: list[tuple[int, str, int, int]],
    max_expansions: int = 50,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fuzzy_bm25_topk: the SAME expansion rule in SQL —
    vocabulary terms with levenshtein ≤ max_dist, capped at max_expansions by
    (distance ASC, df DESC, term ASC) — then disjunctive BM25 with
    full-corpus stats (DuckDB's levenshtein matches Spark's semantics)."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = ", ".join(
        "({}, '{}', {}, {})".format(qid, w.replace("'", "''"), d, k)
        for qid, w, d, k in fuzzy_queries
    )
    return f"""
WITH q(query_id, word, max_dist, k) AS (VALUES {rows}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
exp AS (
    SELECT q.query_id, q.k, ts.term,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY levenshtein(ts.term, q.word) ASC,
                                       ts.df DESC, ts.term ASC) AS rn
    FROM q JOIN ts ON levenshtein(ts.term, q.word) <= q.max_dist
),
qt AS (SELECT query_id, k, term FROM exp WHERE rn <= {max_expansions}),
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, {idf} * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib GROUP BY query_id, doc_id, k
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


def fuzzy_multi_topk_sql(
    multi_queries: list[tuple[int, list[str], int, int]],
    max_expansions: int = 50,
    distance_decay: "float | None" = None,
    conjunctive: bool = False,
    doc_table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Oracle for fuzzy_multi_bm25_topk: per-WORD expansion under the
    single-word rule (levenshtein ≤ max_dist, (distance ASC, df DESC, term
    ASC), capped per word), union per query with MIN distance across words,
    optional per-term weight = decay ** min_dist, then one BM25 ranking —
    the same (idf · w) · tfc multiplication order as the kernel's boost
    path, so rounded scores agree exactly (dyadic decays exact).
    ``conjunctive``: the AND reading — a doc is eligible iff EVERY query
    word's expansion set matches it (HAVING count(DISTINCT word) = n_words
    over the word-tagged expansion join); scoring is unchanged."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    rows = ", ".join(
        "({}, '{}', {}, {})".format(qid, str(w).replace("'", "''"), d, k)
        for qid, words, d, k in multi_queries
        for w in words
    )
    wexpr = (
        f"power({float(distance_decay)!r}, qt.dist)"
        if distance_decay is not None else "1.0"
    )
    conj_cte, conj_join = "", ""
    if conjunctive:
        conj_cte = f"""
nw AS (SELECT query_id, count(DISTINCT word) AS n_words FROM q GROUP BY query_id),
wexp AS (SELECT DISTINCT query_id, word, term
         FROM exp WHERE rn <= {max_expansions}),
wmatch AS (
    SELECT w.query_id, tf.doc_id
    FROM wexp w JOIN tf USING (term) JOIN nw ON nw.query_id = w.query_id
    GROUP BY w.query_id, tf.doc_id, nw.n_words
    HAVING count(DISTINCT w.word) = nw.n_words
),"""
        conj_join = "JOIN wmatch USING (query_id, doc_id)"
    return f"""
WITH q(query_id, word, max_dist, k) AS (VALUES {rows}),
dtok AS (
    SELECT {id_col} AS doc_id, {toks} AS toks FROM {doc_table}
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
exp AS (
    SELECT q.query_id, q.k, q.word, ts.term,
           levenshtein(ts.term, q.word) AS dist,
           row_number() OVER (PARTITION BY q.query_id, q.word
                              ORDER BY levenshtein(ts.term, q.word) ASC,
                                       ts.df DESC, ts.term ASC) AS rn
    FROM q JOIN ts ON levenshtein(ts.term, q.word) <= q.max_dist
),
qt AS (
    SELECT query_id, k, term, min(dist) AS dist
    FROM exp WHERE rn <= {max_expansions}
    GROUP BY query_id, k, term
),{conj_cte}
contrib AS (
    SELECT qt.query_id, tf.doc_id, qt.k, ({idf} * {wexpr}) * {tfc} AS contrib
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
),
scored AS (
    SELECT query_id, doc_id, k, sum(contrib) AS score
    FROM contrib {conj_join} GROUP BY query_id, doc_id, k
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


def bm25_topk_decorated_sql(queries: list[tuple[int, list[str], str, int]]) -> str:
    base = bm25_topk_sql(queries)
    return f"""
WITH topk AS ({base})
SELECT t.query_id, t.rank, t.doc_id, t.score, d.lang, d.source, d.n_chars
FROM topk t JOIN documents d USING (doc_id)
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
SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf,
       round({idf}, {SCORE_ROUND_DECIMALS}) AS idf
FROM tf GROUP BY term
""".strip()


def corpus_stats_sql(doc_table: str = "documents", text_col: str = "text",
                     id_col: str = "doc_id") -> str:
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    return f"""
WITH dl AS (SELECT {id_col} AS doc_id, len({toks}) AS dl FROM {doc_table})
SELECT count(*) AS n_docs, round(avg(dl), {SCORE_ROUND_DECIMALS}) AS avgdl,
       sum(dl)::BIGINT AS n_tokens
FROM dl
""".strip()


def doc_lengths_sql(doc_table: str = "documents", text_col: str = "text",
                    id_col: str = "doc_id") -> str:
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    return f"SELECT {id_col} AS doc_id, len({toks}) AS dl FROM {doc_table}"


# ---- dedup -------------------------------------------------------------------

# coalesce: Spark's concat_ws(' ', tokens(NULL)) yields '' while DuckDB's
# array_to_string(NULL, ' ') yields NULL — both sides must hash md5('')
_NORM = "array_to_string(" + DUCKDB_TOKENS_SQL.format(col="coalesce(text, '')") + ", ' ')"


def exact_dedup_sql() -> str:
    return f"""
WITH h AS (SELECT doc_id, md5({_NORM}) AS content_hash FROM documents)
SELECT doc_id, content_hash,
       doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS keep
FROM h
""".strip()


def _jaccard_cte(n: int = 3) -> str:
    toks = DUCKDB_TOKENS_SQL.format(col="text")
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
toks AS (SELECT doc_id, {toks} AS t FROM documents),
sh AS (
    SELECT doc_id,
           list_distinct([{parts} FOR i IN range(1, len(t) - {n - 2})]) AS s
    FROM toks WHERE len(t) >= {n}
),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)""".strip()


def dedup_clusters_sql(threshold: float, n: int = 3) -> str:
    """Oracle for resolve_clusters over exact n-gram-Jaccard pairs: the
    transitive closure as a recursive CTE — reach(doc, r) holds every node r
    with a path to doc; cluster_id = min reachable id, keep on the minimum.
    Independent re-derivation (min-label closure in SQL), not a mirror of the
    Spark large-star/small-star rounds."""
    return f"""
WITH RECURSIVE {_jaccard_cte(n)},
pr AS (
    SELECT d1, d2 FROM inter
    JOIN sizes sa ON d1 = sa.doc_id
    JOIN sizes sb ON d2 = sb.doc_id
    WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= {threshold}
),
ed AS (SELECT d1 AS a, d2 AS b FROM pr UNION ALL SELECT d2 AS a, d1 AS b FROM pr),
reach(doc_id, r) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT ed.b, reach.r FROM reach JOIN ed ON ed.a = reach.doc_id
)
SELECT doc_id, min(r) AS cluster_id, doc_id = min(r) AS keep
FROM reach GROUP BY doc_id
""".strip()


def stratified_sample_sql(
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "lang",
    salt: str = "s0",
) -> str:
    """Oracle for sampling.stratified_sample: the SAME md5-prefix-vs-hex-
    threshold rule (thresholds computed by the shared rate_to_hex_threshold,
    so both engines compare identical strings)."""
    from bloqsenjin_spark.operators.sampling import rate_to_hex_threshold

    cases = " ".join(
        f"WHEN {strata_col} = '{s}' THEN '{rate_to_hex_threshold(r)}'"
        for s, r in sorted(rates.items())
    )
    default_thr = rate_to_hex_threshold(default_rate)
    return f"""
SELECT doc_id, {strata_col} AS stratum
FROM documents
WHERE substring(md5('{salt}' || doc_id::VARCHAR), 1, 8)
      < (CASE {cases} ELSE '{default_thr}' END)
""".strip()


def prepare_corpus_sql(
    langs: tuple[str, ...],
    min_quality: float,
    threshold: float,
    markers: dict[str, tuple[str, ...]],
    stopwords: tuple[str, ...],
    n: int = 3,
    round_to: int = SCORE_ROUND_DECIMALS,
) -> str:
    """Oracle for dedup.prepare_training_corpus: language gate → quality
    gate → n-gram-Jaccard transitive-closure dedup among the gate survivors,
    status = first failing rule ('lang' | 'quality' | 'duplicate' | 'kept').
    Independently re-derives all three stages (marker-argmax lang ID, the
    closed-form quality score UNROUNDED for the gate, min-label recursive
    closure restricted to the filtered doc set)."""
    toks = DUCKDB_TOKENS_SQL.format(col="text")
    stop_lit = ", ".join(f"'{s}'" for s in stopwords)
    lang_lit = ", ".join(f"'{x}'" for x in langs)
    hit_cols = []
    for lang in sorted(markers):
        lit = ", ".join(f"'{w}'" for w in markers[lang])
        hit_cols.append(f"len(list_filter(t, x -> x IN ({lit})))::BIGINT AS h_{lang}")
    best_expr = "struct_pack(hits := 0::BIGINT, lang := 'und')"
    for lang in sorted(markers):
        best_expr = (
            f"CASE WHEN h_{lang} > ({best_expr}).hits "
            f"THEN struct_pack(hits := h_{lang}, lang := '{lang}') "
            f"ELSE {best_expr} END"
        )
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
WITH RECURSIVE
base AS (SELECT doc_id, {toks} AS t, coalesce(text, '') AS txt FROM documents),
m AS (
    SELECT doc_id,
           len(t)::DOUBLE AS n_tok,
           length(regexp_replace(lower(txt), '[^a-z0-9]', '', 'g'))::DOUBLE AS alnum,
           length(txt)::DOUBLE AS total,
           len(list_filter(t, x -> x IN ({stop_lit})))::DOUBLE AS stop_hits,
           {', '.join(hit_cols)}
    FROM base
),
flags AS (
    SELECT doc_id,
           ({best_expr}).lang AS lang_pred,
           least(n_tok / 20.0, 1.0) * 0.25
             + CASE WHEN n_tok > 0 AND alnum / n_tok BETWEEN 3.0 AND 10.0
                    THEN 0.25 ELSE 0.0 END
             + least(CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END / 0.05, 1.0) * 0.25
             + CASE WHEN total > 0 THEN alnum / total ELSE 0.0 END * 0.25 AS quality
    FROM m
),
gated AS (
    SELECT doc_id, lang_pred, quality,
           lang_pred IN ({lang_lit}) AS lang_ok,
           quality >= {float(min_quality)!r} AS quality_ok
    FROM flags
),
fdocs AS (SELECT doc_id FROM gated WHERE lang_ok AND quality_ok),
ftoks AS (SELECT base.doc_id, t FROM base JOIN fdocs USING (doc_id)),
sh AS (
    SELECT doc_id,
           list_distinct([{parts} FOR i IN range(1, len(t) - {n - 2})]) AS s
    FROM ftoks WHERE len(t) >= {n}
),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh),
inter AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
pr AS (
    SELECT d1, d2 FROM inter
    JOIN sizes sa ON d1 = sa.doc_id
    JOIN sizes sb ON d2 = sb.doc_id
    WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= {threshold}
),
ed AS (SELECT d1 AS a, d2 AS b FROM pr UNION ALL SELECT d2 AS a, d1 AS b FROM pr),
reach(doc_id, r) AS (
    SELECT doc_id, doc_id FROM fdocs
    UNION
    SELECT ed.b, reach.r FROM reach JOIN ed ON ed.a = reach.doc_id
),
res AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id)
SELECT g.doc_id, g.lang_pred, round(g.quality, {round_to}) AS quality,
       CASE WHEN NOT g.lang_ok THEN 'lang'
            WHEN NOT g.quality_ok THEN 'quality'
            WHEN res.cluster_id <> g.doc_id THEN 'duplicate'
            ELSE 'kept' END AS status
FROM gated g LEFT JOIN res ON res.doc_id = g.doc_id
""".strip()


def ngram_jaccard_sql(threshold: float, n: int = 3) -> str:
    return f"""
WITH {_jaccard_cte(n)}
SELECT d1, d2, i::DOUBLE / (sa.n_sh + sb.n_sh - i) AS jaccard
FROM inter
JOIN sizes sa ON d1 = sa.doc_id
JOIN sizes sb ON d2 = sb.doc_id
WHERE i::DOUBLE / (sa.n_sh + sb.n_sh - i) >= {threshold}
""".strip()


# ---- text stats ----------------------------------------------------------------

def token_count_sql() -> str:
    toks = DUCKDB_TOKENS_SQL.format(col="text")
    return (
        f"SELECT doc_id, len({toks})::BIGINT AS n_tokens, "
        "length(coalesce(text, ''))::BIGINT AS n_chars_seen FROM documents"
    )


def quality_score_sql(stopwords: tuple[str, ...], round_to: int = SCORE_ROUND_DECIMALS) -> str:
    toks = DUCKDB_TOKENS_SQL.format(col="text")
    stop_lit = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
WITH base AS (
    SELECT doc_id,
           {toks} AS t,
           coalesce(text, '') AS txt
    FROM documents
), m AS (
    SELECT doc_id,
           len(t)::DOUBLE AS n_tok,
           length(regexp_replace(lower(txt), '[^a-z0-9]', '', 'g'))::DOUBLE AS alnum,
           length(txt)::DOUBLE AS total,
           len(list_filter(t, x -> x IN ({stop_lit})))::DOUBLE AS stop_hits
    FROM base
)
SELECT doc_id,
       n_tok::BIGINT AS n_tokens,
       round(CASE WHEN n_tok > 0 THEN alnum / n_tok ELSE 0.0 END, {round_to}) AS mean_token_len,
       round(CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END, {round_to}) AS stopword_ratio,
       round(CASE WHEN total > 0 THEN alnum / total ELSE 0.0 END, {round_to}) AS alnum_ratio,
       round(
         least(n_tok / 20.0, 1.0) * 0.25
         + CASE WHEN n_tok > 0 AND alnum / n_tok BETWEEN 3.0 AND 10.0 THEN 0.25 ELSE 0.0 END
         + least(CASE WHEN n_tok > 0 THEN stop_hits / n_tok ELSE 0.0 END / 0.05, 1.0) * 0.25
         + CASE WHEN total > 0 THEN alnum / total ELSE 0.0 END * 0.25
       , {round_to}) AS quality
FROM m
""".strip()


def lang_id_sql(markers: dict[str, tuple[str, ...]],
                round_to: int = SCORE_ROUND_DECIMALS) -> str:
    toks = DUCKDB_TOKENS_SQL.format(col="text")
    hit_cols = []
    for lang in sorted(markers):
        lit = ", ".join(f"'{w}'" for w in markers[lang])
        hit_cols.append(f"len(list_filter(t, x -> x IN ({lit})))::BIGINT AS h_{lang}")
    langs = sorted(markers)
    # strict-greater argmax in sorted language order, seeded with ('und', 0)
    best_expr = "struct_pack(hits := 0::BIGINT, lang := 'und')"
    for lang in langs:
        best_expr = (
            f"CASE WHEN h_{lang} > ({best_expr}).hits "
            f"THEN struct_pack(hits := h_{lang}, lang := '{lang}') "
            f"ELSE {best_expr} END"
        )
    return f"""
WITH base AS (SELECT doc_id, {toks} AS t FROM documents),
hits AS (SELECT doc_id, len(t)::DOUBLE AS n_tok, {', '.join(hit_cols)} FROM base),
best AS (SELECT doc_id, n_tok, {best_expr} AS b FROM hits)
SELECT doc_id, (b).lang AS lang_pred,
       round(CASE WHEN n_tok > 0 THEN (b).hits / n_tok ELSE 0.0 END, {round_to}) AS lang_score
FROM best
""".strip()


def fingerprint_sql() -> str:
    return (
        f"SELECT doc_id, md5({_NORM}) AS fp, "
        f"substring(md5({_NORM}), 1, 16) AS fp_prefix FROM documents"
    )


# ---- similarity ----------------------------------------------------------------

def cosine_topk_sql(query_ids: list[int], k: int,
                    round_to: int = SCORE_ROUND_DECIMALS,
                    allowed_pred: "str | None" = None) -> str:
    """``allowed_pred``: optional SQL predicate over the CANDIDATE side
    (filtered vector search — eligibility restricted, scores unchanged;
    query vectors stay unrestricted), e.g. ``vec_id % 3 <> 0``."""
    ids = ", ".join(str(i) for i in query_ids)
    allow = f" AND ({allowed_pred})" if allowed_pred else ""
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN ({ids})),
scored AS (
    SELECT q.query_id, b.vec_id,
           list_dot_product(q.qv, b.v)
             / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v)))
             AS score
    FROM base b CROSS JOIN q
    WHERE b.vec_id <> q.query_id{allow}
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, rank::INT AS rank, vec_id, round(score, {round_to}) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def simhash_pairs_sql(max_hamming: int = 3, doc_table: str = "documents",
                      text_col: str = "text") -> str:
    """Exact re-derivation of dedup.simhash_pairs: md5-derived 64-bit token
    hashes ((hi ‖ lo) from two 32-bit hex parses — the same bit pattern as
    the Spark _md5_hash64), tf-weighted per-bit votes, sign → signature,
    all-pairs popcount(xor) ≤ max_hamming. All-pairs is equivalent to the
    engine's 4×16-bit chunk-bucket candidates by pigeonhole (Hamming ≤ 3 ⇒
    ≥1 identical chunk) whenever the hot-bucket cap doesn't bind (it cannot
    at oracle SF)."""
    toks = DUCKDB_TOKENS_SQL.format(col=text_col)
    return f"""
WITH tok AS (
    SELECT doc_id, unnest({toks}) AS t FROM {doc_table}
),
h AS (
    SELECT doc_id,
           ('0x' || substr(md5(t), 1, 8))::UBIGINT * 4294967296::UBIGINT
             + ('0x' || substr(md5(t), 9, 8))::UBIGINT AS h64
    FROM tok
),
votes AS (
    SELECT doc_id, b,
           sum(CASE WHEN ((h64 >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
    FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b)
    GROUP BY doc_id, b
),
sig AS (
    SELECT doc_id,
           bit_or(CASE WHEN v > 0 THEN 1::UBIGINT << b ELSE 0::UBIGINT END) AS s
    FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       bit_count(xor(a.s, b.s))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= {max_hamming}
""".strip()


def ann_lsh_topk_sql(query_ids: list[int], k: int, bands: int = 8,
                     bits_per_band: int = 4, seed: int = 42,
                     round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """Exact re-derivation of similarity.ann_cosine_lsh: md5-keyed ±1
    planes × floor(x·1024) fixed-point vectors → integer projections (no
    float-sum-order hazard), banded keys, candidate = shares ANY band key
    with the query, exact cosine re-score, top-k (score DESC, vec_id ASC)."""
    ids = ", ".join(str(i) for i in query_ids)
    nbits = bands * bits_per_band
    return f"""
WITH dims AS (
    SELECT unnest(generate_series(0, (SELECT len(embedding) - 1
                                      FROM embeddings LIMIT 1))) AS i
),
planes AS (
    SELECT j, i,
           CASE WHEN ('0x' || substr(md5('lsh:{seed}:' || j || ':' || i), 1, 8))::BIGINT
                     % 2 = 0 THEN 1 ELSE -1 END AS w
    FROM (SELECT unnest(generate_series(0, {nbits - 1})) AS j) CROSS JOIN dims
),
vx AS (
    SELECT vec_id, i, CAST(floor(embedding[i + 1]::DOUBLE * 1024) AS BIGINT) AS xq
    FROM embeddings CROSS JOIN dims
),
proj AS (
    SELECT vec_id, p.j,
           CASE WHEN sum(vx.xq * p.w) > 0 THEN 1 ELSE 0 END AS bit
    FROM vx JOIN planes p ON vx.i = p.i
    GROUP BY vec_id, p.j
),
sig AS (
    SELECT vec_id, j // {bits_per_band} AS band,
           sum(bit << (j % {bits_per_band})) AS key
    FROM proj GROUP BY vec_id, j // {bits_per_band}
),
cand AS (
    SELECT DISTINCT q.vec_id AS query_id, s.vec_id
    FROM sig s JOIN sig q ON s.band = q.band AND s.key = q.key
    WHERE q.vec_id IN ({ids}) AND s.vec_id <> q.vec_id
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
    SELECT c.query_id, c.vec_id,
           list_dot_product(q.v, b.v)
             / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(b.v, b.v)))
             AS score
    FROM cand c
    JOIN base b ON b.vec_id = c.vec_id
    JOIN base q ON q.vec_id = c.query_id
),
ranked AS (
    SELECT query_id, vec_id, score,
           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, rank::INT AS rank, vec_id, round(score, {round_to}) AS score
FROM ranked WHERE rank <= {k}
""".strip()


def embedding_near_dup_sql(threshold: float,
                           round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """All-pairs cosine ≥ threshold over the embeddings table (d1 < d2) —
    the exact oracle for the embedding near-dup leg of the dedup suite."""
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
    SELECT a.vec_id AS d1, b.vec_id AS d2,
           list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
             AS score
    FROM base a JOIN base b ON a.vec_id < b.vec_id
)
SELECT d1, d2, round(score, {round_to}) AS score
FROM pairs WHERE score >= {threshold}
""".strip()


def fake_features_sql() -> str:
    """Oracle for the mapInPandas fake feature extractor: md5(utf8(text)) →
    8 little-endian uint16s / 65536. DuckDB md5_number_upper = digest bytes
    0-7 LE (features 0-3), md5_number_lower = bytes 8-15 LE (features 4-7);
    u/65536 is an exact dyadic rational in both float32 and double, so no
    rounding is needed for value parity."""
    cols = []
    for i in range(8):
        src = "md5_number_upper(text)" if i < 4 else "md5_number_lower(text)"
        cols.append(f"(({src} >> {16 * (i % 4)}) & 65535) / 65536.0 AS f{i}")
    return f"SELECT doc_id AS asset_id, {', '.join(cols)} FROM documents"


def decode_pixels_sql(width: int = 8, height: int = 6) -> str:
    """Oracle for the REAL BMP decode (operators/multimodal.decode_image_stats
    over synthetic_bmp_assets): pixel(i, j) = (doc_id·7 + 13i + 31j) mod 256
    on all channels ⇒ integer luma == pixel value, so the decoded statistics
    are closed-form over a generate_series grid — every byte the NumPy BMP
    kernel produces is value-checked, no float tolerance."""
    return f"""
WITH px AS (
    SELECT d.doc_id AS asset_id, i.i, j.j,
           (d.doc_id * 7 + 13 * i.i + 31 * j.j) % 256 AS v
    FROM documents d, range({height}) i(i), range({width}) j(j)
)
SELECT asset_id,
       {height} AS height,
       {width} AS width,
       sum(v)::BIGINT AS px_sum,
       sum(v * (i * {width} + j))::BIGINT AS px_wsum
FROM px GROUP BY asset_id
""".strip()


# ---- multimodal metadata --------------------------------------------------------

def asset_metadata_sql(round_to: int = SCORE_ROUND_DECIMALS) -> str:
    return f"""
SELECT doc_id AS asset_id,
       ['image/png', 'audio/wav', 'video/mp4'][(doc_id % 3 + 1)::INT] AS kind,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS digest,
       round((doc_id % 640 + 1)::DOUBLE / (doc_id % 480 + 1), {round_to}) AS aspect
FROM documents
""".strip()


# ---- relational parity (TPC-H-ish tables) ---------------------------------------

def phrase_match_sql(phrases: list[tuple[int, str]],
                     field_toks: str | None = None) -> str:
    """Phrase containment oracle. ``field_toks``: optional DuckDB list
    expression over ``toks`` (the whole-document token array) selecting a
    FIELD's token sub-stream (e.g. ``list_slice(toks, 1, 5)``) — the oracle
    for phrase_match_fielded; default matches against the whole document."""
    import re

    rows = []
    for qid, phrase in phrases:
        toks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        p = " ".join(toks).replace("'", "''")
        rows.append(f"({qid}, ' {p} ')")
    vals = ",\n        ".join(rows)
    if field_toks is None:
        n_cte = f"n AS (SELECT doc_id, ' ' || {_NORM} || ' ' AS t FROM documents)"
    else:
        toks_sql = DUCKDB_TOKENS_SQL.format(col="coalesce(text, '')")
        n_cte = (
            f"dtok AS (SELECT doc_id, {toks_sql} AS toks FROM documents),\n"
            f"n AS (SELECT doc_id, ' ' || array_to_string({field_toks}, ' ')"
            " || ' ' AS t FROM dtok)"
        )
    return f"""
WITH q(query_id, p) AS (VALUES
        {vals}),
{n_cte}
SELECT q.query_id, n.doc_id
FROM q JOIN n ON position(q.p IN n.t) > 0
""".strip()


def near_match_sql(near_queries: list[tuple[int, str, int]]) -> str:
    """Oracle for near_match_positional: ordered proximity as a chain of
    position-window self-joins over (doc_id, term, pos) — token i+1 must sit
    in (pos_i, pos_i + 1 + slop]. Independent re-derivation in SQL (join
    chain), not a mirror of the engine's sorted-set-intersection kernel;
    slop=0 degenerates to exact adjacency."""
    import re

    toks_sql = DUCKDB_TOKENS_SQL.format(col="text")
    selects = []
    for qid, phrase, slop in near_queries:
        toks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        if not toks:
            continue
        lits = ["'" + t.replace("'", "''") + "'" for t in toks]
        joins = []
        for i in range(1, len(toks)):
            joins.append(
                f"JOIN tokpos p{i} ON p{i}.doc_id = p0.doc_id "
                f"AND p{i}.term = {lits[i]} "
                f"AND p{i}.pos BETWEEN p{i - 1}.pos + 1 AND p{i - 1}.pos + 1 + {int(slop)}"
            )
        selects.append(
            f"SELECT DISTINCT {int(qid)} AS query_id, p0.doc_id\n"
            f"FROM tokpos p0 {' '.join(joins)}\n"
            f"WHERE p0.term = {lits[0]}"
        )
    body = "\nUNION ALL\n".join(selects) if selects else (
        "SELECT NULL::BIGINT AS query_id, NULL::BIGINT AS doc_id WHERE FALSE"
    )
    return f"""
WITH dtok AS (SELECT doc_id, {toks_sql} AS toks FROM documents),
tokpos AS (
    SELECT doc_id, unnest(toks) AS term,
           (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
    FROM dtok
)
{body}
""".strip()


def near_unordered_match_sql(near_queries: list[tuple[int, str, int]]) -> str:
    """Oracle for near_match_positional(ordered=False): symmetric
    position-window containment — a doc matches iff some anchor position p
    of ANY query term has every distinct term occurring in [p, p + W],
    W = (n_tokens − 1) · (slop + 1). Independent re-derivation as an
    anchor-join + HAVING count(DISTINCT term) = n_terms, not a mirror of the
    engine's searchsorted kernel."""
    import re

    toks_sql = DUCKDB_TOKENS_SQL.format(col="text")
    selects = []
    for qid, phrase, slop in near_queries:
        toks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        if not toks:
            continue
        uniq = sorted(set(toks))
        w = (len(toks) - 1) * (int(slop) + 1)
        lits = ", ".join("'" + t.replace("'", "''") + "'" for t in uniq)
        selects.append(
            f"SELECT DISTINCT {int(qid)} AS query_id, a.doc_id\n"
            f"FROM tokpos a JOIN tokpos p ON p.doc_id = a.doc_id\n"
            f"  AND p.pos BETWEEN a.pos AND a.pos + {w}\n"
            f"WHERE a.term IN ({lits}) AND p.term IN ({lits})\n"
            f"GROUP BY a.doc_id, a.pos\n"
            f"HAVING count(DISTINCT p.term) = {len(uniq)}"
        )
    body = "\nUNION ALL\n".join(selects) if selects else (
        "SELECT NULL::BIGINT AS query_id, NULL::BIGINT AS doc_id WHERE FALSE"
    )
    return f"""
WITH dtok AS (SELECT doc_id, {toks_sql} AS toks FROM documents),
tokpos AS (
    SELECT doc_id, unnest(toks) AS term,
           (generate_subscripts(toks, 1) - 1)::BIGINT AS pos
    FROM dtok
)
SELECT DISTINCT query_id, doc_id FROM (
{body}
)
""".strip()


def phrase_topk_sql(phrases: list[tuple[int, str, int]],
                    round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """Phrase-filtered BM25 top-k: exact-phrase matches ranked by BM25 over
    the phrase's (deduped) terms. Ranks computed on UNROUNDED scores (same
    tie-break as the engine); rounding only in the final projection."""
    import re

    conj = []
    for qid, phrase, _k in phrases:
        toks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        conj.append((qid, sorted(set(toks)), "conjunctive", 1 << 30))
    base = bm25_topk_sql(conj, round_score=False)
    pm = phrase_match_sql([(qid, p) for qid, p, _ in phrases])
    kvals = ", ".join(f"({qid}, {k})" for qid, _, k in phrases)
    return f"""
WITH scored AS ({base}),
pm AS ({pm}),
ks(query_id, k) AS (VALUES {kvals}),
j AS (
    SELECT s.query_id, s.doc_id, s.score
    FROM scored s JOIN pm ON s.query_id = pm.query_id AND s.doc_id = pm.doc_id
),
r AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM j
)
SELECT r.query_id, r.rank::INT AS rank, r.doc_id,
       round(r.score, {round_to}) AS score
FROM r JOIN ks ON r.query_id = ks.query_id
WHERE r.rank <= ks.k
""".strip()


def near_topk_sql(near_queries: list[tuple[int, str, int, int]],
                  round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """Oracle for near_bm25_topk: the proximity match set (chained
    position-window joins) ranked by BM25 over the query's deduped terms —
    same composition as phrase_topk_sql with the windowed matcher."""
    import re

    conj = []
    for qid, phrase, _k, _s in near_queries:
        toks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        conj.append((qid, sorted(set(toks)), "conjunctive", 1 << 30))
    base = bm25_topk_sql(conj, round_score=False)
    pm = near_match_sql([(qid, p, s) for qid, p, _k, s in near_queries])
    kvals = ", ".join(f"({qid}, {int(k)})" for qid, _p, k, _s in near_queries)
    return f"""
WITH scored AS ({base}),
pm AS ({pm}),
ks(query_id, k) AS (VALUES {kvals}),
j AS (
    SELECT s.query_id, s.doc_id, s.score
    FROM scored s JOIN pm ON s.query_id = pm.query_id AND s.doc_id = pm.doc_id
),
r AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM j
)
SELECT r.query_id, r.rank::INT AS rank, r.doc_id,
       round(r.score, {round_to}) AS score
FROM r JOIN ks ON r.query_id = ks.query_id
WHERE r.rank <= ks.k
""".strip()


def near_unordered_topk_sql(near_queries: list[tuple[int, str, int, int]],
                            round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """Oracle for near_bm25_topk(ordered=False): the symmetric anchor-window
    match set (near_unordered_match_sql) ranked by BM25 over the query's
    deduped terms — same composition as near_topk_sql with the unordered
    matcher."""
    import re

    conj = []
    for qid, phrase, _k, _s in near_queries:
        toks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        conj.append((qid, sorted(set(toks)), "conjunctive", 1 << 30))
    base = bm25_topk_sql(conj, round_score=False)
    pm = near_unordered_match_sql([(qid, p, s) for qid, p, _k, s in near_queries])
    kvals = ", ".join(f"({qid}, {int(k)})" for qid, _p, k, _s in near_queries)
    return f"""
WITH scored AS ({base}),
pm AS ({pm}),
ks(query_id, k) AS (VALUES {kvals}),
j AS (
    SELECT s.query_id, s.doc_id, s.score
    FROM scored s JOIN pm ON s.query_id = pm.query_id AND s.doc_id = pm.doc_id
),
r AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM j
)
SELECT r.query_id, r.rank::INT AS rank, r.doc_id,
       round(r.score, {round_to}) AS score
FROM r JOIN ks ON r.query_id = ks.query_id
WHERE r.rank <= ks.k
""".strip()


def must_not_phrase_topk_sql(queries: list, neg_map: dict,
                             round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """Oracle for wand.bm25_topk_must_not_phrase: plain ranked queries
    (4/5-tuples — the bm25_topk_sql shapes; 6-tuple per-term boosts are
    REFUSED loudly, since the base builder has no boost support and a
    silent drop would fake oracle parity). ``neg_map``: qid → [(phrase,
    slop, ordered), ...]. Independent re-derivation: the unbounded
    positive ranking ANTI-JOINs each query's phrase match set
    (position-window joins), then re-ranks — exclusion before ranks,
    exactly the engine's pre-top-k bitmap masking."""
    for q in queries:
        if len(q) > 5 and q[5]:
            raise ValueError(
                "must_not_phrase_topk_sql supports 4/5-tuple queries only "
                "— per-term boosts need a weighted base builder "
                f"(query_id={q[0]})"
            )
    unb = [(q[0], q[1], q[2], 1 << 30) for q in queries]
    must_not = {q[0]: list(q[4]) for q in queries if len(q) > 4 and q[4]}
    base = bm25_topk_sql(unb, round_score=False,
                         must_not=must_not or None)
    pm_parts = []
    ordered_in = [(qid, p, s) for qid, lst in neg_map.items()
                  for p, s, o in lst if o]
    unordered_in = [(qid, p, s) for qid, lst in neg_map.items()
                    for p, s, o in lst if not o]
    if ordered_in:
        pm_parts.append(near_match_sql(ordered_in))
    if unordered_in:
        pm_parts.append(near_unordered_match_sql(unordered_in))
    pm = "\nUNION ALL\n".join(f"SELECT * FROM (\n{p}\n)" for p in pm_parts)
    kvals = ", ".join(f"({int(q[0])}, {int(q[3])})" for q in queries)
    return f"""
WITH base AS ({base}),
pm AS ({pm}),
ks(query_id, k) AS (VALUES {kvals}),
kept AS (
    SELECT query_id, doc_id, score FROM base
    ANTI JOIN pm USING (query_id, doc_id)
),
r AS (
    SELECT query_id, doc_id, score,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM kept
)
SELECT r.query_id, r.rank::INT AS rank, r.doc_id,
       round(r.score, {round_to}) AS score
FROM r JOIN ks ON r.query_id = ks.query_id
WHERE r.rank <= ks.k
""".strip()


def phrase_terms_topk_sql(queries: list, ordered: bool = True,
                          round_to: int = SCORE_ROUND_DECIMALS) -> str:
    """Oracle for wand.phrase_terms_bm25_topk — phrase × loose-term boolean
    queries ``(qid, phrase, terms, mode, k[, negs[, boosts[, slop]]])``.
    Independent SQL re-derivation: the phrase match set comes from the
    chained position-window joins (near_match_sql / the unordered anchor
    variant), per-(query, doc, term) contributions from the shared BM25
    closed form, and the eligibility/score rules are the operator's —
    loose terms contribute by presence, phrase-only terms iff the phrase
    matched; conjunctive = phrase AND all loose, disjunctive = phrase OR
    any loose; MUST_NOT anti-joins before ranking."""
    import re

    toks = DUCKDB_TOKENS_SQL.format(col="text")
    tfc = tf_component_sql("tf.tf", "dl.dl", "cs.avgdl")
    idf = idf_sql("ts.df", "cs.n")
    qt_rows: list[str] = []
    pm_inputs: list[tuple[int, str, int]] = []
    neg_rows: list[str] = []
    for q in queries:
        qid, phrase, terms, mode, k = int(q[0]), q[1], q[2], q[3], int(q[4])
        negs = sorted(set(q[5])) if len(q) > 5 and q[5] else []
        boosts = dict(q[6]) if len(q) > 6 and q[6] else {}
        slop = int(q[7]) if len(q) > 7 else 0
        ptoks = [t for t in re.split(TOKEN_SPLIT_REGEX, phrase.lower()) if t]
        loose = sorted(set(terms))
        union = sorted(set(ptoks) | set(loose))
        for t in union:
            lit = "'" + t.replace("'", "''") + "'"
            qt_rows.append(
                f"({qid}, {lit}, {float(boosts.get(t, 1.0))!r}, "
                f"{str(t in set(loose)).upper()}, '{mode}', {k}, "
                f"{len(loose)})"
            )
        pm_inputs.append((qid, phrase, slop))
        for t in negs:
            neg_rows.append(f"({qid}, '" + t.replace("'", "''") + "')")
    pm = (near_match_sql(pm_inputs) if ordered
          else near_unordered_match_sql(pm_inputs))
    neg_cte, neg_join = "", ""
    if neg_rows:
        neg_cte = (
            f"qn(query_id, term) AS (VALUES {', '.join(neg_rows)}),\n"
            "excl AS (SELECT DISTINCT qn.query_id, tf.doc_id "
            "FROM qn JOIN tf USING (term)),\n"
        )
        neg_join = "ANTI JOIN excl USING (query_id, doc_id)"
    return f"""
WITH dtok AS (
    SELECT doc_id, {toks} AS toks FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM dtok),
dl AS (SELECT doc_id, len(toks) AS dl FROM dtok),
cs AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{neg_cte}qt(query_id, term, w, is_loose, mode, k, n_loose) AS (VALUES
        {(',' + chr(10) + '        ').join(qt_rows)}),
pm AS ({pm}),
j AS (
    SELECT qt.query_id, tf.doc_id, qt.mode, qt.k, qt.n_loose, qt.is_loose,
           ({idf} * qt.w) * {tfc} AS contrib,
           (pm.doc_id IS NOT NULL) AS phrase_hit
    FROM qt
    JOIN tf USING (term)
    JOIN ts USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN cs
    LEFT JOIN pm ON pm.query_id = qt.query_id AND pm.doc_id = tf.doc_id
),
scored AS (
    SELECT query_id, doc_id, k, mode, n_loose,
           sum(CASE WHEN is_loose OR phrase_hit THEN contrib END) AS score,
           count(*) FILTER (WHERE is_loose) AS nl,
           bool_or(phrase_hit) AS hp
    FROM j GROUP BY query_id, doc_id, k, mode, n_loose
),
elig AS (
    SELECT query_id, doc_id, k, score FROM scored
    WHERE CASE WHEN mode = 'conjunctive' THEN hp AND nl = n_loose
               ELSE hp OR nl > 0 END
),
ranked AS (
    SELECT query_id, doc_id, score, k,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id ASC) AS rank
    FROM elig {neg_join}
)
SELECT query_id, rank::INT AS rank, doc_id,
       round(score, {round_to}) AS score
FROM ranked WHERE rank <= k
""".strip()


def prefix_scan_sql(prefix: str = "s", limit: int = 10) -> str:
    toks = DUCKDB_TOKENS_SQL.format(col="text")
    return f"""
WITH tok AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS (SELECT term, doc_id FROM tok GROUP BY term, doc_id),
ts AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT term, df FROM ts WHERE term LIKE '{prefix}%' ORDER BY term LIMIT {limit}
""".strip()


RELATIONAL_SQL: dict[str, str] = {
    "rel_validate_rows": """
SELECT p_partkey,
       (length(p_name) >= 1 AND length(p_name) <= 80) AS name_ok,
       (p_retailprice >= 0) AS price_ok,
       (p_size BETWEEN 1 AND 50) AS size_ok,
       ((length(p_name) >= 1 AND length(p_name) <= 80)
        AND (p_retailprice >= 0) AND (p_size BETWEEN 1 AND 50)) AS valid
FROM part
""".strip(),
    "rel_rollup_metrics": """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip(),
    "rel_lag_lead_deltas": """
SELECT event_id, user_id,
       (epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT
         AS ms_since_prev
FROM events
""".strip(),
    "rel_json_extract": """
SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k FROM events
""".strip(),
    "rel_scalar_funcs": """
SELECT o_orderkey,
       'order/' || o_orderkey AS order_url,
       to_base64(encode(o_orderpriority)) AS prio_b64,
       date_trunc('month', o_orderdate) AS order_month,
       datediff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS days_since_epoch_start
FROM orders
""".strip(),
    "rel_windowed_event_counts": """
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1, 2
""".strip(),
    "rel_select_project_filter": """
SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity >= 30 AND l_returnflag <> 'R' AND l_discount < 0.05
""".strip(),
    "rel_join_groupby_view": """
SELECT c_custkey, c_name, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_spent
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
""".strip(),
    "rel_enrichment_join": """
SELECT o_orderkey, o_totalprice, count(*) AS n_items,
       array_to_string(list_sort(list(p_name)), '|') AS part_names
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN part ON l_partkey = p_partkey
GROUP BY o_orderkey, o_totalprice
""".strip(),
    "rel_semi_join_exists": """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 100000)
""".strip(),
    "rel_anti_join_guard": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""".strip(),
    "rel_cooccurrence_pairs": """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS weight
FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= 2
""".strip(),
    "rel_interval_filter": """
SELECT o_orderkey, o_custkey, o_orderdate FROM orders
WHERE o_orderdate >= '1996-01-01' AND o_orderdate <= '1997-06-30'
""".strip(),
    "rel_top1_per_group": """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
) WHERE rn = 1
""".strip(),
    "rel_quota_count": """
SELECT o_custkey, count(*) AS n_orders FROM orders
GROUP BY o_custkey HAVING count(*) >= 20
""".strip(),
    "rel_level_curve": """
SELECT event_id,
       greatest(least(floor(0.7 * log2(1.5 * (value + 1.0))) + 1, 8), 1)::INT AS level
FROM events
""".strip(),
    "rel_bitmask_ops": """
WITH m AS (
    SELECT user_id,
           CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
                WHEN 'purchase' THEN 4 ELSE 8 END::BIGINT AS m
    FROM events
), agg AS (
    SELECT user_id, bit_or(m) AS mask FROM m GROUP BY user_id
)
SELECT user_id, mask, (mask & 5) = 5 AS has_click_and_purchase FROM agg
""".strip(),
    "rel_schema_merge_union": """
SELECT o_orderkey, o_totalprice, 'high' AS tier FROM orders WHERE o_totalprice > 200000
UNION ALL BY NAME
SELECT o_orderkey, NULL::DOUBLE AS o_totalprice, 'low' AS tier FROM orders WHERE o_totalprice <= 200000
""".strip(),
}


# ---- composite relational suites (driver-window consolidation) ---------------
# The driver verifies only the first 50 queries() entries; the 18 individual
# rel_* parity oracles above are re-wrapped here into 4 UNION-tagged suites on
# a shared (part, k1, s1, d1, d2) schema, mirroring operators/relational.py's
# *_suite functions branch for branch. Each branch selects FROM the UNCHANGED
# per-operator SQL so the verified semantics are identical.

_NULL_K1 = "NULL::BIGINT"
_NULL_S1 = "NULL::VARCHAR"
_NULL_D = "NULL::DOUBLE"


def _composite_sql(parts: list[tuple[str, str, str, str, str, str]]) -> str:
    selects = []
    for tag, name, k1, s1, d1, d2 in parts:
        selects.append(
            f"SELECT '{tag}' AS part, {k1} AS k1, {s1} AS s1, "
            f"{d1} AS d1, {d2} AS d2 FROM ({RELATIONAL_SQL[name]})"
        )
    return "\nUNION ALL\n".join(selects)


COMPOSITE_RELATIONAL_SQL: dict[str, str] = {
    "rel_scan_set_suite": _composite_sql([
        ("scan", "rel_select_project_filter", "l_orderkey::BIGINT",
         "l_partkey::VARCHAR", "l_quantity::DOUBLE", "l_extendedprice::DOUBLE"),
        ("interval", "rel_interval_filter", "o_orderkey::BIGINT",
         "o_custkey::VARCHAR", "epoch_ms(o_orderdate)::DOUBLE", _NULL_D),
        ("union_tier", "rel_schema_merge_union", "o_orderkey::BIGINT",
         "tier", "o_totalprice::DOUBLE", _NULL_D),
    ]),
    "rel_join_suite": _composite_sql([
        ("join_groupby", "rel_join_groupby_view", "c_custkey::BIGINT",
         "c_name", "n_orders::DOUBLE", "total_spent::DOUBLE"),
        ("enrich", "rel_enrichment_join", "o_orderkey::BIGINT",
         "part_names", "o_totalprice::DOUBLE", "n_items::DOUBLE"),
        ("semi", "rel_semi_join_exists", "c_custkey::BIGINT", "c_name",
         _NULL_D, _NULL_D),
        ("anti", "rel_anti_join_guard", "c_custkey::BIGINT", "c_name",
         _NULL_D, _NULL_D),
        ("cooc", "rel_cooccurrence_pairs", "p1::BIGINT", "p2::VARCHAR",
         "weight::DOUBLE", _NULL_D),
    ]),
    "rel_agg_window_suite": _composite_sql([
        ("top1", "rel_top1_per_group", "o_custkey::BIGINT",
         "o_orderkey::VARCHAR", "o_totalprice::DOUBLE", _NULL_D),
        ("quota", "rel_quota_count", "o_custkey::BIGINT", _NULL_S1,
         "n_orders::DOUBLE", _NULL_D),
        ("rollup", "rel_rollup_metrics", _NULL_K1,
         "coalesce(l_returnflag, '(all)') || '/' || coalesce(l_linestatus, '(all)')",
         "n::DOUBLE", "sum_qty::DOUBLE"),
        ("lag", "rel_lag_lead_deltas", "event_id::BIGINT", "user_id::VARCHAR",
         "ms_since_prev::DOUBLE", _NULL_D),
        ("window", "rel_windowed_event_counts", "epoch_ms(window_start)::BIGINT",
         "event_type", "n::DOUBLE", "total_value::DOUBLE"),
    ]),
    "rel_scalar_suite": _composite_sql([
        ("level", "rel_level_curve", "event_id::BIGINT", _NULL_S1,
         "level::DOUBLE", _NULL_D),
        ("bitmask", "rel_bitmask_ops", "user_id::BIGINT",
         "has_click_and_purchase::VARCHAR", "mask::DOUBLE", _NULL_D),
        ("json", "rel_json_extract", "event_id::BIGINT", _NULL_S1,
         "k::DOUBLE", _NULL_D),
        ("scalar", "rel_scalar_funcs", "o_orderkey::BIGINT",
         # concat_ws (null-SKIPPING) mirrors the engine's F.concat_ws — '||'
         # would null-propagate and break value parity on any NULL piece
         "concat_ws('|', order_url, prio_b64, strftime(order_month, '%Y-%m-%d'))",
         "days_since_epoch_start::DOUBLE", _NULL_D),
        ("validate", "rel_validate_rows", "p_partkey::BIGINT",
         "name_ok::VARCHAR || '|' || price_ok::VARCHAR || '|' || "
         "size_ok::VARCHAR || '|' || valid::VARCHAR", _NULL_D, _NULL_D),
    ]),
}
