"""Text analysis for training-data curation: quality scoring, language ID,
token counting, document fingerprinting. All pure Catalyst expressions (no
UDF, full codegen) with exact DuckDB oracle mirrors in oracle.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloqsenjin_spark.functions.text import tokens

# tiny pinned marker-word lists (shared verbatim with the oracle SQL)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "of", "and", "to", "is", "in", "it", "that", "for",
)


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars_seen): whitespace/alnum tokenization count."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("n_chars_seen"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, mean_token_len, stopword_ratio, alnum_ratio, quality)

    quality ∈ [0,1]: penalize too-short docs, extreme mean token length,
    zero stopwords, low alnum density — the standard cheap web-text filters.
    Deterministic closed form; mirrored 1:1 in oracle.textstats SQL.
    """
    t = tokens(F.col(text_col))
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_tok = F.size(t).cast("double")
    alnum = F.length(F.regexp_replace(F.lower(txt), "[^a-z0-9]", "")).cast("double")
    total = F.length(txt).cast("double")
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))).cast("double")
    mean_len = F.when(n_tok > 0, alnum / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    alnum_ratio = F.when(total > 0, alnum / total).otherwise(F.lit(0.0))
    quality = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * F.lit(0.25)
        + F.when((mean_len >= 3.0) & (mean_len <= 10.0), 0.25).otherwise(0.0)
        + F.least(stop_ratio / F.lit(0.05), F.lit(1.0)) * F.lit(0.25)
        + alnum_ratio * F.lit(0.25)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alnum_ratio.alias("alnum_ratio"),
        quality.alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax of marker-word hit counts;
    ties and zero-hit docs → 'und' (undetermined). Deterministic: languages
    evaluated in sorted order, strict-greater wins."""
    t = tokens(F.col(text_col))

    def _hit_counter(markers: tuple[str, ...]):
        # closure factory: F.filter inspects the lambda's arity, so the marker
        # list must NOT appear as a defaulted second parameter
        return F.size(F.filter(t, lambda x: x.isin(*markers)))

    cols = []
    for lang in sorted(LANG_MARKERS):
        hits = _hit_counter(LANG_MARKERS[lang])
        cols.append(F.struct(hits.cast("long").alias("hits"), F.lit(lang).alias("lang")))
    arr = F.array(*cols)
    best = F.aggregate(
        arr,
        F.struct(F.lit(0).cast("long").alias("hits"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["hits"] > acc["hits"], x).otherwise(acc),
    )
    n_tok = F.size(t).cast("double")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        best["lang"].alias("lang_pred"),
        F.when(n_tok > 0, best["hits"] / n_tok).otherwise(F.lit(0.0)).alias("lang_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp, fp_prefix): md5 of token-normalized text (order-sensitive
    content fingerprint) + 16-hex-char prefix for cheap bucketing."""
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    fp = F.md5(norm)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("fp"),
        F.substring(fp, 1, 16).alias("fp_prefix"),
    )
