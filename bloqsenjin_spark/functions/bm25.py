"""BM25 scoring math — one definition, three consumers.

The same closed form is expressed (a) as Catalyst Column expressions for the
brute-force DataFrame scorer, (b) as NumPy for the index-side block-max/WAND
scorer, and (c) as a SQL fragment for the DuckDB oracle. Keeping all three in
one module is the rank-identity defense: any drift is a one-file diff.

  idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )
  tfc(tf, dl) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
  score(q, d) = Σ_{t ∈ q} idf(t) * tfc(tf(t,d), dl(d))

Same math family as the reference's only analytic expression, the log-bucketed
level curve floor(a*log2(k*hours))+1 (/root/reference/internal/models/
profile.go:659-697) — all Catalyst built-ins, no UDF needed for scoring.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from bloqsenjin_spark.config import BM25_B, BM25_K1


# ---- Catalyst ----------------------------------------------------------------
def idf_col(df_col: Column, n_docs: Column | int) -> Column:
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return F.log((n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)) + F.lit(1.0))


def tf_component_col(tf: Column, dl: Column, avgdl: Column | float,
                     k1: float = BM25_K1, b: float = BM25_B) -> Column:
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    return (tf * F.lit(k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / a)
    )


# ---- NumPy --------------------------------------------------------------------
def idf_np(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def tf_component_np(tf: np.ndarray, dl: np.ndarray | float, avgdl: float,
                    k1: float = BM25_K1, b: float = BM25_B) -> np.ndarray:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def max_tf_component(k1: float = BM25_K1) -> float:
    """Supremum of tf_component as tf→∞ and dl→0: (k1+1)·tf/(tf+k1·(1-b)) < k1+1."""
    return k1 + 1.0


# ---- SQL (DuckDB oracle) -------------------------------------------------------
def idf_sql(df_expr: str, n_expr: str) -> str:
    return f"ln(({n_expr} - {df_expr} + 0.5) / ({df_expr} + 0.5) + 1.0)"


def tf_component_sql(tf_expr: str, dl_expr: str, avgdl_expr: str,
                     k1: float = BM25_K1, b: float = BM25_B) -> str:
    return (
        f"({tf_expr} * {k1 + 1.0}) / "
        f"({tf_expr} + {k1} * ({1.0 - b} + {b} * {dl_expr} / {avgdl_expr}))"
    )
