"""Deterministic sampling for training-data pipelines.

A 10^12-doc pipeline can't use RNG-state sampling (not reproducible across
retries, executors, or engines). These operators derive each row's sampling
coordinate from a cryptographic hash of its key — the same rows are kept on
every run, on every engine (the md5 rule is mirrored 1:1 in the DuckDB
oracle), and resume/retry is automatically consistent.

Rule: keep(doc) ⇔ first-8-hex-chars(md5(salt ‖ doc_id)) < threshold(stratum),
where threshold = rate scaled to the 32-bit hex space. Lowercase-hex string
comparison is monotone with the numeric value, so no engine-specific
hex→int conversion is needed anywhere.

Reference shape: the reference samples nothing (its DAL always reads full
relations); this is training-data tooling beyond the reference, like the
dedup/quality operators (SURVEY.md 'beyond the reference').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_to_hex_threshold(rate: float) -> str:
    """rate ∈ [0,1] → 8-char lowercase hex threshold in the 2^32 space.
    Shared with the oracle builder so both engines compare against the
    IDENTICAL string.

    rate ≥ 1.0 returns the sentinel ``'g'``: every 8-hex-char coordinate
    compares < 'g' ('f' < 'g' lexicographically), so full-rate strata keep
    ALL rows — with a strict '<' against 'ffffffff' a doc whose md5 prefix
    is exactly ffffffff would be dropped even at rate 1.0 (~1 per 2^32 keys
    — material at 10^12-doc scale). One helper, so the engine and the
    DuckDB oracle share the sentinel too."""
    r = min(max(float(rate), 0.0), 1.0)
    if r >= 1.0:
        return "g"
    return format(min(int(r * (1 << 32)), (1 << 32) - 1), "08x")


def _coord(id_col: str, salt: str):
    return F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )


def deterministic_sample(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by key hash. Changing
    ``salt`` draws an independent sample; equal salts give NESTED samples
    (rate 0.1 ⊆ rate 0.5 — the property that makes staged scale-up runs use
    supersets of each other's data, property-tested)."""
    return docs.where(_coord(id_col, salt) < rate_to_hex_threshold(rate))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling — the standard rebalancing move
    (downsample over-represented languages/domains) as one Catalyst filter:
    keep(doc) ⇔ hash-coordinate < threshold(rates[stratum], else
    ``default_rate``). No shuffle, no RNG, full codegen; identical keep-set
    on every run and engine."""
    thr = F.coalesce(
        *([F.create_map(
            *[x for s, r in sorted(rates.items())
              for x in (F.lit(s), F.lit(rate_to_hex_threshold(r)))]
        )[F.col(strata_col)]] if rates else []),
        F.lit(rate_to_hex_threshold(default_rate)),
    )
    return docs.where(_coord(id_col, salt) < thr)
