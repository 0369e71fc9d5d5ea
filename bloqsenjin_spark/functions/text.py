"""Text extraction + tokenization.

``extract_text`` is THE reference extractor for this engine: the pinned,
deterministic html→text normalization whose output must be byte-identical per
url across runs and cluster sizes (BASELINE.json:15). The Go reference has no
HTML pipeline (its closest analog is the image multipart pipeline,
/root/reference/pkg/image/image.go:41-135), so the spec is frozen here and in
the golden fixtures of tests/test_extraction.py — change either and the
extraction-invariant gate fails.

Spec (applied in this exact order):
  1. UTF-8 decode, invalid bytes → U+FFFD.
  2. Strip <script>/<style>/<noscript> elements including their content
     (case-insensitive, across newlines).
  3. Strip HTML comments ``<!-- ... -->``.
  4. Replace every remaining tag ``<...>`` with a single space.
  5. Decode HTML entities (``html.unescape``: named, decimal, hex).
  6. Collapse every whitespace run to one ASCII space; strip ends.

Plain text with no markup passes through unchanged (so the
``documents.parquet`` → ``pages`` mapping, html := encode(text), round-trips
identically — FIXTURES.md §1).

Tokenization: lowercase, split on runs of non-[a-z0-9], drop empties. The one
regex (config.TOKEN_SPLIT_REGEX) is shared with the DuckDB oracle SQL.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from bloqsenjin_spark.config import TOKEN_SPLIT_REGEX

_SCRIPTS = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_TAGS = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")


def extract_text_py(html_bytes: bytes | None) -> str | None:
    """Pure-Python reference implementation (single value)."""
    if html_bytes is None:
        return None
    s = bytes(html_bytes).decode("utf-8", errors="replace")
    s = _SCRIPTS.sub(" ", s)
    s = _COMMENTS.sub(" ", s)
    s = _TAGS.sub(" ", s)
    s = _html.unescape(s)
    return _WS.sub(" ", s).strip()


# whitespace-normalization trigger: a row WITHOUT any of (non-space
# whitespace char, double space, leading/trailing space) is a fixed point of
# `_WS.sub(" ", s).strip()` — checked with one search instead of a full
# substitution pass (round 9, guide §4.2)
_WS_TRIGGER = re.compile(r"[^\S ]|  |^ | $")


def _extract_one(x: str) -> str:
    """Spec steps 2–6 on one decoded string, with fast paths: rows without
    '<' are fixed points of the three tag regexes, rows without '&' are
    fixed points of entity decoding, rows without _WS_TRIGGER are fixed
    points of whitespace collapse + strip — plain web text (the common
    case) skips every regex substitution. Conditions are exact
    fixed-point tests, so output is byte-identical to the unconditional
    pipeline (pinned by the golden extraction fixtures)."""
    if "<" in x:
        x = _SCRIPTS.sub(" ", x)
        x = _COMMENTS.sub(" ", x)
        x = _TAGS.sub(" ", x)
    if "&" in x:
        x = _html.unescape(x)
    if _WS_TRIGGER.search(x):
        x = _WS.sub(" ", x).strip()
    return x


def _extract_series(html: pd.Series) -> pd.Series:
    # Entity decoding has no pandas vectorized equivalent; one fused map
    # applies the whole step-2..6 pipeline per element with fixed-point
    # fast paths (see _extract_one). All of it runs inside one Arrow
    # batch — no per-row Python crossing the JVM edge.
    return html.map(
        lambda b: None if b is None
        else _extract_one(bytes(b).decode("utf-8", "replace"))
    )


from pyspark.sql.types import StringType

extract_text = pandas_udf(_extract_series, returnType=StringType())
extract_text.__doc__ = "Vectorized (Arrow) html:binary → text:string extractor."


def tokens(col: Column | str) -> Column:
    """array<string> of tokens: lowercase, alnum runs, no empties.

    Pure Catalyst expression (split + filter) — stays in whole-stage codegen;
    no UDF in the tokenize hot path.
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(F.lower(c), TOKEN_SPLIT_REGEX)
    return F.filter(arr, lambda x: x != F.lit(""))


def tokenize_py(text: str) -> list[str]:
    """NumPy-oracle-side tokenizer — must agree with ``tokens`` exactly."""
    return [t for t in re.split(TOKEN_SPLIT_REGEX, text.lower()) if t]


# DuckDB-side equivalent, kept adjacent so the three stay in lock-step.
DUCKDB_TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"
)
