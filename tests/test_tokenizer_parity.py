"""Round-9 tokenizer-parity gate: the Arrow-native corpus-scan kernel
(operators.postings._arrow_scan / _tokenize_arrow) must produce the SAME
rows as the pinned pandas implementation (SPARK_GRAFT_TOKENIZER=pandas) —
byte-identical token streams, tfs, dls and positions — on the driver corpus
AND on adversarial unicode fixtures (where the arrow path must route rows
through the pinned Python tokenizer itself).
"""

from __future__ import annotations

import os
import re

import pandas as pd
import pytest

from bloqsenjin_spark.operators.postings import _tokenize_arrow, doc_term_freqs

ADVERSARIAL = [
    "Hello WORLD 42",
    "",
    None,
    "   ",
    "ÉLAN café naïve",            # latin-1 accents: separators after lower
    "İstanbul KELVİN",            # U+0130 lowers to 'i' + combining dot
    "Kelvin sign",           # KELVIN SIGN lowers to ascii 'k'
    "straße GROSS ẞ",             # sharp s: lower(ẞ)=ß (non-ascii, separator)
    "ｆｕｌｌｗｉｄｔｈ１２３",      # fullwidth forms are NOT [a-z0-9]
    "mixed ascii and 中文 tokens123",
    "nbsp sep",              # unicode space is a separator
    "ΣΙΓΜΑ ΤΕΛΟΣ",               # final-sigma special casing
    "a1b2c3 A1B2C3",
    "🎉party2026🎉",
    "tab\tand\nnewline tokens",
]


def _pinned(texts):
    """The pinned authority: pandas str.lower + findall [a-z0-9]+."""
    out = []
    for i, s in enumerate(pd.Series(texts).fillna("")):
        toks = re.findall("[a-z0-9]+", s.lower())
        out.extend((i, p, t) for p, t in enumerate(toks))
    return sorted(out)


def test_tokenize_arrow_adversarial_parity():
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = pc.fill_null(
        pa.Array.from_pandas(pd.Series(ADVERSARIAL * 5), type=pa.string()), ""
    )
    toks, reps, pos = _tokenize_arrow(txt, True)
    got = sorted(zip(reps.tolist(), pos.tolist(), toks.to_pylist()))
    assert got == _pinned(ADVERSARIAL * 5)


def test_tokenize_arrow_all_ascii_fast_path():
    import pyarrow as pa
    import pyarrow.compute as pc

    rows = ["The Quick 99 brown-fox", "", "a  b   c", "UPPER lower 0x2f"]
    txt = pc.fill_null(pa.Array.from_pandas(pd.Series(rows), type=pa.string()), "")
    toks, reps, pos = _tokenize_arrow(txt, True)
    got = sorted(zip(reps.tolist(), pos.tolist(), toks.to_pylist()))
    assert got == _pinned(rows)


@pytest.mark.parametrize("positions", [False, True])
def test_doc_term_freqs_arrow_vs_pandas_spark(spark, positions):
    """Spark-level: both scan implementations over a real corpus slice +
    adversarial rows yield identical row multisets."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    extra = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(ADVERSARIAL)],
        "doc_id long, text string",
    )
    docs = docs.select("doc_id", "text").unionByName(extra)

    def rows(impl):
        old = os.environ.get("SPARK_GRAFT_TOKENIZER")
        os.environ["SPARK_GRAFT_TOKENIZER"] = impl
        try:
            df = doc_term_freqs(docs, doc_markers=True, positions=positions)
            return sorted(
                (
                    r["doc_id"], r["dl"], r["term"] or "", r["tf"],
                    tuple(r["pos"]) if positions and r["pos"] is not None
                    else None,
                )
                for r in df.collect()
            )
        finally:
            if old is None:
                os.environ.pop("SPARK_GRAFT_TOKENIZER", None)
            else:
                os.environ["SPARK_GRAFT_TOKENIZER"] = old

    assert rows("arrow") == rows("pandas")


@pytest.mark.parametrize("impl", ["arrow", "pandas"])
@pytest.mark.parametrize("positions", [False, True])
def test_doc_term_freqs_terms_filter_equivalence(spark, impl, positions):
    """The kernel-pushed term allow-set (round-9 follow-up: the brute-force
    scan emits query-term rows only) must equal a post-hoc isin filter on
    the unfiltered scan — markers and dl untouched — on BOTH scan
    implementations, positions on and off, incl. non-ascii rows and a term
    set with absent terms."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(ADVERSARIAL)],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)
    terms = ["the", "fast", "customer", "caf", "tokens123", "zzz-absent"]

    old = os.environ.get("SPARK_GRAFT_TOKENIZER")
    os.environ["SPARK_GRAFT_TOKENIZER"] = impl
    try:
        from pyspark.sql import functions as F

        def norm(df):
            return sorted(
                (
                    r["doc_id"], r["dl"], r["term"] or "", r["tf"],
                    tuple(r["pos"]) if positions and r["pos"] is not None
                    else None,
                )
                for r in df.collect()
            )

        pushed = doc_term_freqs(
            docs, doc_markers=True, positions=positions, terms=terms)
        reference = doc_term_freqs(
            docs, doc_markers=True, positions=positions,
        ).where(F.col("term").isNull() | F.col("term").isin(terms))
        assert norm(pushed) == norm(reference)
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_TOKENIZER", None)
        else:
            os.environ["SPARK_GRAFT_TOKENIZER"] = old


def test_postings_plan_keeps_local_sort(spark):
    """Regression (round 9): Catalyst's EliminateSorts removes a partition-
    local sort that sits BELOW a join — the stitched posting builder needs
    the sort directly under its mapInPandas. Pin that the physical plan
    still carries a Sort above the index Exchange."""
    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.plans.build import build_index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, IndexConfig(docs_per_shard=128, block_docs=16))
    plan = idx.postings._jdf.queryExecution().executedPlan().toString()
    assert "Sort" in plan, plan
    # the sort must be above (closer to MapInPandas than) the exchange
    assert plan.index("Sort") < plan.index("Exchange"), plan
