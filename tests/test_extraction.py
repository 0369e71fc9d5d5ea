"""Extraction invariant (BASELINE.json:15): byte-identical text per url.

Golden fixtures pin the extractor spec (functions/text.py). The vectorized
pandas UDF must agree with the pure-Python reference byte-for-byte, and plain
text (the documents.parquet mapping) must round-trip unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bloqsenjin_spark.functions.text import _extract_series, extract_text, extract_text_py

GOLDEN: list[tuple[str, bytes, str]] = [
    ("plain", b"hello world", "hello world"),
    ("para", b"<html><body><p>hello world</p></body></html>", "hello world"),
    ("nested", b"<div><b>bold <i>italic</i></b> tail</div>", "bold italic tail"),
    ("entities", b"fish &amp; chips &#233;clair &eacute; &#x41;", "fish & chips \xe9clair \xe9 A"),
    ("script", b"<p>keep</p><script>var x = '<drop>';</script><p>keep2</p>", "keep keep2"),
    ("style", b"a<style type=\"text/css\">p { color: red }</style>b", "a b"),
    ("noscript", b"x<noscript><p>no js</p></noscript>y", "x y"),
    ("comment", b"a<!-- hidden <b>bold</b> -->b", "a b"),
    ("ws_collapse", b"a \t\r\n  b\n\nc", "a b c"),
    ("leading_trailing", b"  <p> padded </p>  ", "padded"),
    ("unicode", "héllo wörld 中文 🎉".encode(), "héllo wörld 中文 🎉"),
    ("invalid_utf8", b"ok \xff\xfe bytes", "ok �� bytes"),
    ("empty", b"", ""),
    ("only_tags", b"<html><body></body></html>", ""),
    ("attr_gt", b'<a href="x">link</a>', "link"),
    ("br_tags", b"line1<br>line2<br/>line3", "line1 line2 line3"),
    ("case_script", b"A<SCRIPT>drop()</SCRIPT>B", "A B"),
    ("script_multiline", b"A<script>\nmulti\nline\n</script>B", "A B"),
    ("title", b"<html><head><title>t1</title></head><body>body text</body></html>", "t1 body text"),
    ("numeric_entity", b"&#72;&#105;", "Hi"),
    ("amp_literal", b"a &xyzzy; b", "a &xyzzy; b"),
    # html.unescape implements HTML5 prefix-matching: &not is an entity even
    # without a semicolon — pinned spec behavior.
    ("amp_html5_prefix", b"a &notanentity; b", "a \xacanentity; b"),
    ("malformed", b"<p>unclosed <b>bold", "unclosed bold"),
]


def test_golden_python():
    for name, html, want in GOLDEN:
        got = extract_text_py(html)
        assert got == want, f"{name}: {got!r} != {want!r}"


def test_golden_vectorized_matches_python():
    s = pd.Series([h for _, h, _ in GOLDEN])
    out = _extract_series(s)
    for (name, html, want), got in zip(GOLDEN, out):
        assert got == want, f"{name}: vectorized {got!r} != {want!r}"
        assert got == extract_text_py(html), name


def test_extraction_udf_on_spark(spark):
    df = spark.createDataFrame(
        [(name, html) for name, html, _ in GOLDEN], "name string, html binary"
    )
    got = {r["name"]: r["t"] for r in df.select("name", extract_text("html").alias("t")).collect()}
    for name, _, want in GOLDEN:
        assert got[name] == want, name


def test_documents_roundtrip_identity(spark):
    """html := encode(text) ⇒ extract(html) == text (FIXTURES.md §1)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = (
        docs.select("doc_id", "text", extract_text(F.encode("text", "utf-8")).alias("e"))
        .where(F.col("e") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_null_passthrough():
    out = _extract_series(pd.Series([None, b"x"]))
    assert out[0] is None and out[1] == "x"
