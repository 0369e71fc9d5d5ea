"""Phrase search: index-pruned candidates + exact sequence verification."""

from __future__ import annotations

from bloqsenjin_spark import corpus
from bloqsenjin_spark.config import IndexConfig
from bloqsenjin_spark.operators import wand
from bloqsenjin_spark.plans.build import build_index

CFG = IndexConfig(docs_per_shard=128, block_docs=16)


def _run(spark, docs, phrases):
    idx = build_index(docs, CFG)
    return {
        (r["query_id"], r["doc_id"])
        for r in wand.phrase_match(
            docs, idx.postings, idx.doc_lens, idx.term_stats, idx.avgdl,
            phrases, CFG,
        ).collect()
    }


def test_phrase_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "beta alpha gamma"),          # terms present, order wrong
            (2, "x alpha beta y"),
            (3, "Alpha... BETA!"),            # normalization
            (4, "alpha x beta"),              # not adjacent
            (5, "alpha"),                     # missing term
            (6, ""),
        ],
        "doc_id long, text string",
    )
    got = _run(spark, docs, [(1, "alpha beta")])
    assert got == {(1, 0), (1, 2), (1, 3)}


def test_phrase_vs_python_reference(spark):
    docs_df = corpus.load_table(spark, "/root/testdata/sf0.001", "documents")
    phrases = [(1, "the fast"), (2, "customer order"), (3, "zebra stripes")]
    got = _run(spark, docs_df, phrases)
    import re

    want = set()
    for r in docs_df.collect():
        norm = " " + " ".join(t for t in re.split("[^a-z0-9]+", r["text"].lower()) if t) + " "
        for qid, p in phrases:
            pn = " " + " ".join(t for t in re.split("[^a-z0-9]+", p.lower()) if t) + " "
            if pn in norm:
                want.add((qid, r["doc_id"]))
    assert got == want
    assert any(q == 1 for q, _ in got)  # corpus really contains 'the fast'
    assert not any(q == 3 for q, _ in got)
