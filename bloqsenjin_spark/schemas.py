"""Explicit StructType schemas for every engine table.

The reference declares all schemas as DDL strings in code with no inference
(/root/reference/pkg/db/relational.go:16-19, internal/models/bloq.go:50-96);
we keep the same fixed-schema discipline. ``pages`` shape is authoritative
per BASELINE.json:15.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- input corpus -----------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---- derived: documents with deterministic docIDs + token stats -------------
DOCS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("dl", T.LongType(), False),  # token count (doc length)
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---- inverted index ----------------------------------------------------------
# One row per (term, shard, block). Blocks are doc-range aligned across terms
# (config.BLOCK_DOCS) so block-level pruning can sum upper bounds per block_id.
POSTINGS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        # varint(delta(doc_ids within block)) and varint(tfs), NumPy codecs.
        T.StructField("doc_deltas", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("block_max_tf", T.IntegerType(), False),
        # max BM25 contribution of this term over docs in the block (pinned
        # k1/b/idf at build time) — the block-max WAND skip bound.
        T.StructField("block_max_score", T.DoubleType(), False),
        # positional payload (IndexConfig.positions=True builds only): per doc
        # in doc order, this term's token positions, segmented delta+varint
        # (codec.segmented_delta_encode; tfs give the segment lengths). NULL
        # in positionless builds — BM25 scoring never touches it.
        T.StructField("positions", T.BinaryType(), True),
    ]
)

TERM_STATS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),  # collection frequency
        T.StructField("idf", T.DoubleType(), False),
    ]
)

CORPUS_STATS = T.StructType(
    [
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("avgdl", T.DoubleType(), False),
        T.StructField("n_tokens", T.LongType(), False),
    ]
)

# ---- build lineage / resumability (analog of the reference's KV pagination
# bookkeeping, /root/reference/pkg/pages/pages.go:54-86) ----------------------
CHECKPOINTS = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # 'done'
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_postings", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

BUILD_METRICS = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_terms", T.LongType(), False),
        T.StructField("n_blocks", T.LongType(), False),
        T.StructField("n_postings", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

# ---- query set (FIXTURES.md §2) ---------------------------------------------
QUERIES = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("mode", T.StringType(), False),  # conjunctive|disjunctive
        T.StructField("k", T.IntegerType(), False),
    ]
)

TOPK_RESULT = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
