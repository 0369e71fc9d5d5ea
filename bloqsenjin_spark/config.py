"""Engine-wide pinned constants.

Rank-identity across cluster sizes (BASELINE.json north_rule) requires every
scoring-relevant parameter to be pinned here, never inferred at runtime:
BM25 (k1, b), the doc-range shard width, and the block width. The reference
keeps its only tuning constants inline (Redis SCAN page=1000,
/root/reference/internal/db/redis.go:71-77); we centralize instead.
"""

from __future__ import annotations

from dataclasses import dataclass

# BM25 parameters (classic Robertson/Sparck-Jones defaults, pinned).
BM25_K1: float = 1.2
BM25_B: float = 0.75

# Tokenizer: lowercase, split on any non-alphanumeric run, drop empties.
# This single regex is shared by the Spark expression, the NumPy oracle and
# the DuckDB oracle SQL so all three tokenize byte-identically.
TOKEN_SPLIT_REGEX: str = "[^a-z0-9]+"

# Inverted-index physical layout.
# Postings are sharded by contiguous docID range: shard = doc_id // DOCS_PER_SHARD.
# Doc-range sharding bounds every (term, shard) group to at most DOCS_PER_SHARD
# postings — this IS the skew handling for head terms ("the" at 10^12 docs is
# split across ~n_docs/DOCS_PER_SHARD groups instead of one giant group).
# At cluster scale this would be ~4M docs/shard; small here so local test data
# exercises the multi-shard paths.
DOCS_PER_SHARD: int = 1 << 14  # 16384

# Within a shard, postings are cut into *globally doc-range-aligned* blocks:
# block_id = (doc_id % DOCS_PER_SHARD) // BLOCK_DOCS. Alignment across terms is
# what makes block-level pruning vectorizable (per-block upper bound = sum of
# the query terms' block_max_score at the same block_id) — see operators/topk.py.
BLOCK_DOCS: int = 1024

# Top-k tie-break: score DESC, then doc_id ASC (BASELINE.md:32).
SCORE_ROUND_DECIMALS: int = 4  # only for oracle hash comparison, never ranking


@dataclass(frozen=True)
class IndexConfig:
    k1: float = BM25_K1
    b: float = BM25_B
    docs_per_shard: int = DOCS_PER_SHARD
    block_docs: int = BLOCK_DOCS
    # Positional postings (per-doc token positions, segmented delta+varint in
    # the block blob). Opt-in: BM25 top-k never reads positions, and carrying
    # them costs ~total-token-count extra shuffle volume at build time —
    # phrase queries require an index built with positions=True (Lucene-style
    # per-field opt-in).
    positions: bool = False

    def shard_of(self, doc_id: int) -> int:
        return doc_id // self.docs_per_shard

    def block_of(self, doc_id: int) -> int:
        return (doc_id % self.docs_per_shard) // self.block_docs


DEFAULT_CONFIG = IndexConfig()
