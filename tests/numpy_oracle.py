"""Independent single-node BM25 oracle in pure NumPy/Python (SURVEY.md §5.2).

Deliberately written in the most naive way possible — dict-of-dicts postings,
per-query linear scan — so it shares no code path with the engine.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from bloqsenjin_spark.config import BM25_B, BM25_K1

_TOKEN = re.compile("[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return [t for t in _TOKEN.split((text or "").lower()) if t]


def bm25_topk(
    docs: dict[int, str],
    queries: list[tuple[int, list[str], str, int]],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, int, int, float]]:
    """→ [(query_id, rank, doc_id, score)] with score desc, doc_id asc ties."""
    toks = {d: tokenize(t) for d, t in docs.items()}
    n = len(docs)
    avgdl = (sum(len(v) for v in toks.values()) / n) if n else 1.0
    avgdl = avgdl or 1.0
    tf = {d: Counter(v) for d, v in toks.items()}
    df: Counter = Counter()
    for d, c in tf.items():
        df.update(c.keys())

    out = []
    for q in queries:
        # 4-tuples, 5-tuples (+MUST_NOT terms), 6-tuples (+{term: weight})
        qid, terms, mode, k = q[:4]
        negs = set(q[4]) if len(q) > 4 and q[4] else set()
        weights = q[5] if len(q) > 5 and q[5] else {}
        uterms = sorted(set(terms))
        scored = []
        for d in docs:
            hits = [t for t in uterms if tf[d].get(t)]
            if not hits:
                continue
            if mode == "conjunctive" and len(hits) != len(uterms):
                continue
            if negs and any(tf[d].get(t) for t in negs):
                continue
            dl = len(toks[d])
            s = 0.0
            for t in hits:  # sorted term order = deterministic summation
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                f = tf[d][t]
                s += (idf * weights.get(t, 1.0)) * f * (k1 + 1.0) / (
                    f + k1 * (1.0 - b + b * dl / avgdl))
            scored.append((d, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (d, s) in enumerate(scored[:k], start=1):
            out.append((qid, rank, d, s))
    return out
