"""Varint/delta codec: exact roundtrips, edge values, property tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bloqsenjin_spark.functions.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""
    assert delta_decode(b"").size == 0


def test_known_values():
    # 0→00, 127→7f, 128→80 01, 300→ac 02 (classic LEB128 vectors)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@pytest.mark.parametrize(
    "vals",
    [
        [0],
        [1, 2, 3],
        [127, 128, 129],
        [2**7 - 1, 2**7, 2**14 - 1, 2**14, 2**21, 2**28, 2**35],
        [2**53 - 1, 2**53, 2**53 + 1],  # float-log2 precision edge
        [2**62, 2**63 - 1, 2**63, 2**64 - 1],
        [0, 0, 0],
    ],
)
def test_varint_roundtrip_edges(vals):
    a = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


def test_power_of_two_boundaries():
    # every 2^i and 2^i ± 1 up to 64 bits
    vals = []
    for i in range(64):
        vals += [max(0, (1 << i) - 1), 1 << i, (1 << i) + 1]
    a = np.array([v % (2**64) for v in vals], dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varint_roundtrip_property(vals):
    a = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(a)) == a).all()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=2**20),
)
def test_delta_roundtrip_property(gaps, base_off):
    ids = np.cumsum(np.array(gaps, dtype=np.int64)) + base_off
    base = int(ids[0]) - gaps[0]  # any base ≤ first id
    buf = delta_encode(ids, base=base)
    assert (delta_decode(buf, base=base) == ids).all()


def test_fixture_postings_a():
    """FIXTURES.md §3: postings for 'a' = [(0,1),(2,3),(5,1),(7,1)]."""
    ids = np.array([0, 2, 5, 7], dtype=np.int64)
    tfs = np.array([1, 3, 1, 1], dtype=np.uint64)
    assert (delta_decode(delta_encode(ids, base=0), base=0) == ids).all()
    assert (varint_decode(varint_encode(tfs)) == tfs).all()


def test_compression_is_compact():
    ids = np.arange(0, 100_000, 7, dtype=np.int64)
    buf = delta_encode(ids, base=0)
    assert len(buf) == ids.size  # gap 7 fits one byte each


def test_varint_chunks_equals_per_segment_encode():
    """Round-8 encode amortizer: varint_encode_chunks over a concatenated
    stream is byte-identical to per-segment varint_encode, for any segment
    shape including empty segments (LEB128 concatenation stability)."""
    from bloqsenjin_spark.functions.codec import varint_encode_chunks

    rng = np.random.default_rng(5)
    for _ in range(200):
        n_seg = int(rng.integers(1, 12))
        segs = rng.integers(0, 9, n_seg)
        vals = rng.integers(
            0, 1 << int(rng.integers(1, 63)), int(segs.sum())
        ).astype(np.uint64)
        chunks = varint_encode_chunks(vals, segs)
        assert len(chunks) == n_seg
        off = 0
        for length, chunk in zip(segs, chunks):
            assert chunk == varint_encode(vals[off:off + int(length)])
            off += int(length)
    assert varint_encode_chunks(np.zeros(0, np.uint64), np.array([0, 0])) \
        == [b"", b""]


def test_varint_chunks_seg_sum_mismatch_raises():
    """Round-9 guard (round-8 ADVICE): a seg_lengths/values size mismatch
    must fail loudly — an undersum used to silently drop trailing values
    from every blob, an oversum died with a cryptic IndexError."""
    import pytest

    from bloqsenjin_spark.functions.codec import varint_encode_chunks

    vals = np.arange(5, dtype=np.uint64)
    with pytest.raises(ValueError, match="seg_lengths sum"):
        varint_encode_chunks(vals, np.array([2, 2]))  # undersum
    with pytest.raises(ValueError, match="seg_lengths sum"):
        varint_encode_chunks(vals, np.array([3, 3]))  # oversum


def test_batched_block_encode_matches_reference():
    """The whole-batch vectorized posting encoder (_postings_batches.emit)
    is BYTE-identical to the per-block reference (_encode_group), for
    positional and positionless builds and regardless of where Arrow cuts
    the batch."""
    import pandas as pd

    from bloqsenjin_spark.config import IndexConfig
    from bloqsenjin_spark.functions import bm25
    from bloqsenjin_spark.operators import postings as P

    rng = np.random.default_rng(7)
    cfg = IndexConfig(docs_per_shard=64, block_docs=16, positions=True)
    avgdl = 7.3
    rows = []
    for term in ["a", "b", "cc"]:
        for shard in [0, 1, 3]:
            docs = np.sort(rng.choice(
                np.arange(shard * 64, shard * 64 + 64),
                size=int(rng.integers(1, 50)), replace=False))
            for d in docs:
                tf = int(rng.integers(1, 6))
                pos = np.sort(rng.choice(200, size=tf,
                                         replace=False)).astype(np.int64)
                rows.append((term, shard, int(d), tf,
                             float(rng.integers(3, 40)),
                             float(rng.random() + 0.1), pos))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    pdf = pd.DataFrame(rows, columns=["term", "shard", "doc_id", "tf",
                                      "dl", "idf", "pos"])
    cols = [f.name for f in P.schemas.POSTINGS.fields]

    def reference(pdf, cfg, positional):
        t = pdf["term"].to_numpy()
        sh = pdf["shard"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy().astype(np.int64)
        contrib = pdf["idf"].to_numpy() * bm25.tf_component_np(
            tfs.astype(float), pdf["dl"].to_numpy().astype(float),
            avgdl, cfg.k1, cfg.b)
        pos = pdf["pos"].to_numpy() if positional else None
        change = np.flatnonzero((t[1:] != t[:-1]) | (sh[1:] != sh[:-1])) + 1
        bounds = np.concatenate(([0], change, [len(pdf)]))
        out = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            out.extend(P._encode_group(
                t[s], int(sh[s]), doc_ids[s:e], tfs[s:e], contrib[s:e],
                pos[s:e] if positional else None, cfg))
        return pd.DataFrame(out, columns=cols)

    run = P._postings_batches(cfg, avgdl)
    got = pd.concat(list(run(iter([pdf]))), ignore_index=True)
    want = reference(pdf, cfg, True)
    for col in cols:
        assert got[col].tolist() == want[col].tolist(), col

    # positionless
    cfg2 = IndexConfig(docs_per_shard=64, block_docs=16, positions=False)
    run2 = P._postings_batches(cfg2, avgdl)
    got2 = pd.concat(list(run2(iter([pdf.drop(columns=["pos"])]))),
                     ignore_index=True)
    want2 = reference(pdf, cfg2, False)
    for col in cols:
        assert got2[col].tolist() == want2[col].tolist(), col

    # Arrow-cut invariance (the stitched tail-run carry)
    key = ["term", "shard", "block_id"]
    for cut in (7, 23, 57):
        parts = [pdf.iloc[:cut], pdf.iloc[cut:]]
        outc = pd.concat(list(run(iter(parts))), ignore_index=True)
        a = outc.sort_values(key).reset_index(drop=True)
        b = got.sort_values(key).reset_index(drop=True)
        for col in cols:
            assert a[col].tolist() == b[col].tolist(), (cut, col)


def test_leb128_canonical_at_float_boundaries():
    """Regression (round-8 review): float64-log2 over-rounding emitted a
    non-canonical trailing 0x00 for values just below powers of two
    ≥ 2^54. Pin byte equality to a scalar reference LEB128 across the
    boundary neighborhoods and random large values."""
    from bloqsenjin_spark.functions.codec import varint_encode_chunks

    def ref_leb(x: int) -> bytes:
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            out.append(b | (0x80 if x else 0))
            if not x:
                return bytes(out)

    vals = [0, 1, 127, 128]
    for k in range(50, 64):
        vals += [(1 << k) - 2, (1 << k) - 1, 1 << k, (1 << k) + 1]
    vals.append((1 << 64) - 1)
    rng = np.random.default_rng(11)
    vals += [int(x) for x in rng.integers(0, 1 << 62, 50, dtype=np.uint64)]
    arr = np.array(vals, dtype=np.uint64)
    want = b"".join(ref_leb(x) for x in vals)
    assert varint_encode(arr) == want
    chunks = varint_encode_chunks(arr, np.ones(arr.size, np.int64))
    assert b"".join(chunks) == want
    assert (varint_decode(want) == arr).all()
