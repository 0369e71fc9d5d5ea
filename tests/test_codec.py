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
