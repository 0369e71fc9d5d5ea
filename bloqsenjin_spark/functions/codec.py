"""Posting-list compression: delta + LEB128 varint, vectorized in NumPy.

Direct descendant of the reference's bit-packing instinct (the 2048-bit page
bitset, /root/reference/pkg/pages/bitset.go:3-17) applied to the standard IR
layout: docIDs within a block are strictly increasing → store gaps; gaps and
tfs are small → varint. Everything here is array-at-a-time NumPy so the
encode/decode cost inside applyInPandas/mapInPandas stays off the per-row
Python path (BASELINE.json:15).

Layout per encoded array: plain LEB128 stream, little-endian 7-bit groups,
high bit = continuation. Deltas are ``doc_ids[0] - block_base`` then
successive gaps (so every value is small and block-local).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # 64 bits / 7


def _leb128_stream(v: np.ndarray) -> tuple:
    """THE shared LEB128 encode kernel → (byte stream uint8 array, bytes
    per value). One implementation so every encoder (varint_encode,
    varint_encode_chunks and therefore delta/segmented/doc_lens blobs)
    stays byte-identical by construction.

    Bit widths come from float64 log2 with BOTH rounding directions
    corrected (float log2 can round either way within 1 ulp above 2^53):
    under-round would drop a needed byte (corruption); over-round emitted
    a non-canonical trailing 0x00 byte for values just below a power of
    two ≥ 2^54 — harmless to our own decoder but wrong LEB128."""
    # bytes needed per value: ceil(bit_length/7), min 1
    bits = np.zeros(v.shape, dtype=np.int64)
    nz = v > 0
    bits[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
    # under-round: the value doesn't fit in `bits` bits → one more
    too_low = v >= (np.uint64(1) << np.minimum(bits, 63).astype(np.uint64))
    bits[too_low & (bits < 64)] += 1
    # over-round: the value already fits in bits−1 bits → one fewer
    hi = np.maximum(bits - 1, 0)
    too_high = nz & (hi > 0) & (hi < 64) & (
        v < (np.uint64(1) << np.minimum(hi, 63).astype(np.uint64))
    )
    bits[too_high] -= 1
    nbytes = np.maximum((bits + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for i in range(int(nbytes.max())):
        mask = nbytes > i
        idx = starts[mask] + i
        chunk = (v[mask] >> np.uint64(7 * i)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > i).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out, nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized: one pass per byte position."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    out, _nbytes = _leb128_stream(v)
    return out.tobytes()


def varint_encode_chunks(values: np.ndarray,
                         seg_lengths: np.ndarray) -> list:
    """LEB128-encode a CONCATENATED value stream and return one bytes blob
    per segment — byte-identical to calling varint_encode on each segment
    (LEB128 is per-value, so concatenation is boundary-stable;
    property-tested), but ONE vectorized pass for any number of segments.

    This is the posting-encode amortizer: the build's per-(term, shard)
    groups split into millions of ≤block_docs blocks, and per-block NumPy
    calls on tiny arrays are dispatch-overhead-dominated — encoding every
    block of an Arrow batch in one pass moves the cost back to O(values).
    """
    seg = np.asarray(seg_lengths, dtype=np.int64)
    v = np.asarray(values, dtype=np.uint64)
    if int(seg.sum()) != v.size:
        # loud contract guard (round-8 ADVICE): an oversum used to surface
        # as a cryptic IndexError in val_ends indexing, an undersum
        # silently DROPPED trailing values from every blob
        raise ValueError(
            f"varint_encode_chunks: seg_lengths sum {int(seg.sum())} != "
            f"len(values) {v.size}"
        )
    if v.size == 0:
        return [b""] * seg.size
    out, nbytes = _leb128_stream(v)
    # per-segment byte ranges: value-index ends → byte ends
    val_ends = np.cumsum(nbytes)
    seg_val_ends = np.cumsum(seg)
    seg_byte_ends = np.where(
        seg_val_ends > 0, val_ends[np.maximum(seg_val_ends - 1, 0)], 0
    )
    # zero-length segments fall out naturally: end == previous end ⇒ empty
    seg_byte_starts = np.concatenate(([0], seg_byte_ends[:-1]))
    buf = out.tobytes()
    return [
        buf[s:e] for s, e in zip(seg_byte_starts.tolist(),
                                 seg_byte_ends.tolist())
    ]


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode an LEB128 stream to uint64. Vectorized via terminator scan.

    Fast path (round 9): when no byte carries the continuation bit, every
    value is single-byte and the stream IS the value array — one reduction
    instead of the terminator-scan machinery. Posting gaps and tfs are
    overwhelmingly < 128, and the serving tier decodes ~2 tiny blobs per
    candidate block, so this dominates its per-query profile
    (OPTIMIZATION_r09.md §serving)."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros(0, dtype=np.uint64)
    if int(raw.max()) < 0x80:
        return raw.astype(np.uint64)
    ends = np.flatnonzero(raw < 0x80)
    starts = np.concatenate(([0], ends[:-1] + 1))
    nbytes = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    for i in range(int(nbytes.max())):
        mask = nbytes > i
        b = raw[starts[mask] + i].astype(np.uint64)
        vals[mask] |= (b & np.uint64(0x7F)) << np.uint64(7 * i)
    return vals


def delta_encode(sorted_ids: np.ndarray, base: int = 0) -> bytes:
    """Encode a strictly-increasing int array as varint gaps from ``base``."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    gaps = np.empty(a.shape, dtype=np.uint64)
    gaps[0] = np.uint64(a[0] - base)
    if a.size > 1:
        gaps[1:] = np.diff(a).astype(np.uint64)
    return varint_encode(gaps)


def delta_decode(buf: bytes, base: int = 0) -> np.ndarray:
    """Inverse of delta_encode → int64 array."""
    gaps = varint_decode(buf).astype(np.int64)
    if gaps.size == 0:
        return gaps
    gaps[0] += base
    return np.cumsum(gaps)


def segmented_delta_encode(flat: np.ndarray, seg_lengths: np.ndarray) -> bytes:
    """Concatenated per-segment delta streams in ONE varint pass.

    ``flat`` is the concatenation of per-segment ascending int arrays (e.g.
    all token positions of a term in a block, doc by doc); ``seg_lengths``
    gives each segment's element count. Each segment's first value is stored
    absolute and the rest as gaps, so segments decode independently — this is
    the positional-postings layout (positions restart at 0 per document).
    """
    f = np.asarray(flat, dtype=np.int64)
    if f.size == 0:
        return b""
    g = np.empty(f.shape, dtype=np.int64)
    g[0] = f[0]
    g[1:] = f[1:] - f[:-1]
    seg = np.asarray(seg_lengths, dtype=np.int64)
    seg = seg[seg > 0]
    starts = np.concatenate(([0], np.cumsum(seg)[:-1]))
    g[starts] = f[starts]
    return varint_encode(g.astype(np.uint64))


def segmented_delta_decode(buf: bytes, seg_lengths: np.ndarray) -> np.ndarray:
    """Inverse of segmented_delta_encode → flat int64 array.

    Fully vectorized: one cumsum over the whole stream, then subtract each
    segment's carried-in prefix (the cumsum value just before its start).
    """
    g = varint_decode(buf).astype(np.int64)
    if g.size == 0:
        return g
    cs = np.cumsum(g)
    seg = np.asarray(seg_lengths, dtype=np.int64)
    seg = seg[seg > 0]
    starts = np.concatenate(([0], np.cumsum(seg)[:-1]))
    prev = np.where(starts > 0, cs[starts - 1], 0)
    return cs - np.repeat(prev, seg)
