"""Multimodal binary pipeline: the REAL pure-NumPy BMP decode kernel
(roundtrip, padding, row order, luma, resize) plus the Spark plumbing —
all library-free (the container has no PIL; the BMP path must not need it).
"""

from __future__ import annotations

import numpy as np
import pytest

from bloqsenjin_spark.operators import multimodal as M


def _pattern(doc_id: int, h: int = 6, w: int = 8) -> np.ndarray:
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    return ((doc_id * 7 + 13 * i + 31 * j) % 256).astype(np.uint8)


def test_bmp_roundtrip_random_shapes():
    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (6, 8), (5, 7), (3, 2), (16, 33), (2, 127)]:
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = M._decode_bmp(M.encode_bmp(rgb))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, rgb)  # incl. odd widths → row padding


def test_bmp_topdown_and_bad_payloads():
    import struct

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = bytearray(M.encode_bmp(rgb))
    # flip to top-down (negative height) and re-order the pixel rows
    h = struct.unpack_from("<i", blob, 22)[0]
    struct.pack_into("<i", blob, 22, -h)
    stride = (3 * 3 + 3) & ~3
    rows = np.frombuffer(bytes(blob[54:]), dtype=np.uint8).reshape(h, stride)
    blob[54:] = rows[::-1].tobytes()
    assert np.array_equal(M._decode_bmp(bytes(blob)), rgb)

    with pytest.raises(ValueError, match="not a BMP"):
        M._decode_bmp(b"PNG whatever")
    bad = bytearray(M.encode_bmp(rgb))
    struct.pack_into("<H", bad, 28, 8)  # bpp=8
    with pytest.raises(ValueError, match="unsupported BMP"):
        M._decode_bmp(bytes(bad))


def test_gray_luma_and_resize():
    # gray input: luma is the identity
    v = _pattern(5)
    rgb = np.repeat(v[:, :, None], 3, axis=2)
    assert np.array_equal(M._gray_u8(rgb), v)
    # PIL L convention on a color pixel: (299R + 587G + 114B) // 1000
    px = np.array([[[200, 100, 50]]], dtype=np.uint8)
    assert M._gray_u8(px)[0, 0] == (200 * 299 + 100 * 587 + 50 * 114) // 1000
    # nearest-neighbor resize: exact index sampling
    g = _pattern(1, h=6, w=8)
    r = M._nearest_resize(g, (4, 3))  # (width, height)
    assert r.shape == (3, 4)
    yi = np.arange(3) * 6 // 3
    xi = np.arange(4) * 8 // 4
    assert np.array_equal(r, g[yi][:, xi])


def test_decode_image_real_path_without_pil(spark):
    """The real decode path must run end-to-end in this container (no PIL):
    synthetic BMPs → decode_image → exact expected pixels."""
    docs = spark.createDataFrame([(d,) for d in range(7)], "doc_id long")
    assets = M.synthetic_bmp_assets(docs)
    out = {r["asset_id"]: np.asarray(r["pixels"], dtype=np.float32)
           for r in M.decode_image(assets, size=None).collect()}
    assert len(out) == 7
    for d in range(7):
        want = (_pattern(d).astype(np.float32) / np.float32(255.0)).ravel()
        assert np.array_equal(out[d], want)
    # resized variant: 64×64 nearest-neighbor of the same grid
    r64 = {r["asset_id"]: np.asarray(r["pixels"])
           for r in M.decode_image(assets, size=(64, 64)).collect()}
    g = _pattern(3)
    yi = np.arange(64) * 6 // 64
    xi = np.arange(64) * 8 // 64
    want = (g[yi][:, xi].astype(np.float32) / np.float32(255.0)).ravel()
    assert np.array_equal(np.asarray(r64[3], dtype=np.float32), want)


def test_decode_image_stats_matches_numpy(spark):
    docs = spark.createDataFrame([(d,) for d in range(5)], "doc_id long")
    got = {
        r["asset_id"]: (r["height"], r["width"], r["px_sum"], r["px_wsum"])
        for r in M.decode_image_stats(M.synthetic_bmp_assets(docs)).collect()
    }
    for d in range(5):
        flat = _pattern(d).astype(np.int64).ravel()
        idx = np.arange(flat.size)
        assert got[d] == (6, 8, int(flat.sum()), int((flat * idx).sum()))


def test_decode_image_non_bmp_gate(spark):
    """Non-BMP payloads without PIL: the documented NotImplementedError gate,
    raised per payload inside the task."""
    if M.HAS_PIL:  # pragma: no cover
        pytest.skip("PIL present — gate not reachable")
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    assets = M.assets_from_documents(docs)  # utf-8 text payloads, not BMP
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError"):
        M.decode_image(assets).collect()
