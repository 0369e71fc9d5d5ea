"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The image decode path is REAL: 24-bit BI_RGB BMP payloads decode through a
pure-NumPy kernel (_decode_bmp; encode_bmp is the matching writer used to
synthesize payloads at any SF), grayscale + nearest-neighbor resize are
library-free, and decode_image_stats exposes exact integer statistics that a
closed-form SQL oracle value-checks. Only non-BMP codecs (JPEG/PNG/audio)
remain import-gated:

* ``decode_image`` uses the NumPy BMP kernel for BMP payloads everywhere;
  other formats fall back to PIL when importable, else raise
  NotImplementedError per payload (the documented lib gate).
* ``fake_decode_features`` is the deterministic feature-extractor stand-in:
  md5(payload) → 8 float32s in [0,1). Deterministic, library-free, and
  shaped exactly like a real extractor so swapping a model in changes one
  function body, not the pipeline.

Reference analog: the multipart image pipeline (upload → ImageMagick convert
→ 3 fixed-size variants, /root/reference/pkg/image/image.go:41-135) — a
binary-asset transform behind a typed boundary, exactly what mapInPandas over
a binary column is.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, kind string, payload binary, width int, height int"
FEATURE_DIM = 8

try:  # import-try gate: real decoder only if the lib exists
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except Exception:  # noqa: BLE001
    HAS_PIL = False


def assets_from_documents(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Deterministic asset table synthesized from documents: payload :=
    utf-8 bytes of text, kind round-robin over image/audio/video. Used so the
    binary plumbing has real rows to flow through at every SF."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        (F.col(id_col) % 640 + 1).cast("int").alias("width"),
        (F.col(id_col) % 480 + 1).cast("int").alias("height"),
    )


def asset_metadata(assets: DataFrame) -> DataFrame:
    """(asset_id, kind, n_bytes, digest, aspect) — pure Catalyst, no decode."""
    return assets.select(
        "asset_id", "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("digest"),
        (F.col("width") / F.col("height")).alias("aspect"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    d = hashlib.md5(bytes(payload)).digest()
    return (np.frombuffer(d[:FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
            / np.float32(65536.0))


def fake_decode_features(assets: DataFrame) -> DataFrame:
    """(asset_id, features array<float>[8]) via mapInPandas — the Arrow batch
    shape of a real feature extractor, deterministic fake math inside."""
    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_features(p) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id long, features array<float>"
    )


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (bottom-up rows, 4-byte
    row padding). Library-free writer; the inverse of _decode_bmp — used to
    synthesize real image payloads for the real decode path at any SF."""
    import struct

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[..., ::-1].reshape(h, w * 3)  # RGB→BGR
    px = rows[::-1].tobytes()  # bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px),
                       2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(px), 0, 0, 54)
    return hdr + info + px


def _decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP → (H, W, 3) uint8 RGB. Pure NumPy —
    the container has no image library, so this IS the real decode kernel
    for BMP payloads (bottom-up and top-down, padded rows). Other formats
    need PIL (import-gated in decode_image)."""
    import struct

    buf = bytes(payload)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP: bpp={bpp} compression={comp} (24-bit BI_RGB only)"
        )
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        buf, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR→RGB
    if flip:
        img = img[::-1]
    return np.ascontiguousarray(img)


def _gray_u8(rgb: np.ndarray) -> np.ndarray:
    """ITU-R 601-2 integer luma (PIL 'L' convention): (299R+587G+114B)//1000.
    Exactly v for gray inputs (R=G=B=v) — what makes the decode oracle-able."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)


def _nearest_resize(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize of a 2-D array to (width, height) — the
    deterministic, library-free resample."""
    tw, th = size
    h, w = img.shape
    yi = np.arange(th) * h // th
    xi = np.arange(tw) * w // tw
    return img[yi][:, xi]


def decode_image(assets: DataFrame, size: "tuple[int, int] | None" = (64, 64)) -> DataFrame:
    """(asset_id, pixels array<float>): grayscale pixels in [0,1], resized to
    ``size`` (width, height) by nearest-neighbor; size=None keeps native dims.

    REAL decode path: 24-bit BMP payloads decode through the pure-NumPy
    kernel (_decode_bmp — runs everywhere, no libraries); other formats fall
    back to PIL when importable, else raise NotImplementedError per payload
    (the documented lib gate). Reference analog: the upload→ImageMagick
    convert→fixed-size-variants pipeline
    (/root/reference/pkg/image/image.go:41-135)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in it:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if b[:2] == b"BM":
                    g = _gray_u8(_decode_bmp(b))
                elif HAS_PIL:  # pragma: no cover — PIL absent in container
                    from PIL import Image as _I

                    g = np.asarray(_I.open(io.BytesIO(b)).convert("L"),
                                   dtype=np.uint8)
                else:
                    raise NotImplementedError(
                        "non-BMP image decoding requires PIL; not available "
                        "in this container. BMP payloads decode natively; "
                        "use fake_decode_features for pipeline plumbing."
                    )
                if size is not None:
                    g = _nearest_resize(g, size)
                out.append((g.astype(np.float32) / np.float32(255.0)).ravel())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "pixels": out})

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id long, pixels array<float>"
    )


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """(asset_id, height, width, px_sum, px_wsum): exact integer statistics of
    the REAL decoded grayscale at native size — px_sum = Σ v, px_wsum =
    Σ v·(row·width + col). All-integer outputs so the decode kernel is fully
    value-checked against a closed-form SQL oracle (no float tolerance)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for a, p in zip(pdf["asset_id"], pdf["payload"]):
                g = _gray_u8(_decode_bmp(bytes(p))).astype(np.int64)
                h, w = g.shape
                flat = g.ravel()
                idx = np.arange(flat.size, dtype=np.int64)
                rows.append((int(a), h, w, int(flat.sum()),
                             int((flat * idx).sum())))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "height", "width", "px_sum", "px_wsum"],
            )

    return assets.select("asset_id", "payload").mapInPandas(
        run,
        schema="asset_id long, height int, width int, px_sum long, px_wsum long",
    )


def synthetic_bmp_assets(docs: DataFrame, width: int = 8, height: int = 6,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image payloads at any SF: one 24-bit BMP per doc
    with pixel(i, j) = (doc_id·7 + 13i + 31j) mod 256 on all three channels
    (gray ⇒ luma == pixel value exactly) — so decode_image_stats has a
    closed-form SQL oracle over generate_series."""
    i = np.arange(height, dtype=np.int64)[:, None]
    j = np.arange(width, dtype=np.int64)[None, :]

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d in pdf[id_col]:
                v = ((int(d) * 7 + 13 * i + 31 * j) % 256).astype(np.uint8)
                rgb = np.repeat(v[:, :, None], 3, axis=2)
                rows.append((int(d), "image/bmp", encode_bmp(rgb), width, height))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "width", "height"]
            )

    return docs.select(id_col).mapInPandas(run, schema=ASSET_SCHEMA)


def frame_sample_indices(assets: DataFrame, n_frames: int = 4,
                         fps: float = 30.0) -> DataFrame:
    """(asset_id, frame_idx array<int>): deterministic uniform frame sampling
    plan for video assets — duration proxied by payload size (stub metric;
    real container parsing plugs into the same column)."""
    est_frames = (F.octet_length("payload") / 256 + 1).cast("int")
    return assets.where(F.col("kind").startswith("video")).select(
        "asset_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_frames - 1)),
            lambda i: (i * est_frames / n_frames).cast("int"),
        ).alias("frame_idx"),
    )
