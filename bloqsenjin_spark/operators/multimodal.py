"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested; the actual codec decode is STUBBED because
image/audio libraries are not in this container:

* ``decode_image`` raises NotImplementedError unless PIL is importable
  (import-try gate) — the call site, batching, and output schema are real.
* ``fake_decode_features`` is the deterministic stand-in used by tests and
  the driver queries: md5(payload) → 8 float32s in [0,1). Deterministic,
  library-free, and shaped exactly like a real feature extractor so swapping
  PIL/librosa in later changes one function body, not the pipeline.

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


def decode_image(assets: DataFrame, size: tuple[int, int] = (64, 64)) -> DataFrame:
    """(asset_id, pixels array<float>) — REAL decode path; gated on PIL.

    Raises NotImplementedError in environments without an image library
    (clearly-marked stub per the build contract). The batching/schema below
    is what the real implementation uses as-is.
    """
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this container. "
            "Use fake_decode_features for pipeline plumbing."
        )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        from PIL import Image as _I

        for pdf in it:
            out = []
            for p in pdf["payload"]:
                img = _I.open(io.BytesIO(bytes(p))).convert("L").resize(size)
                out.append((np.asarray(img, dtype=np.float32) / 255.0).ravel())
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "pixels": out})

    return assets.select("asset_id", "payload").mapInPandas(
        run, schema="asset_id long, pixels array<float>"
    )


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
