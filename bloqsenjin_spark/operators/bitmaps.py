"""Per-shard docID bitmaps — the engine's unit of doc-set side-input.

A set of docIDs (tombstones, a metadata-filter allow-set, …) rides next to
the shard-cogrouped scorers as one (shard, bitmap) row per touched shard:
docs_per_shard bits, little-endian by shard-local docID. Built
DISTRIBUTIVELY (one groupBy on shard, each group ≤ docs_per_shard ids), so
no doc-set ever crosses the driver; per-task masking cost is one unpackbits.
Total side-input traffic is ≤ touched_shards × docs_per_shard/8 bytes
regardless of set size — the scale contract that replaced round-2's
driver-collected tombstone arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bloqsenjin_spark.config import IndexConfig


def shard_bitmap_df(ids: DataFrame, cfg: IndexConfig, id_col: str = "doc_id",
                    bitmap_col: str = "tomb") -> DataFrame:
    """(shard int, <bitmap_col> binary): one docs_per_shard-bit bitmap per
    shard containing ≥1 of ``ids``. Duplicate ids are tolerated (set
    semantics)."""
    dps = cfg.docs_per_shard

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        local = pdf[id_col].to_numpy().astype(np.int64) - shard * dps
        m = np.zeros(dps, dtype=bool)
        m[local] = True
        return pd.DataFrame(
            [(shard, np.packbits(m, bitorder="little").tobytes())],
            columns=["shard", bitmap_col],
        )

    return (
        ids.withColumn("shard", (F.col(id_col) / dps).cast("int"))
        .groupBy("shard")
        .applyInPandas(pack, schema=f"shard int, {bitmap_col} binary")
    )


def unpack_bitmap(blob) -> "np.ndarray | None":
    """bitmap bytes → shard-local boolean array (None blob = None)."""
    if blob is None:
        return None
    return np.unpackbits(
        np.frombuffer(bytes(blob), dtype=np.uint8), bitorder="little"
    ).astype(bool)


def or_bitmap_maps(a: DataFrame, b: DataFrame,
                   bitmap_col: str = "tomb") -> DataFrame:
    """Set-union of two per-shard bitmap tables → (shard, <bitmap_col>):
    full outer join on shard, byte-wise OR where both sides hold the shard
    (both are docs_per_shard-bit carriers, so lengths agree). Used to
    compose independent exclusion sets — e.g. a MUST_NOT-phrase match
    bitmap OR-merged into the tombstone side-input — without either set
    crossing the driver."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _or(x: pd.Series, y: pd.Series) -> pd.Series:
        out = []
        for xb, yb in zip(x, y):
            if xb is None:
                out.append(yb)
            elif yb is None:
                out.append(xb)
            else:
                if len(xb) != len(yb):
                    # loud carrier-size guard (round-8 ADVICE): a
                    # differently-sized bitmap producer used to die with an
                    # opaque numpy broadcast error deep inside the UDF
                    raise ValueError(
                        f"or_bitmap_maps: bitmap length mismatch "
                        f"({len(xb)} vs {len(yb)} bytes) — both sides must "
                        f"be docs_per_shard-bit carriers"
                    )
                out.append(
                    (np.frombuffer(bytes(xb), np.uint8)
                     | np.frombuffer(bytes(yb), np.uint8)).tobytes()
                )
        return pd.Series(out)

    ar = a.select("shard", F.col(bitmap_col).alias("_a"))
    br = b.select("shard", F.col(bitmap_col).alias("_b"))
    return ar.join(br, "shard", "full_outer").select(
        "shard", _or("_a", "_b").alias(bitmap_col)
    )
