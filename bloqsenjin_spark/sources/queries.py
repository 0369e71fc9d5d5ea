"""Query-set ingestion (S13 parity): parquet, JSON-lines, and protobuf.

The reference accepts its query payloads as protobuf-encoded HTTP bodies and
decodes them into typed structs before use
(/root/reference/pkg/auth/http/log.go:48-92); the engine-native equivalents
are columnar files read with a PINNED schema (never inferred — schema drift
in a query set must fail loudly, not coerce), plus ``from_protobuf`` when the
spark-protobuf package is on the classpath.

Every ingested query is normalized with THE tokenizer (functions/text), so
"The, FAST!" and "the fast" are the same query — queries and documents must
tokenize identically or scores silently diverge.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bloqsenjin_spark.config import TOKEN_SPLIT_REGEX

QUERY_SET_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), False),
        T.StructField("mode", T.StringType(), False),
        T.StructField("k", T.IntegerType(), False),
    ]
)

_MODES = {"conjunctive", "disjunctive"}


def protobuf_available(spark: SparkSession) -> bool:
    """True iff the spark-protobuf data source is loadable in this JVM."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:  # noqa: BLE001 — class not on the classpath
        return False


def load_query_set(spark: SparkSession, path: str, fmt: str | None = None,
                   proto_descriptor: str | None = None,
                   proto_message: str = "QuerySet") -> list[tuple[int, list[str], str, int]]:
    """path → validated [(query_id, terms, mode, k)], format by extension or
    explicit ``fmt`` ∈ {parquet, json, protobuf}."""
    if fmt is None:
        low = path.lower()
        if low.endswith((".json", ".jsonl", ".ndjson")):
            fmt = "json"
        elif low.endswith((".pb", ".bin", ".proto.bin")):
            fmt = "protobuf"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        df = spark.read.schema(QUERY_SET_SCHEMA).parquet(path)
    elif fmt == "json":
        # JSON-lines, one query object per line:
        #   {"query_id": 1, "terms": ["fast", "query"], "mode": "conjunctive", "k": 10}
        df = spark.read.schema(QUERY_SET_SCHEMA).json(path)
    elif fmt == "protobuf":
        if not protobuf_available(spark):
            raise RuntimeError(
                "protobuf query sets need the spark-protobuf package on the "
                "classpath (spark-submit --packages org.apache.spark:"
                f"spark-protobuf_2.13:<spark-version>); cannot read {path}. "
                "Re-encode as JSON-lines or parquet, or add the package."
            )
        from pyspark.sql.protobuf.functions import from_protobuf

        if not proto_descriptor:
            raise ValueError("protobuf query sets need --proto-descriptor "
                             "(a protoc --descriptor_set_out file)")
        with open(proto_descriptor, "rb") as f:
            desc = f.read()
        raw = spark.read.format("binaryFile").load(path).select("content")
        df = (
            raw.select(
                from_protobuf("content", proto_message, binaryDescriptorSet=desc
                              ).alias("qs")
            )
            .select(F.explode("qs.queries").alias("q"))
            .select("q.query_id", "q.terms", "q.mode", "q.k")
        )
    else:
        raise ValueError(f"unknown query-set format {fmt!r}")
    return validate_queries(
        [(r["query_id"], list(r["terms"]), r["mode"], r["k"]) for r in df.collect()]
    )


def validate_queries(
    qs: list[tuple[int, list[str], str, int]]
) -> list[tuple[int, list[str], str, int]]:
    """Normalize terms through THE tokenizer; reject malformed rows loudly."""
    out = []
    seen: set[int] = set()
    for qid, terms, mode, k in qs:
        if qid in seen:
            raise ValueError(f"duplicate query_id {qid}")
        seen.add(qid)
        if mode not in _MODES:
            raise ValueError(f"query {qid}: mode {mode!r} not in {_MODES}")
        if not isinstance(k, int) or k < 1:
            raise ValueError(f"query {qid}: k must be a positive int, got {k!r}")
        norm = [t for term in terms for t in re.split(TOKEN_SPLIT_REGEX, term.lower()) if t]
        if not norm:
            raise ValueError(f"query {qid}: no terms survive tokenization")
        out.append((int(qid), norm, mode, int(k)))
    return out
