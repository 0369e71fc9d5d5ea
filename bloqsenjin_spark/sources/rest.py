"""S2: second source connector — a paginated REST scan as a PySpark
DataSource (the DAL-pluggability proof).

Reference analog: the Cloudflare-D1 backend of the reference's DAL
(/root/reference/internal/db/d1.go:37-81) — POST a query to an HTTP endpoint,
decode the JSON rows, page until exhausted. The reference fetches pages in a
serial loop on one process; the Spark-native re-expression makes EACH PAGE an
``InputPartition``, so a 10^6-page crawl-frontier export fans out across the
cluster while keeping the same wire contract.

Wire contract (one JSON document per page):

    {"rows": [{"url": ..., "warc_ts": "2026-01-01 00:00:00", "html_b64": ...,
               "text": ..., "lang": ...}, ...]}

Endpoints: ``http(s)://host/path`` (page appended as ``?page=i``) or
``file:///dir`` (page i at ``dir/page-{i}.json`` — the deterministic test
transport; same parser, same partitioning). Usage:

    spark.dataSource.register(RestPagesDataSource)
    spark.read.format("bloqsenjin_rest")
         .option("endpoint", "file:///exports/crawl")
         .option("n_pages", 64).load()
"""

from __future__ import annotations

import base64
import datetime
import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _fetch_page(endpoint: str, page: int, timeout: float) -> dict:
    if endpoint.startswith("file://"):
        path = endpoint[len("file://"):]
        with open(f"{path}/page-{page}.json", "rb") as f:
            return json.load(f)
    from urllib.request import urlopen  # stdlib only; executors need no extra deps

    sep = "&" if "?" in endpoint else "?"
    with urlopen(f"{endpoint}{sep}page={page}", timeout=timeout) as r:
        return json.loads(r.read())


def _parse_rows(doc: dict):
    for row in doc.get("rows", []):
        ts = row.get("warc_ts")
        yield (
            row["url"],
            datetime.datetime.fromisoformat(ts) if ts else None,
            base64.b64decode(row["html_b64"]) if row.get("html_b64") else None,
            row.get("text"),
            row.get("lang"),
        )


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class RestPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.endpoint = options["endpoint"]
        self.n_pages = int(options.get("n_pages", 1))
        self.timeout = float(options.get("timeout_sec", 30))

    def partitions(self):
        # one partition per page: the serial pagination loop of the reference
        # becomes a distributed fan-out; page count is the scan plan
        return [_PagePartition(i) for i in range(self.n_pages)]

    def read(self, partition: _PagePartition):
        yield from _parse_rows(
            _fetch_page(self.endpoint, partition.page, self.timeout)
        )


class RestPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "bloqsenjin_rest"

    def schema(self) -> str:
        return PAGES_DDL  # pinned, never inferred — same discipline as schemas.py

    def reader(self, schema) -> RestPagesReader:
        return RestPagesReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(RestPagesDataSource)
