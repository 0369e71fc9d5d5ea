from __future__ import annotations

import pytest

from bloqsenjin_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def micro_docs(spark):
    """FIXTURES.md §3 hand-computable 8-doc corpus."""
    rows = [
        (0, "a b c"),
        (1, "b c d d"),
        (2, "a a a"),
        (3, "d"),
        (4, ""),
        (5, "c b a"),
        (6, "e e e e e"),
        (7, "a e"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")
