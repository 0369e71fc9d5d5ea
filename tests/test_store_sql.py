"""IcebergStore SQL/writer-path coverage against a recording stub session.

The sandbox has no Iceberg runtime (no jar on disk, and Maven Central is
unreachable — DNS resolution fails; attempt recorded in PLANS.md §4a), so
`test_store.py::test_kill_and_resume_backends[iceberg]` must skip. These
tests close the gap the skip leaves: every IcebergStore method's generated
SQL and DataFrameWriterV2 call chain is executed against a stub that records
the calls, so the MERGE INTO / overwritePartitions / expire_snapshots paths
are no longer unexecuted lines.
"""

from __future__ import annotations

import pytest

from bloqsenjin_spark.plans.store import ICEBERG_SCHEME, IcebergStore, for_index


class FakeWriteTo:
    def __init__(self, log: list, table: str):
        self.log = log
        self.table = table
        self.chain: list[str] = []

    def using(self, fmt):
        self.chain.append(f"using({fmt})")
        return self

    def partitionedBy(self, col):
        self.chain.append("partitionedBy(shard)")
        return self

    def create(self):
        self.log.append((self.table, self.chain + ["create"]))

    def createOrReplace(self):
        self.log.append((self.table, self.chain + ["createOrReplace"]))

    def overwritePartitions(self):
        self.log.append((self.table, self.chain + ["overwritePartitions"]))


class FakeDF:
    def __init__(self, spark):
        self.spark = spark
        self.views: list[str] = []
        self.repartitioned = False
        self.coalesced = None

    def repartition(self, col):
        self.repartitioned = True
        return self

    def repartitionByRange(self, n, col):
        self.range_partitioned = (n, str(col))
        return self

    def sortWithinPartitions(self, col):
        self.sorted_within = col
        return self

    def coalesce(self, n):
        self.coalesced = n
        return self

    def writeTo(self, table):
        return FakeWriteTo(self.spark.writes, table)

    def createOrReplaceTempView(self, name):
        self.views.append(name)
        self.spark.views.append(name)


class FakeCatalog:
    def __init__(self, existing):
        self.existing = set(existing)
        self.dropped_views: list[str] = []

    def tableExists(self, t):
        return t in self.existing

    def dropTempView(self, v):
        self.dropped_views.append(v)


class FakeRead:
    def __init__(self, spark):
        self.spark = spark

    def table(self, t):
        self.spark.reads.append(t)
        return f"<df:{t}>"


class FakeSpark:
    def __init__(self, existing=()):
        self.catalog = FakeCatalog(existing)
        self.sqls: list[str] = []
        self.writes: list[tuple] = []
        self.views: list[str] = []
        self.reads: list[str] = []
        self.read = FakeRead(self)

    def sql(self, q):
        self.sqls.append(" ".join(q.split()))


NS = "cat.db.idx"


def _store(existing=()):
    spark = FakeSpark(existing)
    return spark, IcebergStore(spark, NS)


def test_init_creates_namespace_and_table_names():
    spark, st = _store()
    assert spark.sqls == ["CREATE NAMESPACE IF NOT EXISTS cat.db"]
    assert st._t("postings") == "cat.db.idx_postings"


def test_read_and_overwrite_chains():
    spark, st = _store()
    assert st.read("term_stats") == "<df:cat.db.idx_term_stats>"
    df = FakeDF(spark)
    st.overwrite(df, "term_stats", coalesce=8)
    assert df.coalesced == 8
    assert spark.writes == [
        ("cat.db.idx_term_stats", ["using(iceberg)", "createOrReplace"])
    ]


def test_overwrite_shards_create_vs_overwrite_partitions(spark):
    # (real session fixture only because F.col needs an active SparkContext)
    # table missing → partitioned create
    spark, st = _store()
    st.overwrite_shards(FakeDF(spark), "postings")
    assert spark.writes == [
        ("cat.db.idx_postings",
         ["using(iceberg)", "partitionedBy(shard)", "create"])
    ]
    # table exists → atomic overwritePartitions snapshot commit
    spark, st = _store(existing=["cat.db.idx_postings"])
    df = FakeDF(spark)
    st.overwrite_shards(df, "postings")
    assert df.repartitioned
    assert spark.writes == [("cat.db.idx_postings", ["overwritePartitions"])]


def test_replace_all_single_snapshot_commit(spark):
    spark, st = _store()
    st.replace_all(FakeDF(spark), "doc_lens")
    assert spark.writes == [
        ("cat.db.idx_doc_lens",
         ["using(iceberg)", "partitionedBy(shard)", "createOrReplace"])
    ]


def test_upsert_checkpoints_merge_sql_and_view_hygiene():
    # missing table → plain create
    spark, st = _store()
    st.upsert_checkpoints(FakeDF(spark))
    assert spark.writes == [
        ("cat.db.idx_checkpoints", ["using(iceberg)", "create"])
    ]
    # existing table → MERGE INTO keyed on shard via a UNIQUE temp view,
    # dropped afterwards (concurrent builds must not clobber each other)
    spark, st = _store(existing=["cat.db.idx_checkpoints"])
    df = FakeDF(spark)
    st.upsert_checkpoints(df)
    spark2, st2 = _store(existing=["cat.db.idx_checkpoints"])
    st2.upsert_checkpoints(FakeDF(spark2))
    (view,) = df.views
    merge = [q for q in spark.sqls if q.startswith("MERGE INTO")]
    assert merge == [
        f"MERGE INTO cat.db.idx_checkpoints dst USING {view} src "
        "ON dst.shard = src.shard "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ]
    assert spark.catalog.dropped_views == [view]
    assert spark2.views != spark.views  # per-call unique MERGE source name


def test_compact_expires_snapshots_on_existing_tables_only():
    existing = ["cat.db.idx_postings", "cat.db.idx_checkpoints"]
    spark, st = _store(existing=existing)
    st.compact(retain_last=3)
    calls = [q for q in spark.sqls if q.startswith("CALL")]
    assert calls == [
        "CALL cat.system.expire_snapshots(table => 'cat.db.idx_postings', retain_last => 3)",
        "CALL cat.system.expire_snapshots(table => 'cat.db.idx_checkpoints', retain_last => 3)",
    ]


def test_for_index_requires_runtime_on_real_session(spark):
    """On the real sandbox session (no Iceberg jar on the classpath) an
    iceberg:// index_dir must fail loudly at the seam, not deep in a write."""
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        for_index(spark, f"{ICEBERG_SCHEME}cat.db.idx")


def test_overwrite_sorted_range_partitioned_snapshot_commit(spark):
    # (real session fixture only because F.col needs an active SparkContext)
    """overwrite_sorted (term-/variant-sorted replicas: term_stats, the
    SymSpell fuzzy_index) range-partitions on the sort column, sorts within
    files, and replaces the table as ONE snapshot commit — file-level column
    stats then give Iceberg the same point/range-read pruning the parquet
    backend gets from row-group min/max."""
    spark, store = _store()
    df = FakeDF(spark)
    store.overwrite_sorted(df, "term_stats", "term", n_files=8)
    assert df.range_partitioned[0] == 8
    assert df.sorted_within == "term"
    assert spark.writes == [
        (f"{NS}_term_stats", ["using(iceberg)", "createOrReplace"])
    ]
