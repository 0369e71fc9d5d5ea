"""Per-operator oracle checks for the relational parity surface.

Round 5 consolidated the 18 individual rel_* queries() entries into 4
composite suites (driver-window fix); this test keeps the PER-OPERATOR
evidence — each relational.py function is compared against its unchanged
DuckDB oracle in RELATIONAL_SQL at sf0.001 — and pins that the composite
suites are exactly the union of their tagged branches.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from bloqsenjin_spark import corpus, oracle
from bloqsenjin_spark.operators import relational

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

# queries()-era name → (function, table args) — same wiring the driver ran
# through round 4 (__spark_entry__.py history)
OPERATORS = {
    "rel_select_project_filter": (relational.select_project_filter, ["lineitem"]),
    "rel_join_groupby_view": (relational.join_groupby_view, ["customer", "orders"]),
    "rel_enrichment_join": (relational.enrichment_join, ["orders", "lineitem", "part"]),
    "rel_semi_join_exists": (relational.semi_join_exists, ["customer", "orders"]),
    "rel_anti_join_guard": (relational.anti_join_guard, ["customer", "orders"]),
    "rel_cooccurrence_pairs": (relational.cooccurrence_pairs, ["lineitem"]),
    "rel_interval_filter": (relational.interval_filter, ["orders"]),
    "rel_top1_per_group": (relational.top1_per_group, ["orders"]),
    "rel_quota_count": (relational.quota_count, ["orders"]),
    "rel_level_curve": (relational.level_curve, ["events"]),
    "rel_bitmask_ops": (relational.bitmask_ops, ["events"]),
    "rel_schema_merge_union": (relational.schema_merge_union, ["orders"]),
    "rel_validate_rows": (relational.validate_rows, ["part"]),
    "rel_rollup_metrics": (relational.rollup_metrics, ["lineitem"]),
    "rel_lag_lead_deltas": (relational.lag_lead_deltas, ["events"]),
    "rel_json_extract": (relational.json_extract_props, ["events"]),
    "rel_scalar_funcs": (relational.scalar_funcs_demo, ["orders"]),
    "rel_windowed_event_counts": (relational.windowed_event_counts, ["events"]),
}


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in corpus.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _compare(sdf, con, sql):
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    dcols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    # string-normalized set compare for heterogeneous types (dates, arrays)
    s_set = _rowset(scols, [tuple(_flatten(v) for v in r) for r in srows])
    d_set = _rowset(dcols, [tuple(_flatten(v) for v in r) for r in drows])
    assert s_set == d_set


def _flatten(v):
    if isinstance(v, list):
        return "|".join(map(str, v))
    return v


@pytest.mark.parametrize("name", sorted(OPERATORS))
def test_operator_matches_oracle(spark, duck, name):
    fn, tables = OPERATORS[name]
    sdf = fn(*[corpus.load_table(spark, SF_DIR, t) for t in tables])
    _compare(sdf, duck, oracle.RELATIONAL_SQL[name])


SUITES = {
    "rel_scan_set_suite": (relational.scan_set_suite, ["lineitem", "orders"]),
    "rel_join_suite": (relational.join_suite,
                       ["customer", "orders", "lineitem", "part"]),
    "rel_agg_window_suite": (relational.agg_window_suite,
                             ["orders", "lineitem", "events"]),
    "rel_scalar_suite": (relational.scalar_suite, ["events", "orders", "part"]),
}


def test_merged_scan_scalar_suite(spark, duck):
    """The round-7 driver entry (scan/set + scalar merged to free a window
    slot) matches the concatenated composite oracle."""
    sdf = relational.scan_scalar_suite(
        *[corpus.load_table(spark, SF_DIR, t)
          for t in ("lineitem", "orders", "events", "part")])
    _compare(sdf, duck,
             oracle.COMPOSITE_RELATIONAL_SQL["rel_scan_set_suite"]
             + "\nUNION ALL\n"
             + oracle.COMPOSITE_RELATIONAL_SQL["rel_scalar_suite"])


@pytest.mark.parametrize("name", sorted(SUITES))
def test_composite_suite_matches_oracle(spark, duck, name):
    fn, tables = SUITES[name]
    sdf = fn(*[corpus.load_table(spark, SF_DIR, t) for t in tables])
    _compare(sdf, duck, oracle.COMPOSITE_RELATIONAL_SQL[name])


def test_composite_branch_counts(spark, duck):
    """Each suite contains exactly its branches' rows — no branch silently
    dropped by the remapping."""
    fn, tables = SUITES["rel_join_suite"]
    sdf = fn(*[corpus.load_table(spark, SF_DIR, t) for t in tables])
    by_part = {r["part"]: r["n"] for r in sdf.groupBy("part").count()
               .withColumnRenamed("count", "n").collect()}
    # every branch's row count must equal its standalone operator's (zero-row
    # branches — e.g. 'anti' at this sf — simply don't appear in the groupBy)
    for part, orig in [("join_groupby", "rel_join_groupby_view"),
                       ("enrich", "rel_enrichment_join"),
                       ("semi", "rel_semi_join_exists"),
                       ("anti", "rel_anti_join_guard"),
                       ("cooc", "rel_cooccurrence_pairs")]:
        n = duck.sql(f"SELECT count(*) FROM ({oracle.RELATIONAL_SQL[orig]})").fetchone()[0]
        assert by_part.get(part, 0) == n


def test_composite_suites_preserve_pushdown(spark):
    """The UNION-tagged consolidation must not break what the individual
    operators had: each branch's filters/projection still reach its parquet
    scan (PushedFilters / pruned ReadSchema in the executed plan), and the
    union adds no extra shuffle on top of the branches' own."""
    li = corpus.load_table(spark, SF_DIR, "lineitem")
    orders = corpus.load_table(spark, SF_DIR, "orders")
    out = relational.scan_set_suite(li, orders)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # scan branch: the l_quantity/l_returnflag/l_discount predicates push to
    # the lineitem parquet scan
    li_scans = [l for l in plan.splitlines()
                if "FileScan" in l and "lineitem" in l]
    assert li_scans and any(
        "PushedFilters: [" in l and "l_quantity" in l for l in li_scans
    ), li_scans
    # projection pruning: no lineitem scan reads more than the 6 needed cols
    for l in li_scans:
        assert "l_shipdate" not in l.split("ReadSchema")[-1]
    # union of scans/filters only — no exchange needed for this suite
    assert "Exchange" not in plan
