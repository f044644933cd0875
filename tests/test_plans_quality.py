"""Plan-quality regressions: predicate pushdown reaches the parquet scan,
column pruning holds, small dimensions broadcast (SURVEY §4 — the rewrites
Catalyst must deliver for the declarative design to be scale-correct)."""

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _q(name):
    # some variants live outside the driver's graded window but stay covered
    return {**E.queries(), **E.extra_queries()}[name]


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(_q("filter_pushdown")(spark, SF))
    # note: the plan printer truncates long filter lists, so assert on the
    # leading entries of each scan's pushed set
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "EqualTo(o_orderstatus,F)" in plan


def test_column_pruning(spark):
    plan = _plan(_q("distinct_proj")(spark, SF))
    # scan must read only the two projected columns
    scan = [line for line in plan.splitlines() if "FileScan parquet" in line]
    assert scan and "c_nationkey" in scan[-1] and "c_name" not in scan[-1]


def test_small_dims_broadcast(spark):
    plan = _plan(_q("multi_join")(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # at this SF everything small is broadcast


def test_bgp_star_single_scan_filters(spark):
    plan = _plan(_q("bgp_star")(spark, SF))
    # the constant object filter must be pushed into the union's scans
    assert "PushedFilters" in plan


def test_no_cartesian_in_triangle(spark):
    plan = _plan(_q("bgp_triangle")(spark, SF))
    assert "CartesianProduct" not in plan


def test_decontaminate_probe_is_broadcast(spark):
    """The eval n-gram probe must be a broadcast hash join — at 100 TB the
    corpus stream cannot shuffle against a benchmark-sized eval set."""
    plan = _plan(_q("decontaminate")(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
