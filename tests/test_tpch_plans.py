"""Plan-quality gates for the TPC-H-adapted suite (operators/tpch.py).

Each assertion pins the scale-critical property of the classic plan shape:
Q6's predicates reach the scan, the star joins broadcast their dimensions,
and the scan-heavy aggregates stay within their canonical exchange budget.
"""

import os

from datafusion_dynamic_filter_spark import registry
from datafusion_dynamic_filter_spark.plans import (
    broadcast_join_count,
    executed_plan,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def test_q6_filters_pushed_and_columns_pruned(spark):
    """Q6 is THE pushdown query: all three filterable predicates land in
    PushedFilters and the scan reads only the 4 referenced columns."""
    df = registry.QUERIES["q6_forecast_revenue"](spark, SF_DIR)
    fs = " ".join(pushed_filters(df))
    assert "l_shipdate" in fs and "l_discount" in fs and "l_quantity" in fs, fs
    cols = set(scan_columns(df))
    assert "l_orderkey" not in cols and "l_returnflag" not in cols, cols


def test_q6_single_aggregate_shuffle(spark):
    """Scan -> partial agg -> one exchange -> final agg."""
    df = registry.QUERIES["q6_forecast_revenue"](spark, SF_DIR)
    assert shuffle_count(df) <= 1, executed_plan(df)


def test_q7_broadcasts_both_nation_copies(spark):
    df = registry.QUERIES["q7_volume_shipping"](spark, SF_DIR)
    assert broadcast_join_count(df) >= 2, executed_plan(df)


def test_q8_broadcasts_dims(spark):
    """region + both nation copies (and under AQE often part/supplier)
    must broadcast; the orders-lineitem spine is the only big join."""
    df = registry.QUERIES["q8_market_share"](spark, SF_DIR)
    assert broadcast_join_count(df) >= 3, executed_plan(df)


def test_q10_broadcasts_nation_and_prunes_dates(spark):
    df = registry.QUERIES["q10_returned_items"](spark, SF_DIR)
    assert broadcast_join_count(df) >= 1, executed_plan(df)
    fs = " ".join(pushed_filters(df))
    assert "o_orderdate" in fs and "l_returnflag" in fs, fs


def test_q4_exists_plans_as_semi_join(spark):
    plan = executed_plan(registry.QUERIES["q4_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in plan or "Semi" in plan, plan


def test_q22_anti_join_no_cartesian(spark):
    plan = executed_plan(registry.QUERIES["q22_prospect_customers"](spark, SF_DIR))
    assert "LeftAnti" in plan or "Anti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q18_having_semi_join_shape(spark):
    """The qualifying-orders IN-subquery must be a semi join on the order
    key, not a nested-loop re-scan."""
    plan = executed_plan(registry.QUERIES["q18_large_volume_customer"](spark, SF_DIR))
    assert "LeftSemi" in plan or "Semi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q17_decorrelates_to_aggregate_join(spark):
    """Catalyst must rewrite the correlated scalar subquery into a per-part
    aggregate joined back — a correlated re-execution per row would be a
    full lineitem scan per probe at 100 TB."""
    plan = executed_plan(registry.QUERIES["q17_small_qty_revenue"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan
