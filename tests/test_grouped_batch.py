"""Grouped-batch fast path: execute_batch on a GROUP BY template must be
ONE semi-join + ONE aggregation (plan size independent of N), byte-equal in
results to the per-row union fallback it replaces.

Reference frame: the reference's batch regime is the 1000-key IN-list
(README.md:46-51); prepare() accepts aggregating statements like any other
non-DDL plan (src/preparable_context.rs:15-30), so batching them is part of
the same capability surface.
"""

import pytest

from datafusion_dynamic_filter_spark.plans import executed_plan


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


GROUPED_SQL = (
    "SELECT o_custkey, count(*) AS n_orders, "
    "round(sum(o_totalprice), 2) AS total "
    "FROM orders WHERE o_custkey = $1 GROUP BY o_custkey"
)


def test_grouped_batch_matches_per_row_union(engine, testdata):
    stmt = engine.prepare(GROUPED_SQL)
    assert stmt.mode == "dynamic"
    assert stmt._template.grouped_batch_ok
    keys = [[k] for k in (1, 2, 4, 7, 10, 13)]
    batched = stmt.execute_batch(keys)
    # ground truth: one execute per key, results unioned
    union_rows = []
    for k in keys:
        union_rows.extend(tuple(r) for r in stmt.execute(k).collect())
    assert _sorted_rows(batched) == sorted(union_rows)
    assert batched.columns == ["o_custkey", "n_orders", "total"]
    stmt.close()


def test_grouped_batch_single_plan_no_union(engine, testdata):
    stmt = engine.prepare(GROUPED_SQL)
    df = stmt.execute_batch([[k] for k in range(1, 41)])
    plan = executed_plan(df)
    assert "Union" not in plan, plan
    # one broadcast of the params relation, nothing else nested-looped
    assert plan.count("BroadcastExchange") == 1, plan
    assert "CartesianProduct" not in plan, plan
    stmt.close()


def test_grouped_batch_zero_match_and_duplicate_rows(engine, testdata):
    stmt = engine.prepare(GROUPED_SQL)
    # key 10**9 matches nothing -> contributes no group; duplicate key 2
    # contributes once (union of per-DISTINCT-row results)
    batched = stmt.execute_batch([[2], [10**9], [2]])
    rows = _sorted_rows(batched)
    assert len(rows) == len(_sorted_rows(stmt.execute([2])))
    stmt.close()


def test_grouped_batch_group_key_differs_from_eq_col(engine, testdata):
    """Equality col != group col: grouping must keep per-parameter cells
    separate (the eq col joins the grouping key set, then drops)."""
    sql = (
        "SELECT o_orderstatus, count(*) AS n "
        "FROM orders WHERE o_custkey = $1 GROUP BY o_orderstatus"
    )
    stmt = engine.prepare(sql)
    assert stmt._template.grouped_batch_ok
    keys = [[1], [2], [4]]
    batched = stmt.execute_batch(keys)
    union_rows = []
    for k in keys:
        union_rows.extend(tuple(r) for r in stmt.execute(k).collect())
    assert _sorted_rows(batched) == sorted(union_rows)
    assert batched.columns == ["o_orderstatus", "n"]
    stmt.close()


def test_grouped_batch_static_having_applies_per_parameter_row(engine, testdata):
    sql = (
        "SELECT o_orderstatus, count(*) AS n "
        "FROM orders WHERE o_custkey = $1 "
        "GROUP BY o_orderstatus HAVING count(*) >= 2"
    )
    stmt = engine.prepare(sql)
    assert stmt._template.grouped_batch_ok
    keys = [[1], [2], [4], [7]]
    batched = stmt.execute_batch(keys)
    union_rows = []
    for k in keys:
        union_rows.extend(tuple(r) for r in stmt.execute(k).collect())
    assert _sorted_rows(batched) == sorted(union_rows)
    stmt.close()


@pytest.mark.parametrize(
    "sql",
    [
        # DISTINCT: merging would dedupe ACROSS parameter rows
        "SELECT DISTINCT o_orderstatus, count(*) AS n FROM orders "
        "WHERE o_custkey = $1 GROUP BY o_orderstatus",
        # LIMIT: per-row limit k != global limit k
        "SELECT o_orderstatus, count(*) AS n FROM orders "
        "WHERE o_custkey = $1 GROUP BY o_orderstatus LIMIT 1",
        # parameterized HAVING: a different predicate per parameter row
        "SELECT o_custkey, count(*) AS n FROM orders "
        "WHERE o_custkey = $1 GROUP BY o_custkey HAVING count(*) >= $2",
        # global aggregate: empty input yields one row, not zero groups
        "SELECT count(*) AS n FROM orders WHERE o_custkey = $1",
    ],
)
def test_union_fallback_statements_stay_correct(engine, testdata, sql):
    """Statements outside the grouped fast path keep union semantics: the
    batch result equals the concatenation of per-row executions."""
    stmt = engine.prepare(sql)
    assert not (stmt._template is not None and stmt._template.grouped_batch_ok)
    keys = [[1, 1], [2, 1]] if "$2" in sql else [[1], [2]]
    batched = stmt.execute_batch(keys)
    union_rows = []
    for k in keys:
        union_rows.extend(tuple(r) for r in stmt.execute(k).collect())
    assert _sorted_rows(batched) == sorted(union_rows)
    stmt.close()
