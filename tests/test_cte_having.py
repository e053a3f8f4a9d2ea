"""r5 grammar extension: CTEs and HAVING on the prepared fast path.

The reference prepares any non-DDL statement (src/preparable_context.rs:15-30)
and its dynamic-filter rule rewrites placeholders in any Filter — HAVING is a
Filter over an Aggregate, so both belong on the template path, not the
literal fallback.
"""

import pytest

from datafusion_dynamic_filter_spark.simple_parser import parse_simple_select


# ---------------------------------------------------------------- parsing

def test_parse_cte_single():
    p = parse_simple_select(
        "WITH big AS (SELECT * FROM orders WHERE o_totalprice > 100) "
        "SELECT o_orderkey FROM big WHERE o_orderkey = :p1"
    )
    assert p is not None
    assert p.ctes == [("big", "SELECT * FROM orders WHERE o_totalprice > 100")]
    assert p.table == "big"


def test_parse_cte_chain_and_nested_parens():
    p = parse_simple_select(
        "WITH a AS (SELECT o_custkey, (o_totalprice * (1 + 0.1)) AS t FROM orders), "
        "b AS (SELECT o_custkey, count(*) AS c FROM a GROUP BY o_custkey) "
        "SELECT o_custkey, c FROM b WHERE o_custkey = :p1"
    )
    assert p is not None
    assert [name for name, _ in p.ctes] == ["a", "b"]


def test_parse_cte_body_placeholder_falls_back():
    assert (
        parse_simple_select(
            "WITH a AS (SELECT * FROM orders WHERE o_custkey = :p1) "
            "SELECT o_orderkey FROM a"
        )
        is None
    )


def test_parse_cte_malformed_falls_back():
    assert parse_simple_select("WITH a AS SELECT 1 SELECT 2") is None
    assert parse_simple_select("WITH a AS (SELECT 1 SELECT 2") is None  # unbalanced


def test_parse_cte_quoted_paren_in_body():
    p = parse_simple_select(
        "WITH a AS (SELECT ')' AS s, o_orderkey FROM orders) "
        "SELECT o_orderkey FROM a WHERE o_orderkey = :p1"
    )
    assert p is not None
    assert p.ctes[0][1] == "SELECT ')' AS s, o_orderkey FROM orders"


def test_parse_having():
    p = parse_simple_select(
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING count(*) >= :p1 ORDER BY o_custkey"
    )
    assert p is not None
    assert p.having == "count(*) >= :p1"
    assert len(p.having_placeholders) == 1


def test_parse_having_without_group_by_falls_back():
    assert parse_simple_select("SELECT count(*) AS n FROM orders HAVING count(*) > 5") is None


def test_parse_having_subquery_falls_back():
    assert (
        parse_simple_select(
            "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey "
            "HAVING count(*) > (SELECT 5)"
        )
        is None
    )


# ---------------------------------------------------------------- execution

@pytest.fixture(scope="module")
def orders(testdata):
    return testdata["orders"]


def test_cte_template_matches_sql(engine, orders):
    sql = (
        "WITH big AS (SELECT o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 50000) "
        "SELECT o_custkey, count(*) AS n FROM big WHERE o_custkey = {k} "
        "GROUP BY o_custkey"
    )
    stmt = engine.prepare(sql.replace("{k}", "$1"))
    assert stmt.mode == "dynamic"  # CTE statement stays on the fast path
    for k in (1, 7, 500):
        got = stmt.execute([k]).collect()
        want = engine.spark.sql(sql.format(k=k)).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_cte_shadows_table_name(engine, orders):
    # A CTE named like a real table must shadow it inside the template only.
    stmt = engine.prepare(
        "WITH orders AS (SELECT 1 AS o_orderkey) "
        "SELECT o_orderkey FROM orders WHERE o_orderkey = $1"
    )
    assert stmt.mode == "dynamic"
    assert [r.o_orderkey for r in stmt.execute([1]).collect()] == [1]
    # the real table is untouched for other statements
    assert engine.spark.table("orders").count() > 1


def test_having_parameterized_matches_sql(engine, orders):
    sql = (
        "SELECT o_custkey, count(*) AS n, max(o_totalprice) AS mx "
        "FROM orders GROUP BY o_custkey "
        "HAVING count(*) >= {n} AND max(o_totalprice) < {mx} "
        "ORDER BY o_custkey"
    )
    stmt = engine.prepare(
        sql.replace("{n}", "$1").replace("{mx}", "$2")
    )
    assert stmt.mode == "dynamic"
    for n, mx in ((2, 400000.0), (1, 100000.0), (100, 400000.0)):
        got = stmt.execute([n, mx]).collect()
        want = engine.spark.sql(sql.format(n=n, mx=mx)).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_having_not_in_select_list(engine, orders):
    # HAVING over an aggregate the SELECT list does NOT expose: evaluated
    # inside the aggregation, never visible in the output schema.
    stmt = engine.prepare(
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING sum(o_totalprice) > $1 ORDER BY o_custkey"
    )
    assert stmt.mode == "dynamic"
    df = stmt.execute([1000000.0])
    assert df.columns == ["o_custkey", "n"]
    want = engine.spark.sql(
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING sum(o_totalprice) > 1000000.0 ORDER BY o_custkey"
    ).collect()
    assert [tuple(r) for r in df.collect()] == [tuple(r) for r in want]


def test_having_group_only_predicate(engine, orders):
    # HAVING referencing only the grouping column: post-filters the output.
    stmt = engine.prepare(
        "SELECT o_orderstatus, count(*) AS n FROM orders "
        "GROUP BY o_orderstatus HAVING o_orderstatus = $1"
    )
    assert stmt.mode == "dynamic"
    rows = stmt.execute(["F"]).collect()
    assert len(rows) == 1 and rows[0].o_orderstatus == "F"


def test_having_alias_plus_aggregate(engine, orders):
    # HAVING mixing an output ALIAS with a raw aggregate: the in-agg
    # placement resolves the alias via Spark's lateral column alias
    # resolution; the prepare-time NULL trial build guarantees any
    # unresolvable variant falls back to the literal path instead of
    # failing at first execute.
    sql = (
        "SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey "
        "HAVING n >= {n} AND sum(o_totalprice) > {s} ORDER BY o_custkey"
    )
    stmt = engine.prepare(sql.replace("{n}", "$1").replace("{s}", "$2"))
    got = stmt.execute([5, 100000.0]).collect()
    want = engine.spark.sql(sql.format(n=5, s=100000.0)).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_trial_build_runs_at_prepare_for_hot_and_layout(engine, orders):
    # The NULL trial build must not break prepare-time side paths: hot
    # templates (pinned scan) and layout-adopting templates.
    import os

    stmt_hot = engine.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1",
        hot=True,
    )
    assert stmt_hot.execute([1]).collect() is not None
    stmt_hot.close()
    from tests.conftest import SF_DIR

    engine.ensure_point_layout(
        "orders", "o_orderkey",
        source_path=os.path.join(SF_DIR, "orders.parquet"),
    )
    stmt_lay = engine.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    assert stmt_lay._template.layout is not None
    assert [r.o_orderkey for r in stmt_lay.execute([7]).collect()] == [7]
    stmt_lay.close()


def test_cte_template_missing_param_error(engine, orders):
    # Reference error string must survive the new grammar paths
    # (src/param_resolver.rs:90-93).
    stmt = engine.prepare(
        "WITH big AS (SELECT * FROM orders WHERE o_totalprice > 0) "
        "SELECT o_orderkey FROM big WHERE o_orderkey = $1"
    )
    with pytest.raises(Exception, match="Placeholder '\\$1' was not provided a value"):
        stmt.execute({})


def test_cte_filter_pushes_into_cte_scan(engine, orders):
    # The bound key must reach the parquet scan THROUGH the CTE: the view
    # collapses at analysis, so Catalyst pushes the filter into the
    # underlying relation — no materialize-then-filter barrier.
    from datafusion_dynamic_filter_spark.plans import pushed_filters

    stmt = engine.prepare(
        "WITH big AS (SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 0) "
        "SELECT o_orderkey FROM big WHERE o_orderkey = $1"
    )
    assert stmt.mode == "dynamic"
    df = stmt.execute([42])
    pushed = " ".join(pushed_filters(df)).lower()
    assert "o_orderkey" in pushed


def test_cte_having_combined(engine, orders):
    sql = (
        "WITH big AS (SELECT o_custkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 10000) "
        "SELECT o_custkey, count(*) AS n FROM big WHERE o_custkey >= {lo} "
        "GROUP BY o_custkey HAVING count(*) >= {n} ORDER BY o_custkey"
    )
    stmt = engine.prepare(sql.replace("{lo}", "$1").replace("{n}", "$2"))
    assert stmt.mode == "dynamic"
    got = stmt.execute([10, 3]).collect()
    want = engine.spark.sql(sql.format(lo=10, n=3)).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
