"""Parity tests with the reference's in-memory integration suite
(tests/preparable_context_basic_test.rs) — same fixture rows, same
assertions, reference file:line cited per test."""

import pytest

from datafusion_dynamic_filter_spark.errors import ParameterError, PrepareError
from datafusion_dynamic_filter_spark.prepared import PreparedStatement


def test_prepare_point_lookup_charlie(engine, users):
    # reference :68-103 — id=3 -> charlie/300
    stmt = engine.prepare("SELECT id, name, amount FROM users WHERE id = $1")
    assert stmt.mode == "dynamic"
    rows = stmt.execute({"$1": 3}).collect()
    assert len(rows) == 1
    assert rows[0].id == 3 and rows[0].name == "charlie" and rows[0].amount == 300


def test_two_executions_one_statement(engine, users):
    # reference :106-145 — ids 1 then 5 on the SAME statement
    stmt = engine.prepare("SELECT id, name, amount FROM users WHERE id = $1")
    r1 = stmt.execute({"$1": 1}).collect()
    r2 = stmt.execute({"$1": 5}).collect()
    assert [(r.id, r.name) for r in r1] == [(1, "alice")]
    assert [(r.id, r.name) for r in r2] == [(5, "eve")]
    assert stmt.executions == 2


def test_string_param(engine, users):
    # reference :148-183 — name = 'bob' -> id 2
    stmt = engine.prepare("SELECT id, name FROM users WHERE name = $1")
    rows = stmt.execute({"$1": "bob"}).collect()
    assert [(r.id, r.name) for r in rows] == [(2, "bob")]


def test_range_two_params(engine, users):
    # reference :186-218 — id >= 2 AND id <= 4 -> 3 rows
    stmt = engine.prepare("SELECT id FROM users WHERE id >= $1 AND id <= $2")
    rows = stmt.execute({"$1": 2, "$2": 4}).collect()
    assert sorted(r.id for r in rows) == [2, 3, 4]


def test_empty_result_not_error(engine, users):
    # reference :221-241 — no match -> empty, not error
    stmt = engine.prepare("SELECT id FROM users WHERE id = $1")
    assert stmt.execute({"$1": 999}).collect() == []


def test_projection_single_column(engine, users):
    # reference :244-273 — SELECT name, id=4 -> diana, exactly 1 column
    stmt = engine.prepare("SELECT name FROM users WHERE id = $1")
    df = stmt.execute({"$1": 4})
    assert df.columns == ["name"]
    assert [r.name for r in df.collect()] == ["diana"]


def test_count_star(engine, users):
    # reference :276-303 — COUNT(*) WHERE id >= 3 -> 3 as LongType (Int64)
    stmt = engine.prepare('SELECT COUNT(*) as count FROM users WHERE id >= $1')
    df = stmt.execute({"$1": 3})
    assert df.schema["count"].dataType.typeName() == "long"
    assert df.collect()[0]["count"] == 3


def test_constant_select_preparable(engine):
    # reference :60-65 — prepare("SELECT 1") works
    stmt = engine.prepare("SELECT 1 AS one")
    assert stmt.execute({}).collect()[0].one == 1


def test_missing_param_error_message(engine, users):
    # reference src/param_resolver.rs:156-168
    stmt = engine.prepare("SELECT id FROM users WHERE id = $1")
    with pytest.raises(ParameterError, match=r"Placeholder '\$1' was not provided a value"):
        stmt.execute({})


def test_ddl_rejected(engine):
    # reference src/preparable_context.rs:18-28 — exact message, and ONLY
    # CreateMemoryTable / CreateIndex are rejected
    with pytest.raises(PrepareError, match="^Cannot prepare DDL statement$"):
        engine.prepare("CREATE TABLE t AS SELECT 1")
    with pytest.raises(PrepareError, match="^Cannot prepare DDL statement$"):
        engine.prepare("CREATE INDEX idx ON t(x)")


def test_non_ddl_statements_forwarded(engine, users):
    # reference src/preparable_context.rs:15-30: every statement kind other
    # than CreateMemoryTable/CreateIndex is forwarded to the planner, which
    # may fail later for its own reasons — but NOT with the DDL guard error.
    stmt = engine.prepare("DELETE FROM users WHERE id = $1", validate=False)
    assert stmt.mode == "literal"
    with pytest.raises(Exception) as exc_info:
        stmt.execute({"p1": 1}).collect()
    assert not isinstance(exc_info.value, PrepareError)


def test_list_param_cache_key_hashable(engine, users):
    # round-2 ADVICE: list-valued IN-list params made the plan-cache key
    # unhashable (TypeError) in round 1
    stmt = engine.prepare("SELECT id FROM users WHERE id IN $1")
    rows = stmt.execute({"$1": [1, 3]}).collect()
    assert sorted(r.id for r in rows) == [1, 3]
    rows2 = stmt.execute({"$1": [1, 3]}).collect()  # cache hit path
    assert sorted(r.id for r in rows2) == [1, 3]


def test_groupby_without_aggregate_falls_back(engine, users):
    # round-2 ADVICE: SELECT a FROM t GROUP BY a left agg_cols empty and
    # raised at execute time on the fast path; it must fall back to literal
    stmt = engine.prepare("SELECT name FROM users WHERE id >= $1 GROUP BY name")
    assert stmt.mode == "literal"
    rows = stmt.execute({"$1": 4}).collect()
    assert sorted(r.name for r in rows) == ["diana", "eve"]


def test_execute_batch_aggregating_per_row_semantics(engine, users):
    # round-2 ADVICE: aggregating statements must yield one result per
    # parameter row (union path), never one global aggregate over all keys
    stmt = engine.prepare("SELECT COUNT(*) AS n FROM users WHERE id >= $1")
    df = stmt.execute_batch([[4], [5], [4]])  # duplicate row binds once
    counts = sorted(r.n for r in df.collect())
    assert counts == [1, 2]


def test_execute_batch_dedupes_param_rows(engine, users):
    stmt = engine.prepare("SELECT id, name FROM users WHERE id = $1")
    df = stmt.execute_batch([[2], [2], [3]])
    assert sorted((r.id, r.name) for r in df.collect()) == [(2, "bob"), (3, "charlie")]


def test_named_and_positional_spellings(engine, users):
    stmt = engine.prepare("SELECT id FROM users WHERE id = :key")
    assert [r.id for r in stmt.execute({"key": 2}).collect()] == [2]
    stmt2 = engine.prepare("SELECT id FROM users WHERE id = ?")
    assert [r.id for r in stmt2.execute([3]).collect()] == [3]
    # positional list binds $1, $2 in order
    stmt3 = engine.prepare("SELECT id FROM users WHERE id >= $1 AND id <= $2")
    assert sorted(r.id for r in stmt3.execute([2, 3]).collect()) == [2, 3]


def test_or_and_nested_predicates(engine, users):
    # reference src/rule.rs:174-192 exercises `id = $1 OR name = 'test'`
    stmt = engine.prepare("SELECT id FROM users WHERE id = $1 OR name = 'eve'")
    assert sorted(r.id for r in stmt.execute({"$1": 1}).collect()) == [1, 5]
    stmt2 = engine.prepare("SELECT id FROM users WHERE id > $1 AND id < $2")
    assert [r.id for r in stmt2.execute({"$1": 2, "$2": 4}).collect()] == [3]


def test_reset(engine, users):
    stmt = engine.prepare("SELECT id FROM users WHERE id = $1")
    stmt.execute({"$1": 1})
    stmt.reset()
    assert stmt.executions == 0
    assert [r.id for r in stmt.execute({"$1": 2}).collect()] == [2]


def test_execute_batch_semi_join(engine, users):
    # IN-list analog (reference README.md:46-51)
    stmt = engine.prepare("SELECT id, name FROM users WHERE id = $1")
    rows = stmt.execute_batch([{"$1": 1}, {"$1": 3}, {"$1": 5}]).collect()
    assert sorted(r.id for r in rows) == [1, 3, 5]


def test_join_statement_takes_fast_path(engine, users):
    # Joins are inside the fast-path grammar (round 2): template mode.
    stmt = engine.prepare(
        "SELECT u.id, u.name FROM users u JOIN users v ON u.id = v.id WHERE u.id = $1"
    )
    assert stmt.mode == "dynamic"
    rows = stmt.execute({"$1": 4}).collect()
    assert [(r.id, r.name) for r in rows] == [(4, "diana")]


def test_setops_take_fast_path_since_r5(engine, users):
    # Set-op chains joined the fast-path grammar in r5 (UnionTemplate).
    stmt = engine.prepare(
        "SELECT id FROM users WHERE id = $1 UNION ALL SELECT id FROM users WHERE id = $1"
    )
    assert stmt.mode == "dynamic"
    rows = stmt.execute({"$1": 4}).collect()
    assert [r.id for r in rows] == [4, 4]


def test_window_fn_select_item_works_on_fast_path(engine, users):
    # Window expressions in the SELECT list ride the template: F.expr
    # resolves OVER clauses, and the window evaluates over the FILTERED
    # rows — exactly SQL's evaluation order.
    stmt = engine.prepare(
        "SELECT id, row_number() OVER (ORDER BY id) AS rn "
        "FROM users WHERE id >= $1"
    )
    assert stmt.mode == "dynamic"
    rows = stmt.execute({"$1": 4}).collect()
    assert [(r.id, r.rn) for r in rows] == [(4, 1), (5, 2)]


def test_literal_mode_fallback_exists_subquery(engine, users):
    # A parameterized EXISTS subquery conjunct is outside the template
    # binder (DataFrame filter cannot express a correlated EXISTS text
    # expression), so the statement falls to the literal path — and still
    # prepares + executes correctly there.
    stmt = engine.prepare(
        "SELECT id FROM users u WHERE EXISTS "
        "(SELECT 1 FROM users v WHERE v.id = u.id AND v.id = $1)"
    )
    assert stmt.mode == "literal"
    assert [r.id for r in stmt.execute({"$1": 3}).collect()] == [3]


def test_string_escaping_safe(engine, users):
    stmt = engine.prepare("SELECT id FROM users WHERE name = $1")
    # quote + backslash must not break the bound filter, nor match anything
    assert stmt.execute({"$1": "o'brien \\ x"}).collect() == []


def test_plan_cache_hit(engine, users):
    stmt = engine.prepare("SELECT id FROM users WHERE id = $1")
    d1 = stmt.execute({"$1": 1})
    d2 = stmt.execute({"$1": 1})
    assert d1 is d2  # repeated key returns the cached DataFrame


def test_plan_cache_lru_eviction_preserves_results(engine, users):
    # The per-statement plan cache is a bounded LRU (r5 verdict: unbounded
    # growth per distinct key is a driver leak in the service regime).
    # With cap=2, a third distinct key evicts the LEAST-recently-used entry;
    # an evicted key re-executes with identical results.
    stmt = engine.prepare(
        "SELECT id, name FROM users WHERE id = $1", plan_cache_size=2
    )
    d1 = stmt.execute({"$1": 1})
    stmt.execute({"$1": 2})
    d1_again = stmt.execute({"$1": 1})  # touch key 1 -> key 2 is now LRU
    assert d1_again is d1
    stmt.execute({"$1": 3})  # evicts key 2
    assert len(stmt._plan_cache) == 2
    # evicted key re-binds: a NEW DataFrame, same result
    d2_rebound = stmt.execute({"$1": 2})
    assert [(r.id, r.name) for r in d2_rebound.collect()] == [(2, "bob")]
    # key 1 survived both evictions (it was most-recently-used)
    rows = stmt.execute({"$1": 1}).collect()
    assert [(r.id, r.name) for r in rows] == [(1, "alice")]


def test_dml_repeat_execute_not_cached(engine, spark, tmp_path):
    # A repeat execute() with equal params must RE-RUN side-effecting
    # statements: spark.sql() executes DML eagerly, so serving the cached
    # DataFrame would silently skip the second INSERT.
    spark.sql(
        f"CREATE TABLE dml_sink (k INT) USING parquet LOCATION '{tmp_path}/dml_sink'"
    )
    try:
        stmt = engine.prepare(
            "INSERT INTO dml_sink VALUES (:k)", validate=False
        )
        stmt.execute({"k": 7})
        stmt.execute({"k": 7})  # equal params — must still insert again
        assert spark.table("dml_sink").count() == 2
        assert stmt.executions == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS dml_sink")


def test_bind_data_matches_literal_results(engine, users):
    lit = engine.prepare("SELECT id, name, amount FROM users WHERE id = $1")
    dat = engine.prepare(
        "SELECT id, name, amount FROM users WHERE id = $1", bind="data"
    )
    for k in (1, 3, 99):
        assert sorted(map(tuple, lit.execute({"$1": k}).collect())) == sorted(
            map(tuple, dat.execute({"$1": k}).collect())
        )


def test_bind_data_aggregate_single_key(engine, users):
    # Single-key semantics are exact for aggregating templates too.
    stmt = engine.prepare(
        "SELECT count(*) AS n FROM users WHERE id = $1", bind="data"
    )
    assert stmt.execute({"$1": 3}).collect()[0].n == 1
    assert stmt.execute({"$1": 99}).collect()[0].n == 0


def test_bind_data_generated_code_key_independent(engine, users):
    # The point of bind="data": no key literal in the physical plan, so
    # the generated code / plan shape is identical across keys.
    import re

    stmt = engine.prepare(
        "SELECT id, name FROM users WHERE id = $1", bind="data"
    )
    def norm(df):
        s = df._jdf.queryExecution().executedPlan().toString()
        return re.sub(r"plan_id=\d+", "plan_id=N", re.sub(r"#\d+", "#N", s))
    p1 = norm(stmt.execute({"$1": 1}))
    p2 = norm(stmt.execute({"$1": 5}))
    assert p1 == p2
    assert "1" not in p1 or "5" not in p2  # keys are data, not plan text


def test_window_cte_template_takes_fast_path(engine, users):
    # r7 grammar reach-check: a CTE whose body computes a window function,
    # with BOTH placeholders in the outer WHERE (one against the window
    # column) — the prepared_window_topk_template shape.  The window plans
    # once at prepare; binding stays on the dynamic fast path.
    stmt = engine.prepare(
        "WITH ranked AS (SELECT id, name, "
        "row_number() OVER (ORDER BY id DESC) AS rnk FROM users) "
        "SELECT id, rnk FROM ranked WHERE rnk <= $1 AND id >= $2"
    )
    assert stmt.mode == "dynamic"
    rows = stmt.execute({"$1": 2, "$2": 0}).collect()
    assert sorted((r.id, r.rnk) for r in rows) == [(4, 2), (5, 1)]
