"""Prepared UNION [ALL] templates (r5 grammar extension).

Reference scope: DynamicFilterRule rewrites every placeholder-bearing
Filter in the plan, top-down (src/rule.rs:57-59, 32-49), and prepare()
admits any non-DDL statement (src/preparable_context.rs:15-30) — so a
union of parameterized SELECTs is squarely inside the mechanism.
"""

import pytest

from datafusion_dynamic_filter_spark.simple_parser import UnionTemplate


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_union_all_template_matches_literal(engine, users):
    sql = (
        "SELECT id, name FROM users WHERE id = $1 "
        "UNION ALL SELECT id, name FROM users WHERE amount >= $2"
    )
    stmt = engine.prepare(sql)
    assert stmt.mode == "dynamic"
    assert isinstance(stmt._template, UnionTemplate)
    for p1, p2 in [(2, 400), (5, 9999), (99, 100)]:
        got = _rows(stmt.execute({"$1": p1, "$2": p2}))
        want = _rows(
            engine.spark.sql(sql.replace("$1", str(p1)).replace("$2", str(p2)))
        )
        assert got == want, (p1, p2)
    stmt.close()


def test_union_distinct_dedupes_overlap(engine, users):
    sql = (
        "SELECT id FROM users WHERE id = $1 "
        "UNION SELECT id FROM users WHERE id <= $2"
    )
    stmt = engine.prepare(sql)
    assert stmt.mode == "dynamic"
    got = _rows(stmt.execute({"$1": 2, "$2": 3}))
    assert got == [(1,), (2,), (3,)]  # id=2 appears once
    stmt.close()


def test_union_level_order_by_limit_lifts_to_union(engine, users):
    sql = (
        "SELECT id, amount FROM users WHERE id >= $1 "
        "UNION ALL SELECT id, amount FROM users WHERE id = $2 "
        "ORDER BY amount DESC LIMIT 3"
    )
    stmt = engine.prepare(sql)
    assert stmt.mode == "dynamic"
    got = [tuple(r) for r in stmt.execute({"$1": 3, "$2": 1}).collect()]
    want = [
        tuple(r)
        for r in engine.spark.sql(
            sql.replace("$1", "3").replace("$2", "1")
        ).collect()
    ]
    assert got == want  # ordering preserved: the clause scopes to the union
    stmt.close()


def test_non_final_branch_order_by_is_rejected_like_spark(engine, users):
    # Invalid SQL (ORDER BY before UNION needs parens): the template raises
    # at prepare, auto mode falls to the literal path, and Spark's own
    # parser rejects it there — the statement never silently reinterprets.
    with pytest.raises(Exception):
        engine.prepare(
            "SELECT id FROM users WHERE id = $1 ORDER BY id "
            "UNION ALL SELECT id FROM users WHERE id = $2"
        )


def test_union_all_batch_is_one_semi_join(engine, users):
    sql = (
        "SELECT id, name FROM users WHERE id = $1 "
        "UNION ALL SELECT id, name FROM users WHERE id = $1"
    )
    stmt = engine.prepare(sql)
    got = _rows(stmt.execute_batch([[1], [2]]))
    # each key matches each branch once -> every row appears twice
    assert got == [(1, "alice"), (1, "alice"), (2, "bob"), (2, "bob")]
    stmt.close()


def test_union_distinct_batch_keeps_per_row_semantics(engine, users):
    sql = (
        "SELECT id FROM users WHERE id = $1 "
        "UNION SELECT id FROM users WHERE id = $1"
    )
    stmt = engine.prepare(sql)
    # per-row distinct: each key's result is {key}; the batch is their
    # concatenation (no cross-row dedupe possible here, but the point is
    # the fallback path runs and stays correct)
    assert _rows(stmt.execute_batch([[3], [4]])) == [(3,), (4,)]
    stmt.close()


def test_union_missing_param_error(engine, users):
    stmt = engine.prepare(
        "SELECT id FROM users WHERE id = $1 "
        "UNION ALL SELECT id FROM users WHERE id = $2"
    )
    with pytest.raises(Exception, match="was not provided a value"):
        stmt.execute({"$1": 1})
    stmt.close()


@pytest.mark.parametrize(
    "sql,params",
    [
        (
            "SELECT id FROM users WHERE id <= $1 "
            "INTERSECT SELECT id FROM users WHERE id >= $2",
            {"$1": 4, "$2": 2},
        ),
        (
            "SELECT id FROM users WHERE id <= $1 "
            "EXCEPT SELECT id FROM users WHERE id = $2",
            {"$1": 4, "$2": 2},
        ),
        (
            "SELECT id FROM users WHERE id <= $1 "
            "EXCEPT ALL SELECT id FROM users WHERE id = $2",
            {"$1": 4, "$2": 2},
        ),
        (
            "SELECT id FROM users WHERE id <= $1 "
            "INTERSECT ALL SELECT id FROM users WHERE id <= $2",
            {"$1": 3, "$2": 2},
        ),
    ],
)
def test_intersect_except_templates_match_literal(engine, users, sql, params):
    stmt = engine.prepare(sql)
    assert stmt.mode == "dynamic"
    lit = sql
    for k, v in params.items():
        lit = lit.replace(k, str(v))
    assert _rows(stmt.execute(params)) == _rows(engine.spark.sql(lit))
    stmt.close()


def test_mixed_setop_chain_falls_back_to_literal(engine, users):
    # INTERSECT binds tighter than UNION; a flat fold would misparse, so
    # the statement must take the literal path and still match Spark.
    sql = (
        "SELECT id FROM users WHERE id <= $1 "
        "UNION SELECT id FROM users WHERE id = $2 "
        "INTERSECT SELECT id FROM users WHERE id = $3"
    )
    stmt = engine.prepare(sql)
    assert stmt.mode == "literal"
    got = _rows(stmt.execute({"$1": 2, "$2": 3, "$3": 3}))
    want = _rows(
        engine.spark.sql(
            sql.replace("$1", "2").replace("$2", "3").replace("$3", "3")
        )
    )
    assert got == want


def test_setop_batch_falls_back_to_per_row_semantics(engine, users):
    sql = (
        "SELECT id FROM users WHERE id <= $1 "
        "INTERSECT SELECT id FROM users WHERE id >= $2"
    )
    stmt = engine.prepare(sql)
    batched = _rows(stmt.execute_batch([[3, 2], [5, 4]]))
    want = []
    for p1, p2 in [(3, 2), (5, 4)]:
        want.extend(
            tuple(r)
            for r in engine.spark.sql(
                sql.replace("$1", str(p1)).replace("$2", str(p2))
            ).collect()
        )
    assert batched == sorted(want)
    stmt.close()
