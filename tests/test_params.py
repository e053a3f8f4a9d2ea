"""Unit tests for placeholder scanning/binding (reference
src/param_resolver.rs:102-179 unit-test coverage model)."""

import datetime

import pytest

from datafusion_dynamic_filter_spark.errors import ParameterError
from datafusion_dynamic_filter_spark.params import (
    bind_text,
    canonicalize,
    find_placeholders,
    normalize_params,
    to_sql_literal,
)
from datafusion_dynamic_filter_spark.simple_parser import parse_simple_select


def test_find_dollar_placeholders():
    phs = find_placeholders("SELECT * FROM t WHERE a = $1 AND b = $2")
    assert [(p.original, p.canonical) for p in phs] == [("$1", "p1"), ("$2", "p2")]


def test_skip_strings_comments_casts():
    sql = "SELECT ':notaparam', '$5' -- :nope $9\n, x::int FROM t WHERE a = :real"
    phs = find_placeholders(sql)
    assert [p.canonical for p in phs] == ["real"]


def test_canonicalize_mixed():
    sql, phs = canonicalize("SELECT * FROM t WHERE a = $1 AND b = :name AND c = ?")
    assert ":p1" in sql and ":name" in sql
    assert [p.canonical for p in phs] == ["p1", "name", "p1"]  # ? -> p1 (first qmark)


def test_normalize_params_spellings():
    phs = find_placeholders("WHERE a = $1 AND b = $2")
    assert normalize_params({"$1": 1, "2": 2}, phs) == {"p1": 1, "p2": 2}
    assert normalize_params([10, 20], phs) == {"p1": 10, "p2": 20}
    with pytest.raises(ParameterError, match="Placeholder '\\$2'"):
        normalize_params({"$1": 1}, phs)
    with pytest.raises(ParameterError, match="Unknown parameter"):
        normalize_params({"$1": 1, "$2": 2, "$3": 3}, phs)


def test_repeated_placeholder_one_value():
    phs = find_placeholders("WHERE a = $1 OR b = $1")
    assert normalize_params({"$1": 7}, phs) == {"p1": 7}


def test_literals():
    assert to_sql_literal(None) == "NULL"
    assert to_sql_literal(True) == "TRUE"
    assert to_sql_literal(3) == "3"
    assert to_sql_literal(2.5) == "2.5"
    assert to_sql_literal("it's") == "'it\\'s'"
    assert to_sql_literal("a\\b") == "'a\\\\b'"
    assert to_sql_literal(datetime.date(2024, 1, 2)) == "DATE '2024-01-02'"
    assert to_sql_literal([1, 2]) == "(1, 2)"


def test_bind_text():
    sql, phs = canonicalize("SELECT * FROM t WHERE a = $1")
    bound = normalize_params({"$1": "x"}, phs)
    assert bind_text(sql, phs, bound) == "SELECT * FROM t WHERE a = 'x'"


def test_simple_parser_accepts_reference_shapes():
    p = parse_simple_select("SELECT id, name FROM users WHERE id = :p1")
    assert p and p.table == "users" and p.where == "id = :p1"
    p = parse_simple_select("SELECT COUNT(*) as count FROM users WHERE id >= :p1")
    assert p and p.select_items == ["COUNT(*) as count"]
    p = parse_simple_select(
        "SELECT a, b, sum(x) as s FROM t WHERE a = :p1 GROUP BY a, b ORDER BY s DESC LIMIT 5"
    )
    assert p and p.group_by == ["a", "b"] and p.limit == 5
    assert p.order_by[0].descending


def test_simple_parser_rejects_out_of_scope():
    # joins parse (round 2); NATURAL/USING and comma joins still fall back
    assert parse_simple_select("SELECT * FROM a JOIN b ON a.x = b.x") is not None
    assert parse_simple_select("SELECT * FROM a NATURAL JOIN b") is None
    assert parse_simple_select("SELECT * FROM a JOIN b USING (x)") is None
    assert parse_simple_select("SELECT * FROM a, b WHERE a.x = b.x") is None
    assert parse_simple_select("SELECT * FROM (SELECT 1)") is None
    assert parse_simple_select("SELECT x FROM t WHERE x IN (SELECT y FROM u)") is None
    # CTEs parse since r5 (tests/test_cte_having.py); a placeholder in the
    # CTE body still falls back
    assert parse_simple_select("WITH c AS (SELECT 1) SELECT * FROM c") is not None
    assert (
        parse_simple_select("WITH c AS (SELECT :p1 AS x) SELECT * FROM c") is None
    )
    # placeholder outside WHERE -> fall back (reference scope: src/rule.rs:32-49)
    assert parse_simple_select("SELECT x + :p1 FROM t") is None
