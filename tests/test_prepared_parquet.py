"""Parity with the reference Parquet integration suite
(tests/preparable_context_parquet_test.rs) — write a small parquet file,
register it with schema inference, run prepared statements with reader
filter pushdown, and verify the filter actually reaches the scan."""

import pytest


@pytest.fixture(scope="module")
def records(engine, tmp_path_factory):
    # reference fixture F2 (:39-68): (1,alpha,10) .. (5,epsilon,50)
    path = str(tmp_path_factory.mktemp("pq") / "records.parquet")
    df = engine.spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30),
         (4, "delta", 40), (5, "epsilon", 50)],
        "id int, value string, score int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return engine.register_parquet("records", path)


def test_parquet_point_lookup(engine, records):
    # reference :86-131 — id=2 -> beta/20
    stmt = engine.prepare("SELECT id, value, score FROM records WHERE id = $1")
    rows = stmt.execute({"$1": 2}).collect()
    assert [(r.id, r.value, r.score) for r in rows] == [(2, "beta", 20)]


def test_parquet_repeat_execution(engine, records):
    # reference :134-189 — id=1 then id=5 on one statement
    stmt = engine.prepare("SELECT id, value FROM records WHERE id = $1")
    assert [r.value for r in stmt.execute({"$1": 1}).collect()] == ["alpha"]
    assert [r.value for r in stmt.execute({"$1": 5}).collect()] == ["epsilon"]


def test_parquet_mixed_range(engine, records):
    # reference :192-232 — id >= 2 AND score <= 30 -> rows 2,3
    stmt = engine.prepare("SELECT id FROM records WHERE id >= $1 AND score <= $2")
    rows = stmt.execute({"$1": 2, "$2": 30}).collect()
    assert sorted(r.id for r in rows) == [2, 3]


def test_bound_filter_pushed_to_scan(engine, records):
    # The Spark analog of reader pushdown_filters=true (reference :27):
    # the bound literal must appear in the scan's PushedFilters.
    stmt = engine.prepare("SELECT id, value FROM records WHERE id = $1")
    df = stmt.execute({"$1": 2})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(id,2)" in plan.replace(" ", "")


def test_string_param_pushdown(engine, records):
    stmt = engine.prepare("SELECT id FROM records WHERE value = $1")
    df = stmt.execute({"$1": "gamma"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(value,gamma)" in plan.replace(" ", "")
    assert [r.id for r in df.collect()] == [3]
