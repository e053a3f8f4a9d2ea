"""Point-layout mechanics: bucket-partitioned copies, static partition
pruning for literal-bound keys, DPP for data-bound batches, fingerprint
invalidation, and the cloned-planning-session conf isolation (r5)."""

import os

import pytest

from datafusion_dynamic_filter_spark.layouts import (
    layout_stale,
    source_fingerprint,
    write_layout_marker,
)

SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"


@pytest.fixture(scope="module")
def layout(engine, testdata):
    import tests.conftest as c

    return engine.ensure_point_layout(
        "orders", "o_orderkey",
        source_path=os.path.join(c.SF_DIR, "orders.parquet"),
    )


def test_layout_adopted_and_results_match_flat(engine, layout):
    flat = engine.prepare(SQL, layout=False)
    lay = engine.prepare(SQL)
    assert flat._template.layout is None
    assert lay._template.layout is not None
    for k in (1, 7, 42, 10**9):  # incl. a key matching nothing
        want = [tuple(r) for r in flat.execute({"$1": k}).collect()]
        got = [tuple(r) for r in lay.execute({"$1": k}).collect()]
        assert got == want, k


def test_layout_static_partition_pruning_in_plan(engine, layout):
    stmt = engine.prepare(SQL)
    df = stmt.execute({"$1": 42})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert f"({layout.bucket_col}" in plan and "= 42" in plan, plan
    # the bucket column never leaks into the result schema
    assert df.columns == ["o_orderkey", "o_custkey", "o_totalprice"]


def test_layout_in_binder_bucket_augmentation(engine, layout):
    stmt = engine.prepare("SELECT o_orderkey FROM orders WHERE o_orderkey IN $1")
    assert stmt._template.layout is not None
    got = sorted(r.o_orderkey for r in stmt.execute({"$1": [11, 22, 33]}).collect())
    want = sorted(
        r.o_orderkey
        for r in engine.spark.sql(
            "SELECT o_orderkey FROM orders WHERE o_orderkey IN (11, 22, 33)"
        ).collect()
    )
    assert got == want


def test_layout_batch_params_as_parquet(engine, layout):
    stmt = engine.prepare(SQL)
    df = stmt.execute_batch([[11], [22], [33]])
    got = sorted(r.o_orderkey for r in df.collect())
    assert got == [11, 22, 33]
    # params went through a pyarrow-written parquet relation
    t = stmt._template
    assert len(t._param_dirs) == 1
    assert "FileScan parquet" in df._jdf.queryExecution().executedPlan().toString()
    stmt.close()
    assert t._param_dirs == []


def test_layout_skipped_for_hot_templates(engine, layout):
    hot = engine.prepare(SQL, hot=True)
    assert hot._template.layout is None
    hot.close()


def test_layout_adopted_for_join_template(engine, layout, testdata):
    # r5: a point-JOIN whose parameterized key hits the base table's
    # layout scans the bucket-partitioned copy (fact side pruned per key).
    join = engine.prepare(
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON c_custkey = o_custkey WHERE o_orderkey = $1"
    )
    assert join._template is not None and join._template.layout is not None
    df = join.execute([7])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pk_bucket" in plan  # bucket predicate reached the plan
    want = engine.spark.sql(
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON c_custkey = o_custkey WHERE o_orderkey = 7"
    ).collect()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, want))
    assert "pk_bucket" not in df.columns
    join.close()


def test_layout_join_template_batch(engine, layout, testdata):
    join = engine.prepare(
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON c_custkey = o_custkey WHERE o_orderkey = $1"
    )
    df = join.execute_batch([[7], [11], [42]])
    want = engine.spark.sql(
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON c_custkey = o_custkey "
        "WHERE o_orderkey IN (7, 11, 42)"
    ).collect()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, want))
    join.close()


def test_layout_skipped_when_key_not_parameterized(engine, layout):
    stmt = engine.prepare(
        "SELECT o_orderkey FROM orders WHERE o_custkey = $1"
    )
    assert stmt._template is None or stmt._template.layout is None


def test_non_integral_key_rejected(engine, testdata):
    import tests.conftest as c

    with pytest.raises(ValueError, match="integral"):
        engine.ensure_point_layout(
            "orders", "o_orderstatus",
            source_path=os.path.join(c.SF_DIR, "orders.parquet"),
        )


def test_unregistered_table_rejected(engine):
    with pytest.raises(ValueError, match="parquet-backed"):
        engine.ensure_point_layout("no_such_table", "x")


def test_fingerprint_invalidation(tmp_path):
    src = tmp_path / "base.parquet"
    src.write_bytes(b"v1")
    sink = tmp_path / "layout"
    sink.mkdir()
    assert layout_stale(str(sink), str(src))  # no _SUCCESS
    (sink / "_SUCCESS").write_text("")
    assert layout_stale(str(sink), str(src))  # no marker
    write_layout_marker(str(sink), str(src))
    assert not layout_stale(str(sink), str(src))
    os.utime(src, ns=(1, 1))  # regenerate in place
    assert layout_stale(str(sink), str(src))
    assert source_fingerprint(str(src)) != ""


def test_clone_session_conf_isolated(engine, layout):
    spark = engine.spark
    before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    stmt = engine.prepare(SQL)  # point lookup -> nojit on its clone
    assert stmt._template.nojit
    assert stmt._template.spark.conf.get("spark.sql.codegen.wholeStage") == "false"
    # main session conf untouched, even during/after planning
    stmt.execute({"$1": 5}).collect()
    assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == before
