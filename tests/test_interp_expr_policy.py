"""r14 expression-codegen policy: nojit templates whose per-execution scan
touches few rows (hot batch-stats pruning / layout bucket pruning) run the
INTERPRETED expression path (factoryMode=NO_CODEGEN on their private
cloned session) so a fresh key stops paying a Janino compile; flat cold
templates — whose filter runs over every scanned row — keep compiled
expressions.  Results are identical either way (the interpreted path is
Spark's own fallback evaluator)."""

import os

import pytest

import datafusion_dynamic_filter_spark.simple_parser as sp

SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"


@pytest.fixture(scope="module")
def layout(engine, testdata):
    import tests.conftest as c

    return engine.ensure_point_layout(
        "orders", "o_orderkey",
        source_path=os.path.join(c.SF_DIR, "orders.parquet"),
    )


def test_hot_template_runs_interpreted_expressions(engine, testdata):
    stmt = engine.prepare(SQL, hot=True, layout=False)
    t = stmt._template
    assert t.interp_exprs
    assert t.spark.conf.get("spark.sql.codegen.factoryMode") == "NO_CODEGEN"
    assert t.spark.conf.get("spark.sql.constraintPropagation.enabled") == "false"
    stmt.close()


def test_cold_flat_template_keeps_compiled_expressions(engine, testdata):
    stmt = engine.prepare(SQL, layout=False)
    t = stmt._template
    assert t.nojit  # point lookup -> wholestage off ...
    assert not t.interp_exprs  # ... but expression codegen kept
    assert t._interp_scan_rows() is None
    assert (
        t.spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
        == "FALLBACK"
    )
    stmt.close()


def test_layout_template_interpreted_and_matches_flat(engine, layout, testdata):
    flat = engine.prepare(SQL, layout=False)
    lay = engine.prepare(SQL)
    t = lay._template
    assert t.layout is not None and t.interp_exprs
    est = t._interp_scan_rows()
    assert est is not None and 0 <= est <= sp._INTERP_MAX_SCAN_ROWS
    for k in (1, 7, 42, 10**9):  # incl. a key matching nothing
        want = [tuple(r) for r in flat.execute({"$1": k}).collect()]
        got = [tuple(r) for r in lay.execute({"$1": k}).collect()]
        assert got == want, k
    flat.close()
    lay.close()


def test_gate_respects_row_bound(engine, layout, testdata, monkeypatch):
    monkeypatch.setattr(sp, "_INTERP_MAX_SCAN_ROWS", 0)
    stmt = engine.prepare(SQL, hot=True, layout=False)
    t = stmt._template
    assert not t.interp_exprs
    assert (
        t.spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
        == "FALLBACK"
    )
    stmt.close()


def test_user_session_conf_untouched(engine, testdata):
    before = engine.spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    beforec = engine.spark.conf.get(
        "spark.sql.constraintPropagation.enabled", "true"
    )
    stmt = engine.prepare(SQL, hot=True, layout=False)
    assert (
        engine.spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
        == before
    )
    assert (
        engine.spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
        == beforec
    )
    stmt.close()
