"""Local mirror of the driver's correctness gate: run every registered query
on Spark AND its DuckDB oracle over the same parquet, compare row count,
column names, and order-insensitive values.

Run against sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 for the full pre-driver check.
"""

import datetime
import math
import os

import duckdb
import pytest

from datafusion_dynamic_filter_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()
ORACLE_KEYS = sorted(registry.ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in registry.QUERIES and (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr)  # repr-key: total order even with Nones


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(registry.ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _normalize_rows(spark_cols, spark_rows)
    d = _normalize_rows(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark):
    """Queries without oracles must still execute and return a DataFrame."""
    for name in sorted(set(registry.QUERIES) - set(registry.ORACLES)):
        df = registry.QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_rotation_discards_pre_semantics_greens():
    """The driver-rotation ordering must treat a green correctness row
    older than a query's last semantics change as no evidence (r7 verdict:
    similarity_lsh_topk's r4 green hid the unverified r6 banded-LSH
    rework).  Every _SEMANTICS_CHANGED_ROUND entry therefore sorts ahead
    of any query whose latest green predates no semantics change."""
    import __spark_entry__ as e

    last = e._last_green_round()
    for name, changed in e._SEMANTICS_CHANGED_ROUND.items():
        got = last.get(name)
        assert got is None or got >= changed, (
            f"{name}: green from r{got} predates semantics change r{changed}"
        )
    ordering = list(e.queries())
    # Names with no usable green must lead the rotation (the driver checks
    # a bounded prefix per round).
    unverified = [n for n in ordering if n not in last]
    assert ordering[: len(unverified)] == sorted(unverified)
