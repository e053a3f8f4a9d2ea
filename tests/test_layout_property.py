"""Property-based equivalence of the point-layout execution paths: for
random keys (in-range, out-of-range, boundary), the layout-adopted
statement (bucket-augmented filter over the partitioned copy) and the
data-bound batch (parquet params relation + DPP) must return exactly the
flat-scan results.  The bucket arithmetic (Python ``%`` driver-side vs
``pmod`` in the plan) and the params-as-data join are the engine's
headline mechanism — this is its fuzz coverage.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_template_property import _ex

_KEYS = st.one_of(
    st.integers(min_value=0, max_value=1500),  # mostly in-range at sf0.001
    st.sampled_from([0, 1, 10**6, 10**9]),  # boundary / far out-of-range
)

SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"


@pytest.fixture(scope="module")
def layout_stmts(engine, testdata):
    import tests.conftest as c

    engine.ensure_point_layout(
        "orders", "o_orderkey",
        source_path=os.path.join(c.SF_DIR, "orders.parquet"),
    )
    flat = engine.prepare(SQL, layout=False)
    lay = engine.prepare(SQL)
    assert lay._template.layout is not None
    return flat, lay


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@settings(
    max_examples=_ex(15),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(key=_KEYS)
def test_layout_single_key_matches_flat(layout_stmts, key):
    flat, lay = layout_stmts
    assert _rows(lay.execute({"$1": key})) == _rows(flat.execute({"$1": key}))


@settings(
    max_examples=_ex(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(_KEYS, min_size=1, max_size=8))
def test_layout_batch_matches_in_literal(engine, layout_stmts, keys):
    """The DPP params-as-data batch must equal the literal IN over the
    flat table — across duplicate keys, misses, and boundary values."""
    _, lay = layout_stmts
    got = _rows(lay.execute_batch([[k] for k in keys]))
    in_list = ", ".join(str(k) for k in sorted(set(keys)))
    want = _rows(
        engine.spark.sql(
            f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            f"WHERE o_orderkey IN ({in_list})"
        )
    )
    assert got == want, keys
