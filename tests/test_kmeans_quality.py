"""Algorithmic-quality gates for the iterative trainers (beyond oracle
parity, which pins cross-engine equality): Lloyd's iterations must not
increase inertia, and power iteration must converge toward a dominant
direction (unit norm, rising eigenvalue estimate)."""

import os

from datafusion_dynamic_filter_spark import registry
from datafusion_dynamic_filter_spark.operators.similarity import (
    embedding_kmeans_train,
    embedding_power_iteration,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def _total_inertia(spark, iters):
    rows = embedding_kmeans_train(spark, SF_DIR, iters=iters).collect()
    assert len(rows) >= 2, "k-means degenerated to <2 non-empty clusters"
    return sum(r.inertia for r in rows)


def test_kmeans_inertia_monotone_nonincreasing(spark):
    """Lloyd's invariant: each (assign, update) round can only lower the
    summed within-cluster squared distance (up to the 6-dp rounding grain
    the cross-engine determinism scheme introduces)."""
    i0 = _total_inertia(spark, 0)
    i1 = _total_inertia(spark, 1)
    i2 = _total_inertia(spark, 2)
    assert i1 <= i0 + 0.01, (i0, i1)
    assert i2 <= i1 + 0.01, (i1, i2)
    assert i2 < i0, "two update rounds improved nothing — trainer is inert"


def test_power_iteration_unit_direction_and_growing_eigval(spark):
    rows1 = embedding_power_iteration(spark, SF_DIR, iters=1).collect()
    rows2 = embedding_power_iteration(spark, SF_DIR, iters=2).collect()
    norm2 = sum(r.loading**2 for r in rows2)
    assert abs(norm2 - 1.0) < 1e-3, norm2
    # After the first multiply the iterate aligns with the dominant
    # eigenspace; the Rayleigh estimate must not shrink as rounds add.
    assert rows2[0].eigval >= rows1[0].eigval - 0.01, (
        rows1[0].eigval,
        rows2[0].eigval,
    )
