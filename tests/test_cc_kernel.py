"""Convergence-horizon tests for the connected-components kernel.

The kernel's claim: ``iters`` propagate+shortcut rounds cover cluster
diameters up to ~2^(iters+1)-2, and anything beyond trips the runtime
guard instead of silently returning split components.  The SimHash graph
the operator feeds it cannot exercise either boundary on demand, so these
tests drive the kernel with synthetic PATH graphs — the worst case for
label propagation (one cluster, maximal diameter)."""

import pytest
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.operators.pipeline import cc_resolve


def _path_graph(spark, n):
    """Nodes 0..n-1 in a single path: diameter n-1."""
    nodes = spark.range(n).toDF("doc_id")
    fwd = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return nodes, edges


def test_path_well_beyond_plain_propagation_converges(spark):
    # diameter 99 >> 6 (the plain-propagation horizon that failed at
    # sf0.1); within the doubled horizon 2^7-2 = 126 for iters=6.
    nodes, edges = _path_graph(spark, 100)
    out = cc_resolve(nodes, edges).collect()
    assert len(out) == 100
    assert all(r.component == 0 for r in out), "path split into pieces"


def test_two_clusters_and_singletons(spark):
    nodes = spark.range(10).toDF("doc_id")
    fwd = spark.createDataFrame(
        [(0, 3), (3, 7), (1, 4)], "src long, dst long"
    )
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    comp = {r.doc_id: r.component for r in cc_resolve(nodes, edges).collect()}
    assert comp[0] == comp[3] == comp[7] == 0
    assert comp[1] == comp[4] == 1
    for singleton in (2, 5, 6, 8, 9):
        assert comp[singleton] == singleton


def test_default_converges_past_the_old_fixed_horizon(spark):
    # r6 changed the kernel from a fixed unroll to a run-to-convergence
    # loop after the sf1 probe chained clusters past diameter 510.  Pin
    # the new contract: diameter 299 (beyond the old doubled horizon of
    # 126) converges to ONE component under the defaults.
    nodes, edges = _path_graph(spark, 300)
    out = cc_resolve(nodes, edges).collect()
    assert len(out) == 300
    assert all(r.component == 0 for r in out), "path split into pieces"


def test_guard_trips_when_max_iters_is_exhausted(spark):
    # The runaway cap still guards: with max_iters=2 the loop covers
    # diameter ~2^3-2 = 6, so a diameter-299 path must FAIL the job with
    # the diagnosis, not return split components.
    nodes, edges = _path_graph(spark, 300)
    with pytest.raises(Exception, match="still changing"):
        cc_resolve(nodes, edges, max_iters=2).collect()
