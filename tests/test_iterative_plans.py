"""Plan-quality gates for the iterative trainers and incremental operators
added in round 7: k-means, power iteration, incremental LSH dedup, and the
materialized-view refresh.

The scale invariant for iterative ops: per-round cost is ONE corpus pass
plus a state-sized shuffle (k x dim or d rows), state stays broadcast, and
the unrolled plan contains no cartesian blow-up or corpus re-shuffle per
round beyond that.
"""

import os

from datafusion_dynamic_filter_spark import registry
from datafusion_dynamic_filter_spark.plans import (
    broadcast_join_count,
    executed_plan,
    shuffle_count,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def test_kmeans_broadcasts_centroids_every_round(spark):
    """3 assignment rounds (2 updates + final) = 3 broadcast joins of the
    k-row centroid state; the corpus side is never the build side."""
    df = registry.QUERIES["embedding_kmeans_train"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_power_iteration_broadcasts_direction(spark):
    """Each round joins the corpus against the broadcast 1-row direction
    vector; the only shuffles are the d-row dimension aggregations (plus
    their single-row collect-to-array re-aggregations)."""
    df = registry.QUERIES["embedding_power_iteration"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_lsh_is_equi_join_crossing_split_only(spark):
    """Candidates come from an equi-join on (band_idx, bucket) between the
    index side and the batch side — never a cartesian, and never an
    all-pairs within either side."""
    df = registry.QUERIES["dedup_incremental_lsh"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "band_idx" in plan and "bucket" in plan, plan


def test_quality_classifier_single_scan_no_shuffle_before_sort(spark):
    """Model scoring is embarrassingly parallel: the only exchanges are
    fan_out's parallelism-pinning repartition of the tiny documents file
    and the output sort's range partitioning — no aggregation or join
    exchange anywhere."""
    df = registry.QUERIES["quality_classifier_linear"](spark, SF_DIR)
    assert shuffle_count(df) <= 2, executed_plan(df)


def test_matview_refresh_merges_partials_without_raw_union(spark):
    """Two partial aggs + one merge agg: at most 3 exchanges (base
    partial, delta partial, merge/sort) — the refresh must not shuffle
    raw events into a single union-then-aggregate."""
    df = registry.QUERIES["matview_incremental_refresh"](spark, SF_DIR)
    assert shuffle_count(df) <= 4, executed_plan(df)
