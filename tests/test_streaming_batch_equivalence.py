"""Engine-internal equivalence: the streaming twin of an operator must
produce EXACTLY the batch operator's result on finite input — a stronger
gate than each side's oracle parity alone, because it pins the two
implementations (per-key array fold vs applyInPandasWithState fold) to the
same IEEE recurrence, not merely to the same rounded projection."""

import os

from datafusion_dynamic_filter_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def test_streaming_ewma_equals_batch_ewma(spark):
    batch = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in registry.QUERIES["events_ewma_value"](spark, SF_DIR).collect()
    }
    stream = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in registry.QUERIES["streaming_ewma_value"](spark, SF_DIR).collect()
    }
    assert batch == stream, {
        k: (batch.get(k), stream.get(k))
        for k in set(batch) | set(stream)
        if batch.get(k) != stream.get(k)
    }


def test_streaming_user_stats_equals_batch_groupby(spark):
    """Same equivalence for the running (count, sum, distinct) state op vs
    a plain batch GROUP BY computed here inline."""
    from pyspark.sql import functions as F

    from datafusion_dynamic_filter_spark.registry import tables

    t = tables(spark, SF_DIR)
    batch = {
        r.user_id: (r.n_events, r.total_value, r.n_types)
        for r in t["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .collect()
    }
    stream = {
        r.user_id: (r.n_events, r.total_value, r.n_types)
        for r in registry.QUERIES["streaming_stateful_user_stats"](
            spark, SF_DIR
        ).collect()
    }
    assert batch == stream
