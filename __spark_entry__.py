"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship prepared-statement query at sf0.001.
``queries()`` / ``oracle_sql()`` re-export the engine's operator registry
(datafusion_dynamic_filter_spark/registry.py) — one entry per implemented
operator from SURVEY.md §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_dynamic_filter_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one PreparedStatement executed twice with different
    parameters (the reference's defining behavior,
    tests/preparable_context_basic_test.rs:106-145), then a prepared
    aggregation — returns the TPC-H Q1 style pricing summary."""
    from datafusion_dynamic_filter_spark import Engine

    sf_dir = "/root/testdata/sf0.001"
    registry.tables(spark, sf_dir)
    eng = Engine(spark)
    lookup = eng.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    lookup.execute({"$1": 1}).collect()
    lookup.execute({"$1": 5}).collect()
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
