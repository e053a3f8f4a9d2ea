"""fan_out's scan-rooted guard (r10 advice, reworked per r11 advice):
the partition-count read inside fan_out materializes query stages under
AQE when the plan contains exchanges, so non-scan-rooted plans are
rejected up front.  r12 replaced the rendered-plan regex with a JVM
TreeNode walk matching EXACT node names — no toString render per call,
no prefix false-positives on future node names.
"""

import pytest
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.functions import fan_out

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_scan_project_filter_admitted(spark):
    df = (
        spark.read.parquet(DOCS)
        .select("doc_id", F.lower("text").alias("t"))
        .where(F.length("t") > 3)
    )
    out = fan_out(df)
    assert out.count() > 0


def test_aggregate_rejected(spark):
    with pytest.raises(ValueError, match="scan-rooted"):
        fan_out(spark.read.parquet(DOCS).groupBy("lang").count())


def test_join_rejected(spark):
    df = spark.read.parquet(DOCS)
    with pytest.raises(ValueError, match="scan-rooted"):
        fan_out(df.join(df.select("doc_id"), "doc_id"))


def test_repartition_rejected(spark):
    # RepartitionByExpression must be its own exact entry now that
    # matching is exact (the old prefix match covered it via
    # "Repartition"); a silent admit here would reintroduce the
    # AQE-materialization trap the guard exists for.
    with pytest.raises(ValueError, match="scan-rooted"):
        fan_out(spark.read.parquet(DOCS).repartition("lang"))


def test_sort_and_limit_rejected(spark):
    with pytest.raises(ValueError, match="scan-rooted"):
        fan_out(spark.read.parquet(DOCS).orderBy("doc_id"))
    with pytest.raises(ValueError, match="scan-rooted"):
        fan_out(spark.read.parquet(DOCS).limit(5))


def test_subquery_hosted_aggregate_rejected(spark):
    """r12 advice: a children()-only walk misses plans hosted inside
    EXPRESSIONS (IN/EXISTS/scalar subqueries) — this plan's only
    exchange-implying node is the Aggregate inside the IN-subquery, which
    treeString prints under the subquery but children() never yields.
    The guard must traverse subqueries() and reject it."""
    spark.read.parquet(DOCS).createOrReplaceTempView("fanout_guard_docs")
    df = spark.sql(
        "SELECT doc_id FROM fanout_guard_docs "
        "WHERE doc_id IN (SELECT max(doc_id) FROM fanout_guard_docs)"
    )
    with pytest.raises(ValueError, match="scan-rooted"):
        fan_out(df)
