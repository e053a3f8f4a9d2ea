"""Avro gating: the format is part of the reference surface (SURVEY.md §2
Tier C row 1) but an external Spark module.  When the package is present the
round-trip must preserve values; when absent the helper must fail with the
actionable gating error, never Spark's generic datasource failure."""

import pytest

from datafusion_dynamic_filter_spark.sources import avro_available, roundtrip_avro


def test_avro_roundtrip_or_gated_error(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "cast(id * 2 as string) AS s")
    if avro_available(spark):
        back = roundtrip_avro(df, str(tmp_path / "avro"))
        assert sorted(r["id"] for r in back.collect()) == [0, 1, 2, 3, 4]
        assert back.schema == df.schema
    else:
        with pytest.raises(NotImplementedError, match="spark-avro"):
            roundtrip_avro(df, str(tmp_path / "avro"))


def test_avro_query_registration_tracks_availability(spark):
    """The round-trip query joins the registry only when the module is
    deployable: green row when present, NO row (not a red one) when absent."""
    from datafusion_dynamic_filter_spark import registry
    from datafusion_dynamic_filter_spark.sources import (
        _avro_jar_on_classpath,
        source_avro_roundtrip,
    )

    registry.load_all()
    if _avro_jar_on_classpath():
        assert "source_avro_roundtrip" in registry.QUERIES
        assert "source_avro_roundtrip" in registry.ORACLES
        df = registry.QUERIES["source_avro_roundtrip"](spark, "/root/testdata/sf0.001")
        assert df.collect()[0].n_regions == 5
    else:
        assert "source_avro_roundtrip" not in registry.QUERIES
        with pytest.raises(NotImplementedError, match="spark-avro"):
            source_avro_roundtrip(spark, "/root/testdata/sf0.001")
