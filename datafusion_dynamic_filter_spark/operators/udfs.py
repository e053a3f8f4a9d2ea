"""UDF surface (SURVEY.md §2 Tier C last row): the reference snapshots
scalar/aggregate/window UDF registries per prepared statement
(src/parameterized_statement.rs:16-18,30-49); Spark's equivalents are
``pandas_udf`` (scalar + grouped-agg) and ``applyInPandas``.

Each operator here deliberately computes something ALSO expressible in SQL,
so the DuckDB oracle validates the UDF path end-to-end — the point is
proving the Arrow-batched Python boundary, not novel math.  UDFs are the
slow path at 100 TB: these exist to cover the API surface; the hot-path
operators elsewhere stay JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import round_half_away
from ..registry import query, tables


def _oracle_round(expr: str, scale: int) -> str:
    """DuckDB-side twin of functions.round_half_away: round-half-away on the
    IEEE binary value, bit-identical to the Spark-side formula."""
    pow10 = float(10**scale)
    return f"sign({expr}) * floor(abs({expr}) * {pow10} + 0.5) / {pow10}"


@query(
    "pandas_udf_scalar",
    oracle=f"""
    SELECT o_orderkey,
    {_oracle_round("o_totalprice * CAST(CASE o_orderstatus WHEN 'F' THEN 0.9 WHEN 'O' THEN 1.0 ELSE 0.95 END AS DOUBLE)", 2)}
    AS adjusted_price
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def pandas_udf_scalar(spark, sf_dir):
    """Arrow-batched scalar pandas_udf inside a prepared-statement-shaped
    query (vectorized status-dependent repricing)."""
    t = tables(spark, sf_dir)

    @pandas_udf("double")
    def adjust(price: pd.Series, status: pd.Series) -> pd.Series:
        factor = status.map({"F": 0.9, "O": 1.0}).fillna(0.95)
        # No rounding here: Python rounds half-even, SQL engines round
        # half-away — final rounding happens JVM-side in F.round.
        return price * factor

    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            round_half_away(
                adjust(F.col("o_totalprice"), F.col("o_orderstatus")), 2
            ).alias("adjusted_price"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "pandas_udf_grouped_agg",
    oracle=f"""
    SELECT c_mktsegment,
    {_oracle_round("sum(c_acctbal * c_custkey) / sum(c_custkey)", 4)} AS weighted_balance
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def pandas_udf_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas_udf: custkey-weighted mean balance per segment."""
    t = tables(spark, sf_dir)

    @pandas_udf("double")
    def weighted_mean(bal: pd.Series, weight: pd.Series) -> float:
        return float((bal * weight).sum() / weight.sum())

    return (
        t["customer"]
        .groupBy("c_mktsegment")
        .agg(
            round_half_away(
                weighted_mean(F.col("c_acctbal"), F.col("c_custkey")), 4
            ).alias("weighted_balance")
        )
        .orderBy("c_mktsegment")
    )


@query(
    "apply_in_pandas_zscore",
    oracle=f"""
    WITH stats AS (
    SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
    FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
    {_oracle_round("(e.value - s.mu) / s.sigma", 4)} AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE e.event_id < 200
    ORDER BY e.event_id
    """,
)
def apply_in_pandas_zscore(spark, sf_dir):
    """applyInPandas: per-group z-score normalization (the canonical
    'custom per-group transform' shape; group = event_type, so partition
    count is bounded and batches are Arrow-sized)."""
    t = tables(spark, sf_dir)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mu = pdf["value"].mean()
        sigma = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        z = (pdf["value"] - mu) / sigma
        # half-away on the binary value (pandas .round is half-even)
        out["zscore"] = np.sign(z) * np.floor(np.abs(z) * 1e4 + 0.5) / 1e4
        return out

    return (
        t["events"]
        .groupBy("event_type")
        .applyInPandas(zscore, "event_id long, event_type string, zscore double")
        .filter(F.col("event_id") < 200)
        .orderBy("event_id")
    )


@query(
    "map_in_pandas_tokens",
    oracle="""
    SELECT doc_id,
    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
    CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents WHERE n_chars > 0
    ORDER BY doc_id
    """,
)
def map_in_pandas_tokens(spark, sf_dir):
    """mapInPandas over document batches (the multimodal/decode plumbing
    shape): per-batch tokenization + byte accounting."""
    t = tables(spark, sf_dir)

    def count_tokens(batches):
        for pdf in batches:
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["n_tokens"] = (
                pdf["text"].str.strip().str.lower().str.split(r"\s+").str.len()
            )
            out["n_bytes"] = pdf["text"].str.len()
            yield out

    return (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "text")
        .mapInPandas(count_tokens, "doc_id long, n_tokens long, n_bytes long")
        .orderBy("doc_id")
    )


@query(
    "sql_udf_registered",
    oracle=f"""
    SELECT p_partkey, {_oracle_round("p_retailprice * CAST(1.21 AS DOUBLE)", 2)} AS price_with_vat
    FROM part WHERE p_partkey < 50 ORDER BY p_partkey
    """,
)
def sql_udf_registered(spark, sf_dir):
    """spark.udf.register + use inside SQL text (the reference's
    registry-snapshot scenario: a prepared statement referencing a session
    UDF, src/parameterized_statement.rs:89-162)."""
    from ..engine import Engine

    tables(spark, sf_dir)
    # UDF returns the raw product; SQL-side round() keeps half-away
    # semantics identical across engines (Python round is half-even).
    spark.udf.register("with_vat", lambda p: p * 1.21, "double")
    stmt = Engine(spark).prepare(
        "SELECT p_partkey, "
        "sign(with_vat(p_retailprice)) * floor(abs(with_vat(p_retailprice)) * 100.0 + 0.5) / 100.0 "
        "AS price_with_vat "
        "FROM part WHERE p_partkey < $1"
    )
    return stmt.execute([50])
