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


@query(
    "per_group_ols_fit",
    oracle="""
    SELECT event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(regr_slope(value, hour(ts)), 6) AS slope,
    round(regr_intercept(value, hour(ts)), 4) AS intercept,
    round(regr_r2(value, hour(ts)), 6) AS r2
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def per_group_ols_fit(spark, sf_dir):
    """The 'many models' pattern: fit one model PER GROUP with
    applyInPandas (here closed-form OLS of event value on hour-of-day,
    computed with numpy inside each group's Arrow batch) — the shape a
    feature pipeline uses for thousands of per-entity/per-segment models
    where a single global fit won't do.

    The DuckDB oracle is the DECLARATIVE form of the same fit
    (regr_slope/intercept/r2), so parity proves the UDF path computes
    exactly what the relational path would — the guarantee that lets a
    pipeline swap between them.  The regressor is an integer (hour), so
    its moment sums are exact; the value-side sums differ from the
    engines' only in last-ulp accumulation order, far below the emitted
    rounding grains.

    Scale notes (100 TB): groups shuffle once on the group key; each fit
    is O(group) inside its Arrow batch with constant output (the model
    row).  Per-key-bounded groups is the same assumption as every
    grouped fit; unbounded groups would move the moment sums to a
    built-in aggregation (see stats_regression_by_nation) and keep only
    the final solve in Python."""
    t = tables(spark, sf_dir)
    ev = t["events"].select(
        "event_type", F.hour("ts").cast("double").alias("x"), F.col("value").alias("y")
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["x"].to_numpy(dtype="float64")
        y = pdf["y"].to_numpy(dtype="float64")
        n = float(len(x))
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        slope = (n * sxy - sx * sy) / dx
        intercept = (sy - slope * sx) / n
        r2 = (n * sxy - sx * sy) ** 2 / (dx * dy)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [int(n)],
                "slope": [slope],
                "intercept": [intercept],
                "r2": [r2],
            }
        )

    out = ev.groupBy("event_type").applyInPandas(
        fit,
        "event_type string, n_events long, slope double, intercept double, r2 double",
    )
    return out.select(
        "event_type",
        "n_events",
        # round JVM-side (same rounding mode as the oracle's round())
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    ).orderBy("event_type")
