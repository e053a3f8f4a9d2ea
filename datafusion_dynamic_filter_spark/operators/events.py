"""Event-stream operators over the ``events`` table (batch forms; the
streaming twins live in ``streaming/``): tumbling windows, sessionization,
funnels, as-of enrichment.  All window/aggregate built-ins — no UDFs."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import round_half_away
from ..registry import query, tables


@query(
    "events_tumbling_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
    event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY hour_start, event_type
    """,
)
def events_tumbling_hourly(spark, sf_dir):
    """Tumbling 1-hour window aggregation (batch twin of the streaming
    windowed count; F.window gives identical bucketing at any scale)."""
    t = tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.date_format(F.window("ts", "1 hour").getField("start"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("hour_start", "event_type")
    )


@query(
    "events_rollup_daily_from_hourly",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
    event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value,
    sign(round(sum(value), 2) / count(*))
    * floor(abs(round(sum(value), 2) / count(*)) * 10000 + 0.5) / 10000 AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def events_rollup_daily_from_hourly(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup: daily totals answered
    FROM the hourly rollup, never from raw events.  This is the two-tier
    pattern a 100 TB/day event store lives on — the hourly aggregate is
    the standing materialization (here built inline; at scale it is a
    table the streaming job maintains), and coarser windows re-aggregate
    it at ~1/3600th the input size.

    Mergeability discipline: the hourly tier carries only ALGEBRAIC
    aggregates in raw form (count, unrounded sum) so the daily tier's
    re-aggregation is EXACT — avg is derived as sum/count at the final
    tier, and rounding happens only on output columns.  The oracle
    computes the daily answer directly from raw events; equality of the
    two paths is precisely the correctness contract of a continuous
    aggregate."""
    t = tables(spark, sf_dir)
    hourly = (
        t["events"]
        .groupBy(
            F.window("ts", "1 hour").getField("start").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),  # unrounded: must re-aggregate
        )
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour_start"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("total_value"),
            # avg derives from the ROUNDED 2-decimal total, not the raw
            # float sum: the engines' sums differ in the last ulp from
            # accumulation order, and avg-of-eighths sits exactly on
            # 4-decimal half boundaries where that ulp flips the rounding.
            # The 2-decimal total is bit-identical cross-engine (2-decimal
            # data never lands near its own boundary), and the division is
            # then rounded half-away on both engines (IEEE-exact
            # emulation, functions.round_half_away).
            round_half_away(
                F.round(F.sum("sum_value"), 2) / F.sum("n_events"), 4
            ).alias("avg_value"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH gaps AS (
    SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    > 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_session
    FROM events
    ), sessions AS (
    SELECT user_id, event_id,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
    FROM gaps
    )
    SELECT user_id,
    CAST(max(session_seq) AS BIGINT) AS n_sessions,
    CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): the classic
    lag -> flag -> running-sum pattern; at scale the only shuffle is the
    window partition on user_id."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Microsecond arithmetic on both engines: second-granularity casts
    # truncate and disagree exactly at the 30-min boundary.
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    sessions = t["events"].select(
        "user_id",
        "event_id",
        F.sum(new_session).over(run).alias("session_seq"),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.max("session_seq").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "events_funnel",
    oracle="""
    SELECT
    CAST(count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT) AS viewed,
    CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS clicked,
    CAST(count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS purchased
    FROM events
    """,
)
def events_funnel(spark, sf_dir):
    """Conditional distinct-count funnel in one pass over the events scan."""
    t = tables(spark, sf_dir)
    return t["events"].agg(
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("viewed"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("clicked"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("purchased"),
    )


@query(
    "events_asof_enrich",
    oracle="""
    WITH signup AS (
    SELECT user_id, min(ts) AS signup_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT e.user_id,
    CAST(count(*) AS BIGINT) AS n_after_signup,
    round(sum(e.value), 2) AS value_after_signup
    FROM events e JOIN signup s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def events_asof_enrich(spark, sf_dir):
    """Point-in-time (as-of) enrichment: activity at-or-after each user's
    first signup.  The range condition rides on the user_id equi-join, so
    Spark still gets a hash join with a post-join filter — no BNLJ."""
    t = tables(spark, sf_dir)
    signup = (
        t["events"]
        .filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    e = t["events"].alias("e")
    s = signup.alias("s")
    return (
        e.join(
            s,
            (F.col("e.user_id") == F.col("s.user_id"))
            & (F.col("e.ts") >= F.col("s.signup_ts")),
        )
        .groupBy(F.col("e.user_id").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_after_signup"),
            F.round(F.sum("e.value"), 2).alias("value_after_signup"),
        )
        .orderBy("user_id")
    )


@query(
    "events_range_join_bins",
    oracle="""
    WITH bins AS (
    SELECT 0 AS bin_id, 0.0 AS lo, 25.0 AS hi UNION ALL
    SELECT 1, 25.0, 50.0 UNION ALL
    SELECT 2, 50.0, 75.0 UNION ALL
    SELECT 3, 75.0, 1e9
    )
    SELECT b.bin_id, CAST(count(*) AS BIGINT) AS n, round(avg(e.value), 4) AS avg_value
    FROM events e JOIN bins b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bin_id
    ORDER BY b.bin_id
    """,
)
def events_range_join_bins(spark, sf_dir):
    """Theta/range join against a tiny bin table — broadcast nested loop on
    purpose: the small side is 4 rows, so BNLJ is the *right* physical plan
    and stays O(n) at any scale."""
    t = tables(spark, sf_dir)
    bins = spark.createDataFrame(
        [(0, 0.0, 25.0), (1, 25.0, 50.0), (2, 50.0, 75.0), (3, 75.0, 1e9)],
        "bin_id int, lo double, hi double",
    )
    e = t["events"]
    return (
        e.join(F.broadcast(bins), (e.value >= bins.lo) & (e.value < bins.hi))
        .groupBy("bin_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .orderBy("bin_id")
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH first_seen AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cohort_week FROM events GROUP BY user_id
    ), active AS (
    SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    ), joined AS (
    SELECT f.cohort_week, CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT) AS week_offset,
    a.user_id
    FROM active a JOIN first_seen f USING (user_id)
    ), per AS (
    SELECT cohort_week, week_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
    FROM joined GROUP BY 1, 2
    ), sizes AS (
    SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size FROM first_seen GROUP BY 1
    )
    SELECT strftime(p.cohort_week, '%Y-%m-%d') AS cohort_week, p.week_offset, p.n_active,
    round(p.n_active / CAST(s.cohort_size AS DOUBLE), 4) AS retention
    FROM per p JOIN sizes s USING (cohort_week)
    ORDER BY cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week; for each
    (cohort week, weeks-since-cohort) cell, the distinct users still active
    and the retained fraction of the cohort.

    Scale shape: both the first-seen reduction and the distinct-activity
    projection shuffle on user_id (co-partitioned join, no broadcast of the
    user dimension needed at any scale); the cell rollup shuffles on the
    (cohort_week, offset) key, whose cardinality is weeks^2 — tiny.  Week
    offsets are exact multiples of 7 days because both sides are
    week-truncated, so the integer division is exact."""
    t = tables(spark, sf_dir)
    ev = t["events"]
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    joined = active.join(first_seen, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
        "user_id",
    )
    per = joined.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_active")
    )
    sizes = first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        per.join(sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size").cast("double"), 4).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "matview_incremental_refresh",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS sum_value,
    round(max(value), 2) AS max_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def matview_incremental_refresh(spark, sf_dir):
    """Incremental materialized-view maintenance: a daily rollup kept as
    partial-aggregate state, refreshed by MERGING a new-batch delta
    instead of recomputing over history — the pattern that keeps a 100 TB
    hypertable rollup O(batch) per refresh instead of O(corpus).

    The base/delta split is a deterministic partition of events (event_id
    mod 10: 80% "already rolled up", 20% "today's arrivals").  Both sides
    reduce to partial-aggregate rows (count, sum, max per (day, type) —
    each mergeable: counts add, sums add, maxes max), and the refresh is
    ONE tiny groupBy over base+delta partials, never touching raw history.
    The oracle recomputes the rollup from ALL raw events — passing means
    merge(base, delta) == recompute(corpus), the algebraic property that
    makes the maintenance valid.  Plan: two scans (in production the base
    side is a read of the stored rollup, not a recompute) + one union of
    KB-sized partials + one merge agg; no shuffle of raw events beyond
    the two partial aggs."""
    t = tables(spark, sf_dir)
    ev = t["events"].select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        "value",
        (F.col("event_id") % 10 < 8).alias("is_base"),
    )

    def partials(side):
        return side.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
        )

    base = partials(ev.filter(F.col("is_base")))
    delta = partials(ev.filter(~F.col("is_base")))
    merged = (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).alias("sum_value"),
            F.round(F.max("max_value"), 2).alias("max_value"),
        )
    )
    return merged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
        "max_value",
    ).orderBy("day", "event_type")


_MAD_K = 3.0  # outlier threshold in robust sigmas
_MAD_SCALE = 1.4826  # MAD -> sigma consistency constant for normal data


@query(
    "events_anomaly_mad",
    oracle=f"""
    WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY event_type
    ), dev AS (
    SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
    FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
    SELECT event_type, quantile_cont(adev, 0.5) AS mad
    FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(d.med, 4) AS median_value,
    round(m.mad, 4) AS mad,
    CAST(sum(CASE WHEN round(d.adev, 6) >
    round({_MAD_K} * {_MAD_SCALE} * m.mad, 6) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.med, m.mad
    ORDER BY d.event_type
    """,
)
def events_anomaly_mad(spark, sf_dir):
    """Robust outlier detection per event type: median / MAD (median
    absolute deviation) and the count of events beyond 3 robust sigmas —
    the monitoring pass that survives the heavy-tailed value
    distributions mean/stddev z-scores choke on.

    Exact interpolated medians (percentile, not approx) so the oracle is
    exact; both medians reduce per event_type (bounded cardinality), the
    deviation join is an equi-join against the broadcast-small per-type
    medians, and the outlier comparison is rounded to 6 dp on both
    engines so interpolation ulps cannot flip the count.  At 100 TB the
    exact median would move to approx_percentile with a documented error
    bound — the plan shape (two grouped reductions + one equi-join) is
    unchanged."""
    t = tables(spark, sf_dir)
    ev = t["events"].select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    is_out = F.round(F.col("adev"), 6) > F.round(
        F.lit(_MAD_K * _MAD_SCALE) * F.col("mad"), 6
    )
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_events",
            F.round("med", 4).alias("median_value"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


_EWMA_ALPHA = 0.2  # smoothing factor: weight of the newest observation


@query(
    "events_ewma_value",
    oracle=f"""
    SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_events,
    round(list_reduce(list(value ORDER BY ts, event_id),
    (acc, x) -> acc * {1 - _EWMA_ALPHA} + x * {_EWMA_ALPHA}), 6)
    AS ewma_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_ewma_value(spark, sf_dir):
    """Per-user exponentially-weighted moving average of event values —
    the classic online feature a training pipeline materializes per
    entity (user health score, rate-limit signal, engagement feature).
    EWMA is inherently sequential, so this is the pattern for ordered
    per-key folds in a distributed engine: collect each key's (bounded)
    event sequence into an in-row array, sort it IN the row, and fold
    with ``F.aggregate`` — no window over a global sort, no Python.

    Cross-engine determinism: both engines fold the SAME values in the
    SAME (ts, event_id) order with the SAME IEEE double ops
    (acc*0.8 + x*0.2, seeded by the first value), so the result is
    bit-identical before the cosmetic 6-dp round.

    Scale notes (100 TB): one shuffle on user_id; state per key is that
    key's event array (bounded per entity — the same per-key-bounded
    assumption every sessionizer makes).  For unbounded keys the fold
    becomes the streaming twin (applyInPandasWithState); the batch form
    stays a single map-side-combinable collect per key."""
    t = tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("tsu"),
            F.col("event_id").alias("eid"),
            F.col("value").alias("v"),
        ).alias("obs"),
    )
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("obs")).alias("seq")
    )
    vals = F.transform("seq", lambda o: o["v"])
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            acc * F.lit(1 - _EWMA_ALPHA) + x * F.lit(_EWMA_ALPHA)
        ),
    )
    return seq.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    ).orderBy("user_id")


_HOLT_ALPHA = 0.3  # level smoothing
_HOLT_BETA = 0.1  # trend smoothing


@query(
    "events_holt_trend",
    oracle="""
    WITH RECURSIVE seq AS (
    SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
    FROM events
    ), n AS (
    SELECT user_id, count(*) AS n_events FROM seq GROUP BY user_id
    ), state(user_id, idx, l, t) AS (
    SELECT user_id, idx, value, 0.0e0 FROM seq WHERE idx = 1
    UNION ALL
    SELECT s.user_id, x.idx,
    0.3e0 * x.value + 0.7e0 * (s.l + s.t),
    0.1e0 * ((0.3e0 * x.value + 0.7e0 * (s.l + s.t)) - s.l) + 0.9e0 * s.t
    FROM state s JOIN seq x ON x.user_id = s.user_id AND x.idx = s.idx + 1
    )
    SELECT st.user_id,
    CAST(n.n_events AS BIGINT) AS n_events,
    round(st.l, 6) AS level,
    round(st.t, 6) AS trend
    FROM state st JOIN n ON n.user_id = st.user_id AND st.idx = n.n_events
    ORDER BY st.user_id
    """,
)
def events_holt_trend(spark, sf_dir):
    """Holt double-exponential smoothing per user: level AND trend kept
    through one ordered fold — the two-state generalization of the EWMA
    operator, and the standard short-horizon forecaster a feature
    pipeline materializes per entity (forecast = level + trend).

    The fold state is a (level, trend) STRUCT folded by Spark's
    F.aggregate; the DuckDB oracle runs the same recurrence as a
    RECURSIVE CTE stepping each user's (ts, event_id)-ranked sequence.
    (Not list_reduce: DuckDB 1.0 evaluates a struct-lambda's fields
    sequentially and MUTATES the accumulator between fields, so a
    two-field state reads the new level while computing the trend —
    measured, not documented; the recursive form has standard
    semantics.)  Same values, same order, same IEEE ops =>
    bit-identical before the cosmetic round.

    Scale notes: identical shape to events_ewma_value — one shuffle on
    user_id, per-key state bounded by that key's event array."""
    t = tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id",
        F.struct(
            F.unix_micros("ts").alias("tsu"),
            F.col("event_id").alias("eid"),
            F.col("value").alias("v"),
        ).alias("obs"),
    )
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("obs")).alias("seq")
    )
    vals = F.transform("seq", lambda o: o["v"])
    al, be = _HOLT_ALPHA, _HOLT_BETA

    def step(acc, x):
        new_l = F.lit(al) * x + F.lit(1 - al) * (acc["l"] + acc["t"])
        new_t = F.lit(be) * (new_l - acc["l"]) + F.lit(1 - be) * acc["t"]
        seeded = F.struct(x.alias("l"), F.lit(0.0).alias("t"))
        stepped = F.struct(new_l.alias("l"), new_t.alias("t"))
        return F.when(acc["l"].isNull(), seeded).otherwise(stepped)

    zero = F.struct(
        F.lit(None).cast("double").alias("l"), F.lit(0.0).alias("t")
    )
    state = F.aggregate(vals, zero, step)
    return seq.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.round(state["l"], 6).alias("level"),
        F.round(state["t"], 6).alias("trend"),
    ).orderBy("user_id")


_CUSUM_SLACK = 0.5  # slack in global sigmas


@query(
    "events_cusum_drift",
    oracle=f"""
    WITH RECURSIVE stats AS (
    SELECT round(avg(value), 6) AS mu,
    round(stddev_samp(value), 6) AS sigma FROM events
    ), seq AS (
    SELECT user_id, value, mu + {_CUSUM_SLACK}e0 * sigma AS k,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS idx
    FROM events CROSS JOIN stats
    ), n AS (
    SELECT user_id, count(*) AS n_events FROM seq GROUP BY user_id
    ), state(user_id, idx, s, m) AS (
    SELECT user_id, idx, greatest(0.0e0, value - k),
    greatest(0.0e0, value - k) FROM seq WHERE idx = 1
    UNION ALL
    SELECT st.user_id, x.idx,
    greatest(0.0e0, st.s + (x.value - x.k)),
    greatest(st.m, greatest(0.0e0, st.s + (x.value - x.k)))
    FROM state st JOIN seq x
    ON x.user_id = st.user_id AND x.idx = st.idx + 1
    )
    SELECT st.user_id,
    CAST(n.n_events AS BIGINT) AS n_events,
    round(st.s, 4) AS cusum_final,
    round(st.m, 4) AS cusum_max
    FROM state st JOIN n ON n.user_id = st.user_id AND st.idx = n.n_events
    ORDER BY st.user_id
    """,
)
def events_cusum_drift(spark, sf_dir):
    """One-sided CUSUM drift detection per user: the running
    max(0, s + (x - mu - 0.5 sigma)) statistic against the global mean,
    plus its high-water mark — the classic sequential change-point
    monitor (Page 1954) a pipeline runs per entity to flag upward value
    drift long before a windowed mean moves.

    Same ordered in-row fold family as events_ewma_value /
    events_holt_trend, with a TWO-field (current, max) struct
    accumulator; the oracle is a recursive CTE (the DuckDB struct-lambda
    mutation quirk documented on the Holt operator applies here too).
    The (mu, sigma) reference is rounded to 6 dp on both engines BEFORE
    the fold, so the fold inputs — and therefore every step — are
    bit-identical.

    Scale notes: one global 1-row stats reduction broadcasts into the
    scan; one shuffle on user_id; per-key state bounded by that key's
    event array."""
    t = tables(spark, sf_dir)
    stats = t["events"].agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sigma"),
    )
    ev = t["events"].crossJoin(F.broadcast(stats)).select(
        "user_id",
        (F.col("mu") + F.lit(_CUSUM_SLACK) * F.col("sigma")).alias("k"),
        F.struct(
            F.unix_micros("ts").alias("tsu"),
            F.col("event_id").alias("eid"),
            F.col("value").alias("v"),
        ).alias("obs"),
    )
    seq = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("obs")).alias("seq"),
        F.first("k").alias("k"),
    )
    vals = F.transform("seq", lambda o: o["v"])

    def step(acc, x):
        s_new = F.greatest(F.lit(0.0), acc["s"] + (x - F.col("k")))
        return F.struct(
            s_new.alias("s"), F.greatest(acc["m"], s_new).alias("m")
        )

    zero = F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("m"))
    state = F.aggregate(vals, zero, step)
    return seq.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.round(state["s"], 4).alias("cusum_final"),
        F.round(state["m"], 4).alias("cusum_max"),
    ).orderBy("user_id")
