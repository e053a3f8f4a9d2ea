"""Structured Streaming operators over the ``events`` table.

The reference is batch-only (every plan is Boundedness::Bounded,
src/physical.rs:44-45); this module is the engine's scale-path extension:
the same event analytics re-expressed as streams so a 100 TB/day feed is
processed incrementally instead of rescanned.

Test/driver shape: each query runs a file-source stream over the sf_dir's
events.parquet with ``Trigger.AvailableNow`` to a memory sink, waits for
completion, and returns the sink as a DataFrame — so streaming queries are
registrable in ``queries()`` with batch-SQL oracles (the streaming result of
a finite input must equal the batch result; that equality IS the test).

At scale the memory sink becomes a Delta/parquet sink and AvailableNow
becomes a continuous trigger; watermarks and state semantics are unchanged.
"""

from __future__ import annotations

import itertools
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query

_sink_ids = itertools.count()

# EWMA smoothing factor — MUST equal operators.events._EWMA_ALPHA so the
# streaming twin, the batch operator, and the shared oracle recurrence agree.
from ..operators.events import _EWMA_ALPHA as _EWMA_ALPHA_S  # noqa: E402



def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet (schema from the footer via a
    batch read; ts arrives as nanos-long under nanosAsLong and is converted
    to a microsecond timestamp exactly like engine._normalize_nanos)."""
    # Self-sufficient timestamp handling: a fresh driver session may run a
    # streaming query BEFORE any batch query has called load_tables (which
    # sets these confs); set them here so ts never surfaces as NTZ/long
    # unexpectedly regardless of invocation order.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    from pyspark.sql.types import LongType

    if isinstance(stream.schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
        )
    return stream


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over documents.parquet (schema from the footer via
    a batch read; no timestamp columns, so no nanos handling needed)."""
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _checkpoint_root() -> str:
    """Checkpoint parent dir: tmpfs when the host has one (state-store and
    offset-log writes are pure bookkeeping for these finite streams, and
    putting them on disk made identical runs vary 1.8s-15s under page-cache
    pressure), else the regular temp dir."""
    import tempfile

    shm = "/dev/shm"
    return shm if os.path.isdir(shm) and os.access(shm, os.W_OK) else tempfile.gettempdir()


def _run_to_memory(df: DataFrame, output_mode: str, timeout_s: int = 300) -> DataFrame:
    """Run a finite stream to a memory sink and return the sink table."""
    import shutil

    name = f"ddf_stream_sink_{next(_sink_ids)}"
    ckpt = os.path.join(_checkpoint_root(), f"ddf_ckpt_{os.getpid()}_{name}")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_s)
        if q.exception() is not None:
            raise q.exception()
        if not finished:
            # Still running: stop it BEFORE the checkpoint is deleted out
            # from under it, and surface the timeout instead of returning a
            # partial sink as if it were the complete result.
            q.stop()
            raise TimeoutError(
                f"streaming query {name!r} did not finish within {timeout_s}s"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return df.sparkSession.table(name)


@query(
    "streaming_tumbling_counts",
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
def streaming_tumbling_counts(spark, sf_dir):
    """Watermarked tumbling-window aggregation as a stream; the finite-input
    streaming result must equal the batch twin (events_tumbling_hourly)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("hour_start", "event_type")


@query(
    "streaming_tumbling_append",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
    event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value
    FROM events
    WHERE date_trunc('hour', ts) <= (SELECT max(ts) FROM events) - INTERVAL 2 hour
    GROUP BY 1, 2
    ORDER BY hour_start, event_type
    """,
)
def streaming_tumbling_append(spark, sf_dir):
    """Tumbling-window aggregation in APPEND mode: only watermark-CLOSED
    windows are emitted, so state is dropped as the watermark passes — the
    bounded-state regime a continuous 100 TB/day feed requires (the
    complete-mode variant keeps every window resident forever and exists as
    the finite-input test harness).

    Emission rule measured on this engine: a window is emitted once
    ``window.end <= watermark`` where the final watermark of an
    AvailableNow run is ``max(ts) - delay``; with a 1 h window and 1 h
    delay that is ``hour_start <= max(ts) - 2 h``, which is the oracle's
    restriction (boundary-exact only when max(ts) is not itself on a whole
    hour, true of this corpus's microsecond timestamps)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        "total_value",
    ).orderBy("hour_start", "event_type")


@query(
    "streaming_sliding_counts",
    oracle="""
    WITH starts AS (
    SELECT value, time_bucket(INTERVAL '30 minutes', ts) AS s0 FROM events
    ), expanded AS (
    SELECT value, s0 AS wstart FROM starts
    UNION ALL
    SELECT value, s0 - INTERVAL '30 minutes' AS wstart FROM starts
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value
    FROM expanded
    GROUP BY wstart
    ORDER BY window_start
    """,
)
def streaming_sliding_counts(spark, sf_dir):
    """Watermarked SLIDING-window aggregation (1 h window, 30 min slide):
    each event lands in exactly two overlapping windows.  The oracle
    expands each event to its two window starts and aggregates — the
    finite-input streaming result must equal that batch expansion."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
        "total_value",
    ).orderBy("window_start")


@query(
    "streaming_session_windows",
    oracle="""
    WITH gaps AS (
    SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
    >= 1800000000 OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
    THEN 1 ELSE 0 END AS new_session
    FROM events
    ), sess AS (
    SELECT user_id, ts,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
    FROM gaps
    )
    SELECT user_id,
    strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
    CAST(count(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY user_id, seq
    ORDER BY user_id, session_start
    """,
)
def streaming_session_windows(spark, sf_dir):
    """Native streaming session windows (F.session_window, 30-min gap) with
    a watermark — Spark's built-in stateful session assignment, the
    streaming twin of the batch gaps-and-islands sessionization.

    Boundary note: session_window closes at start + gap EXCLUSIVE (an event
    exactly 30 min after the previous one starts a NEW session), so the
    batch oracle's flag uses >= on the microsecond gap."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
    ).orderBy("user_id", "session_start")


@query(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value,
    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_stateful_user_stats(spark, sf_dir):
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, value-sum, distinct-type) state.

    This is the engine's 'operator Spark lacks' escape hatch (SURVEY.md §2
    Tier C UDF row → streaming state): arbitrary per-key state machines the
    built-in aggregates can't express.  On a finite input the emitted final
    state must equal the batch GROUP BY — that equality is the oracle.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total, types = (
            state.get if state.exists else (0, 0.0, [])
        )
        types = set(types)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            types.update(pdf["event_type"].unique().tolist())
        state.update((n, total, sorted(types)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "n_types": [len(types)],
            }
        )

    result = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, total_value double, n_types long",
            stateStructType="n long, total double, types array<string>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(result, "update")
    # One batch per finite run, but keep last-update-wins semantics explicit
    # in case the file source ever splits input across micro-batches.
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value", "n_types")
        .orderBy("user_id")
    )


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id,
    CAST(a.user_id AS BIGINT) AS user_id
    FROM events a JOIN events b ON a.user_id = b.user_id
    AND a.event_type = 'click' AND b.event_type = 'purchase'
    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
    ORDER BY click_id, purchase_id
    """,
)
def streaming_stream_stream_join(spark, sf_dir):
    """STREAM-STREAM inner join: clicks joined to purchases by the same
    user within 30 minutes, both sides watermarked so the state store can
    expire rows (the core Structured Streaming join capability; state per
    side is bounded by the watermark + time-range condition).  On finite
    input the appended result equals the batch interval join, which is the
    oracle."""
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = _run_to_memory(joined, "append")
    return out.select("click_id", "purchase_id", "user_id").orderBy(
        "click_id", "purchase_id"
    )


@query(
    "streaming_dedup_watermarked",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type
    FROM events GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def streaming_dedup_watermarked(spark, sf_dir):
    """Streaming deduplication: first occurrence per (user_id, event_type)
    key via ``dropDuplicatesWithinWatermark``, so dedup state genuinely ages
    out with the event-time watermark (plain ``dropDuplicates`` on a key
    subset that excludes the event-time column never expires state —
    unbounded at scale).  The trade: a key can be re-emitted once its state
    has expired, i.e. exact-once-per-key holds only within the watermark
    horizon.  On this finite input the file source delivers one micro-batch
    (the watermark only advances after it), so no state expires mid-run and
    the emitted key set equals batch DISTINCT — the oracle.  Only the KEY
    columns are emitted (which duplicate row arrives 'first' is
    execution-order-dependent; the key set is deterministic)."""
    ded = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = _run_to_memory(ded, "append")
    return out.select("user_id", "event_type").orderBy("user_id", "event_type")


@query(
    "streaming_static_join_dedup",
    oracle=r"""
    WITH fp AS (
    SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
    ), k AS (
    SELECT fp, CAST(min(doc_id) AS BIGINT) AS keeper_doc_id FROM fp GROUP BY fp
    )
    SELECT f.doc_id, k.keeper_doc_id, f.doc_id <> k.keeper_doc_id AS is_duplicate
    FROM fp f JOIN k USING (fp)
    ORDER BY doc_id
    """,
)
def streaming_static_join_dedup(spark, sf_dir):
    """STREAM-STATIC join — the incremental-ingestion dedup pattern: a
    batch-built keeper index (content fingerprint -> lowest doc_id, the
    dedup_exact relation) sits STATIC while new documents stream in and
    join against it, so each arriving document is flagged keeper-or-
    duplicate without rescanning the corpus.  This is how a 100 TB/day
    pipeline decontaminates/dedups its feed: the index is the standing
    artifact, the stream only pays a hash-probe of it per micro-batch
    (auto-broadcast while the index's size estimate is small — no hint:
    the index grows with the corpus, and a hint-forced broadcast of a
    corpus-sized relation OOMs at scale; past the threshold Spark probes
    it as a shuffled join per batch)
    (stream-static joins are stateless — nothing accumulates in the state
    store, unlike the stream-stream variant).

    On finite input the appended result equals the batch join of every
    document against the same index, which is the oracle."""
    from ..functions import fingerprint_md5

    index = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy(fingerprint_md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keeper_doc_id"))
    )
    flagged = (
        _documents_stream(spark, sf_dir)
        .withColumn("fp", fingerprint_md5("text"))
        .join(index, "fp")
        .select(
            "doc_id",
            "keeper_doc_id",
            (F.col("doc_id") != F.col("keeper_doc_id")).alias("is_duplicate"),
        )
    )
    out = _run_to_memory(flagged, "append")
    return out.orderBy("doc_id")


@query(
    "streaming_sliding_append",
    oracle="""
    WITH starts AS (
    SELECT value, time_bucket(INTERVAL '30 minutes', ts) AS s0 FROM events
    ), expanded AS (
    SELECT value, s0 AS wstart FROM starts
    UNION ALL
    SELECT value, s0 - INTERVAL '30 minutes' AS wstart FROM starts
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
    CAST(count(*) AS BIGINT) AS n_events,
    round(sum(value), 2) AS total_value
    FROM expanded
    WHERE wstart + INTERVAL 1 hour <= (SELECT max(ts) FROM events) - INTERVAL 1 hour
    GROUP BY wstart
    ORDER BY window_start
    """,
)
def streaming_sliding_append(spark, sf_dir):
    """Sliding windows (1 h window, 30 min slide) in APPEND mode: only
    watermark-closed windows are emitted and their state dropped — the
    bounded-state twin of streaming_sliding_counts (complete mode keeps
    every window resident forever).  Emission rule as measured for the
    tumbling variant: window.end <= max(ts) - delay; the oracle expands
    each event to its two window starts and keeps windows with
    wstart + 1 h <= max(ts) - 1 h (boundary-exact while max(ts) is not on
    a whole half-hour, true of this corpus's microsecond timestamps)."""
    agg = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
        "total_value",
    ).orderBy("window_start")


@query(
    "streaming_ewma_value",
    oracle=f"""
    SELECT user_id,
    CAST(count(*) AS BIGINT) AS n_events,
    round(list_reduce(list(value ORDER BY ts, event_id),
    (acc, x) -> acc * {1 - _EWMA_ALPHA_S} + x * {_EWMA_ALPHA_S}), 6)
    AS ewma_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_ewma_value(spark, sf_dir):
    """Streaming twin of ``events_ewma_value``: per-user EWMA kept as
    applyInPandasWithState state — the custom-stateful-operator shape a
    100 TB/day feed uses when the per-key fold must survive across
    micro-batches (state = (count, ewma), constant per key, vs the batch
    form's per-key event array).

    Within each state update the batch's rows fold in (ts, event_id)
    order with the same IEEE double recurrence as the batch operator and
    the DuckDB oracle, so on finite one-batch input all three agree
    bit-identically.  Cross-batch ordering rides on the source's
    per-file ordering (the AvailableNow file source delivers the finite
    input as one batch — the same assumption
    ``streaming_stateful_user_stats`` documents); a production deploy
    would add an event-time watermark + in-state reorder buffer."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    alpha = _EWMA_ALPHA_S

    def update(key, pdfs, state: GroupState):
        n, ewma = state.get if state.exists else (0, None)
        chunk = pd.concat(list(pdfs), ignore_index=True)
        chunk = chunk.sort_values(["ts", "event_id"])
        for v in chunk["value"].tolist():
            v = float(v)
            ewma = v if n == 0 else ewma * (1 - alpha) + v * alpha
            n += 1
        state.update((n, float(ewma)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma_value": [float(ewma)],
            }
        )

    result = (
        _events_stream(spark, sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, ewma_value double",
            stateStructType="n long, ewma double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(result, "update")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "n_events",
            # round JVM-side (same rounding mode as the batch operator and
            # the oracle), not in Python (banker's rounding)
            F.round("ewma_value", 6).alias("ewma_value"),
        )
        .orderBy("user_id")
    )
