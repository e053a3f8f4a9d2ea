"""Source/sink connectors — the engine twin of the reference's inherited
DataFusion source surface (SURVEY.md §2 Tier C row 1: Parquet/CSV/JSON
listing tables, MemTable, COPY ... TO).

Each query is a ROUND-TRIP: read the canonical parquet table, write it
through the format under test, read it back, and aggregate.  The DuckDB
oracle runs the same aggregate on the original parquet — so the parity check
proves the sink+source preserve values, not just that the code runs.

Scale notes: writes repartition to a bounded file count (small dims -> 1
file; facts -> shuffle-partition count); the partitioned-parquet sink
demonstrates partition pruning (the scan of one partition reads one
directory, verified in tests via plans.pushed_filters / input file count).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import query, tables

_ROOT = os.path.join(tempfile.gettempdir(), "ddf_spark_sources")


def _sink_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_ROOT, tag, name)


# Fingerprint-based invalidation for cached derived layouts (the driver
# regenerates testdata in place between rounds; a stale copy would silently
# diverge from the oracle's fresh table).  Shared with the layouts module.
from ..layouts import (  # noqa: E402
    layout_stale as _cached_layout_stale,
    source_fingerprint as _source_fingerprint,  # noqa: F401 (probe scripts)
    write_layout_marker as _write_layout_marker,
)


def roundtrip_csv(df: DataFrame, path: str) -> DataFrame:
    """COPY ... TO CSV + listing-table read-back with the written schema
    (CSV is untyped on disk; the engine supplies the schema on read, the
    analog of the reference's explicit Schema registration)."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    return df.sparkSession.read.schema(df.schema).option("header", "true").csv(path)


def roundtrip_json(df: DataFrame, path: str) -> DataFrame:
    df.coalesce(1).write.mode("overwrite").json(path)
    return df.sparkSession.read.schema(df.schema).json(path)


def roundtrip_orc(df: DataFrame, path: str) -> DataFrame:
    df.coalesce(1).write.mode("overwrite").orc(path)
    return df.sparkSession.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True if the external spark-avro module is on the session classpath.

    Avro is a DataFusion default-feature listing format (SURVEY.md §2 Tier C
    row 1) but an EXTERNAL module in Spark (org.apache.spark:spark-avro);
    this container ships only avro-core jars, so the datasource is probed,
    not assumed."""
    try:
        # Ask Spark's own datasource resolver — classpath probes lie (the
        # avro-core jars ship without the spark-avro datasource registration).
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsc.sc().conf()
        )
        return True
    except Exception:
        return False


def roundtrip_avro(df: DataFrame, path: str) -> DataFrame:
    """COPY ... TO Avro + read-back.  Raises a clear, actionable error when
    the spark-avro package is not deployed (rather than Spark's generic
    'Failed to find data source') — the engine's only gated format."""
    if not avro_available(df.sparkSession):
        raise NotImplementedError(
            "Avro source/sink requires the external spark-avro package "
            "(org.apache.spark:spark-avro_2.13); it is not on this session's "
            "classpath. Add it via spark.jars.packages to enable."
        )
    df.coalesce(1).write.mode("overwrite").format("avro").save(path)
    return df.sparkSession.read.format("avro").load(path)


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT n_regionkey,
    CAST(count(*) AS BIGINT) AS n_nations,
    min(n_name) AS first_nation
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    """nation -> CSV -> read back -> aggregate; values must survive the
    text round-trip exactly."""
    t = tables(spark, sf_dir)
    nation = roundtrip_csv(
        t["nation"].select("n_nationkey", "n_name", "n_regionkey"),
        _sink_dir(sf_dir, "nation_csv"),
    )
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("n_regionkey")
    )


def _avro_jar_on_classpath() -> bool:
    """Registration-time probe (no session exists when modules import): the
    spark-avro datasource jar in pyspark's jars dir.  Weaker than
    avro_available()'s resolver probe — used only to decide whether the
    avro round-trip query joins the registry (absent jar -> no registered
    query -> no driver row, rather than a guaranteed-red error row)."""
    import glob

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    return bool(glob.glob(os.path.join(jars, "spark-avro*.jar")))


def source_avro_roundtrip(spark, sf_dir):
    """region -> Avro -> read back -> aggregate; completes Tier C row 1's
    format surface.  Registered only when the spark-avro module is on the
    classpath (see _avro_jar_on_classpath); calling it without the module
    raises the actionable gating error from roundtrip_avro."""
    t = tables(spark, sf_dir)
    reg = roundtrip_avro(
        t["region"].select("r_regionkey", "r_name"),
        _sink_dir(sf_dir, "region_avro"),
    )
    return (
        reg.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_regions"),
            F.min("r_name").alias("first_region"),
            F.max("r_name").alias("last_region"),
        )
    )


_AVRO_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_regions,
min(r_name) AS first_region,
max(r_name) AS last_region
FROM region
"""

if _avro_jar_on_classpath():
    query("source_avro_roundtrip", oracle=_AVRO_ORACLE)(source_avro_roundtrip)


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT c_mktsegment,
    CAST(count(*) AS BIGINT) AS n_customers,
    round(sum(c_acctbal), 2) AS total_balance
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def source_json_roundtrip(spark, sf_dir):
    """customer -> JSON lines -> read back -> aggregate (doubles survive
    because Spark writes shortest-roundtrip decimal representations)."""
    t = tables(spark, sf_dir)
    cust = roundtrip_json(
        t["customer"].select("c_custkey", "c_mktsegment", "c_acctbal"),
        _sink_dir(sf_dir, "customer_json"),
    )
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT s_nationkey,
    CAST(count(*) AS BIGINT) AS n_suppliers,
    round(avg(s_acctbal), 2) AS avg_balance
    FROM supplier
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """supplier -> ORC -> read back -> aggregate (second columnar format)."""
    t = tables(spark, sf_dir)
    supp = roundtrip_orc(
        t["supplier"].select("s_suppkey", "s_nationkey", "s_acctbal"),
        _sink_dir(sf_dir, "supplier_orc"),
    )
    return (
        supp.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 2).alias("avg_balance"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT o_orderpriority,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def sink_partitioned_parquet(spark, sf_dir):
    """orders -> parquet partitioned by o_orderstatus -> read ONE partition.

    This is the scan shape the engine wants at 100 TB: the status filter is
    satisfied by directory pruning (zero I/O for other partitions), the
    pattern Dynamic Partition Pruning extends to join-derived filters.
    """
    t = tables(spark, sf_dir)
    path = _sink_dir(sf_dir, "orders_by_status")
    src = os.path.join(sf_dir, "orders.parquet")
    if _cached_layout_stale(path, src):
        (
            t["orders"]
            .write.mode("overwrite")
            .partitionBy("o_orderstatus")
            .parquet(path)
        )
        _write_layout_marker(path, src)
    orders = spark.read.parquet(path)
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "source_binaryfile_ingest",
    oracle="""
    SELECT doc_id,
    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
    md5(text) AS content_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def source_binaryfile_ingest(spark, sf_dir):
    """Spark's ``binaryFile`` source — the standard ingestion entry for
    multimodal payloads (images/audio/video land as raw files in object
    storage; the first pipeline stage lists and reads them as
    (path, length, content) rows, exactly this).  One .bin file per
    document is materialized as the fixture corpus (fingerprint-cached
    like the other derived layouts), read back through binaryFile, and
    identified by filename; the oracle recomputes length + md5 from the
    canonical text, so parity proves the bytes survived the file
    round-trip exactly.

    Scale shape: binaryFile is a listing source — on a cluster the list +
    read parallelizes over files like any FileScan, and the md5/length
    are per-row column expressions; the only shuffle is the final sort.
    (DuckDB's md5 takes VARCHAR and hashes its UTF-8 encoding, which is
    byte-identical to the file content written here, ASCII or not.)"""
    src = os.path.join(sf_dir, "documents.parquet")
    d = _sink_dir(sf_dir, "documents_binfiles")
    if _cached_layout_stale(d, src):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        # Fixture materialization (driver-side by necessity: Spark has no
        # one-file-per-row binary WRITER; real corpora arrive as files).
        import pyarrow.parquet as pq

        tbl = pq.read_table(src, columns=["doc_id", "text"])
        for doc_id, text in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        ):
            with open(os.path.join(d, f"{doc_id}.bin"), "wb") as fh:
                fh.write(text.encode("utf-8"))
        open(os.path.join(d, "_SUCCESS"), "w").close()
        _write_layout_marker(d, src)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return files.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    ).orderBy("doc_id")


@query(
    "source_bucketed_join",
    oracle="""
    SELECT c_nationkey,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def source_bucketed_join(spark, sf_dir):
    """Bucketed tables + shuffle-free co-located join — THE repeated-join
    strategy at 100 TB: both sides written bucketBy(custkey) + sortBy, so
    the sort-merge join consumes bucket files directly with NO exchange and
    NO sort on either side (asserted in tests/test_plan_quality.py).  The
    only shuffle in the whole query is the final small agg on nationkey."""
    t = tables(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    names = {}
    for name, key in (("customer", "c_custkey"), ("orders", "o_custkey")):
        tbl = f"ddf_bucketed_{name}_{tag}"
        names[name] = tbl
        if not spark.catalog.tableExists(tbl):
            # A fresh session may find the managed location left over from a
            # previous process (catalog metadata is per-session here); clear
            # it so saveAsTable can claim the path.  Strip the URI scheme
            # with a real parser — naive str.replace('file:') mangles any
            # path CONTAINING 'file:' and mishandles file://host prefixes.
            # The table name is tagged per scale factor, and only a path
            # that is stale BY CONSTRUCTION (present on disk, absent from
            # this session's catalog) is ever removed.
            import shutil
            from urllib.parse import urlparse

            raw = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            parsed = urlparse(raw)
            warehouse = parsed.path if parsed.scheme else raw
            shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
            (
                t[name]
                .write.bucketBy(8, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(tbl)
            )
    # MERGE hint: at 100 TB neither side broadcasts — the point is the
    # bucket-aware sort-merge join reading bucket files with no exchange
    # and no sort (at tiny SF Spark would otherwise pick broadcast).
    cust = spark.table(names["customer"]).hint("merge")
    orders = spark.table(names["orders"])
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "prepared_dpp_partition_pruning",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderkey IN (11, 22, 33)
    ORDER BY o_orderkey
    """,
)
def prepared_dpp_partition_pruning(spark, sf_dir):
    """Fixed-plan point lookups whose SCAN still prunes — the Spark-native
    twin of the reference updating one physical plan's filter state in place
    (src/physical.rs:247-255), closing the r3 'what's missing #1' gap for
    partitioned layouts.

    Mechanism: orders is laid out hash-partitioned on pk_bucket =
    pmod(o_orderkey, 64) (the write happens once per sf_dir; at 100 TB this
    is the table's standing layout).  Parameter keys are bound as DATA — a
    tiny parquet relation carrying (k, kb=pmod(k,64)) — and semi-joined on
    (pk_bucket = kb AND o_orderkey = k).  Catalyst's Dynamic Partition
    Pruning inserts dynamicpruningexpression(pk_bucket IN <subquery>) into
    the scan's PartitionFilters (asserted in tests/test_plan_quality.py),
    so only the buckets named by the CURRENT parameter batch are read, while
    the plan and its generated code stay byte-identical across batches.

    Two DPP preconditions discovered by measurement: the filtering side
    must be a SCAN carrying a LIKELY-SELECTIVE predicate — a bare
    LocalRelation of literals never triggers the PartitionPruning rule
    (hence keys go through parquet, written driver-side by pyarrow: a
    Spark write JOB for the same 10 rows costs ~3 s of committer overhead
    in this environment), and an IsNotNull-only filter does not qualify
    either (it always exists from join constraints), so the params read
    carries a real comparison.  The join may be left_semi with the
    partitioned side streaming.  Catalyst's DPP cost model also declines
    the subquery when the partitioned table is only a few hundred KB
    (sf0.001) — correct at that size; the plan gate runs at sf0.01.

    Since r5 this mechanism is the DEFAULT execute_batch path for
    statements prepared against a registered point layout
    (Engine.ensure_point_layout -> CompiledTemplate._arrow_params); this
    query drives it through the public API."""
    from ..engine import Engine

    tables(spark, sf_dir)
    eng = Engine(spark)
    eng.ensure_point_layout(
        "orders", "o_orderkey",
        source_path=os.path.join(sf_dir, "orders.parquet"),
    )
    stmt = eng.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    return stmt.execute_batch([[11], [22], [33]]).orderBy("o_orderkey")


@query(
    "prepared_layout_point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey IN (7, 42, 4242)
    ORDER BY o_orderkey
    """,
)
def prepared_layout_point_lookup(spark, sf_dir):
    """Single-key executions over a registered point layout: each literal-
    bound key carries its derived bucket predicate, so Catalyst prunes the
    partitioned copy STATICALLY — the scan reads 1 of 64 bucket dirs per
    key (plan-gated in tests/test_layouts.py).  This is the cold
    sequential-lookup regime's scan-pruning answer; the fixed-plan DPP
    variant above is the batch regime's."""
    from ..engine import Engine

    tables(spark, sf_dir)
    eng = Engine(spark)
    eng.ensure_point_layout(
        "orders", "o_orderkey",
        source_path=os.path.join(sf_dir, "orders.parquet"),
    )
    stmt = eng.prepare(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_orderkey = $1"
    )
    out = None
    for k in (7, 42, 4242):
        df = stmt.execute({"$1": k})
        out = df if out is None else out.unionAll(df)
    return out.orderBy("o_orderkey")


def roundtrip_text(df: DataFrame, path: str) -> DataFrame:
    """Raw line-oriented text sink + source (``spark.read.text``) — the
    format LLM ingestion starts from (one document per line; newlines
    normalized to spaces on write so the line <-> document bijection
    survives any corpus)."""
    df.coalesce(1).write.mode("overwrite").text(path)
    return df.sparkSession.read.text(path)


@query(
    "source_text_roundtrip",
    oracle=r"""
    WITH n AS (
    SELECT regexp_replace(text, '[\r\n]+', ' ', 'g') AS v
    FROM documents WHERE n_chars > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
    CAST(sum(length(v)) AS BIGINT) AS total_chars,
    CAST(min(length(v)) AS BIGINT) AS min_len,
    CAST(max(length(v)) AS BIGINT) AS max_len
    FROM n
    """,
)
def source_text_roundtrip(spark, sf_dir):
    """documents.text -> raw line-oriented .txt -> spark.read.text -> line
    stats; the line count and every character must survive the round-trip
    (oracle derives the same stats from the parquet source directly, so a
    dropped/merged/mangled line breaks parity).  Completes the format
    surface (CSV/JSON/ORC/binaryFile/parquet/text) with the one format raw
    web/text corpora actually arrive in.

    Shape at 100 TB: line-oriented text splits by newline at HDFS block
    boundaries — ``spark.read.text`` scans are embarrassingly parallel and
    the stats are one map-side-combinable aggregate.  (The coalesce(1) on
    the write is sf-dir-local test hygiene — one deterministic file per
    derived layout — not part of the scale path.)"""
    t = tables(spark, sf_dir)
    lines = roundtrip_text(
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(F.regexp_replace("text", r"[\r\n]+", " ").alias("value")),
        _sink_dir(sf_dir, "documents_txt"),
    )
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("long").alias("total_chars"),
        F.min(F.length("value")).cast("long").alias("min_len"),
        F.max(F.length("value")).cast("long").alias("max_len"),
    )


def _zorder_key(a, b, bits: int = 18):
    """Bit-interleaved (Morton) key of two non-negative integral columns:
    z = sum_i (a_i << 2i) | (b_i << 2i+1).  36-bit result — exact in a
    long; pure codegen'd bit arithmetic (no UDF)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


@query(
    "layout_zorder_pruning",
    oracle="""
    SELECT o_orderstatus,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_custkey BETWEEN 100 AND 200
    AND o_orderdate >= '1993-01-01' AND o_orderdate <= '1995-12-31'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def layout_zorder_pruning(spark, sf_dir):
    """Multi-dimensional box query over a Z-ORDERED standing copy of
    orders: rows are clustered by the Morton interleave of
    (o_custkey, days(o_orderdate)), so parquet row-group min/max stats are
    tight on BOTH dimensions at once and a 2-D box prunes most of the
    table at the scan — the layout technique (Delta/Iceberg OPTIMIZE
    ZORDER) for tables queried on two selective columns where a single
    sort key can only serve one.  Results are byte-identical to the same
    box on the base table (the oracle); the copy is write-once with
    fingerprint invalidation, exactly like the point layout.

    Shape at 100 TB: the one-time layout write is a range-partition +
    within-partition sort on the z key (one shuffle of the table, the
    standing cost every clustered table pays); every subsequent box query
    reads only the row groups whose (custkey, date) envelopes intersect
    the box — I/O proportional to the box, not the table.  At test SFs
    each written file is one row group, so pruning granularity = the 64
    range partitions; at 100 TB it is the 128 MB row group.
    tests/test_plan_quality.py gates rows_read << full-table scan."""
    t = tables(spark, sf_dir)
    path = _sink_dir(sf_dir, "orders_zorder")
    source_path = os.path.join(sf_dir, "orders.parquet")
    if _cached_layout_stale(path, source_path):
        days = F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("long")
        z = _zorder_key(F.col("o_custkey").cast("long"), days)
        (
            t["orders"]
            .withColumn("_z", z)
            .repartitionByRange(64, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
            .write.mode("overwrite")
            .parquet(path)
        )
        _write_layout_marker(path, source_path)
    zt = spark.read.parquet(path)
    return (
        zt.filter(
            (F.col("o_custkey").between(100, 200))
            & (F.col("o_orderdate") >= "1993-01-01")
            & (F.col("o_orderdate") <= "1995-12-31")
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "source_parquet_merge_schema",
    oracle="""
    WITH legacy AS (
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    ), current AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    ), u AS (
    SELECT * FROM legacy UNION ALL SELECT * FROM current
    )
    SELECT coalesce(o_orderpriority, '<legacy>') AS priority,
    CAST(count(*) AS BIGINT) AS n_orders,
    round(sum(o_totalprice), 2) AS total_price
    FROM u GROUP BY 1 ORDER BY 1
    """,
)
def source_parquet_merge_schema(spark, sf_dir):
    """Schema-evolution read: a dataset written over time where old files
    lack a later-added column.  Half the orders (even keys) are written
    with the ORIGINAL two-column schema, half (odd keys) with the EVOLVED
    schema carrying o_orderpriority; one read with mergeSchema=true
    reconciles the footers by name and surfaces the missing column as
    NULL in legacy files — the standard Spark answer to append-only data
    lakes gaining columns (DataFusion inherits the same union-by-name
    behavior from its listing-table provider).

    Scale shape: schema merge is a FOOTER-only planning step (per-file
    metadata, no data read); the scan itself stays a plain columnar
    parquet scan with pushdown intact, so evolution costs nothing per row
    at 100 TB.  The aggregate proves values and NULL-fill survive the
    merge, not just that the read plans."""
    t = tables(spark, sf_dir)
    path = _sink_dir(sf_dir, "orders_evolving")
    src = os.path.join(sf_dir, "orders.parquet")
    if _cached_layout_stale(path, src):
        base = t["orders"]
        (
            base.filter(F.col("o_orderkey") % 2 == 0)
            .select("o_orderkey", "o_totalprice")
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "epoch=legacy"))
        )
        (
            base.filter(F.col("o_orderkey") % 2 == 1)
            .select("o_orderkey", "o_totalprice", "o_orderpriority")
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "epoch=current"))
        )
        _write_layout_marker(path, src)
    evolved = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)
        .parquet(
            os.path.join(path, "epoch=legacy"),
            os.path.join(path, "epoch=current"),
        )
    )
    return (
        evolved.select(
            F.coalesce("o_orderpriority", F.lit("<legacy>")).alias("priority"),
            "o_totalprice",
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("priority")
    )


@query(
    "source_json_malformed_permissive",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE n_nationkey % 5 <> 4) AS BIGINT) AS n_clean,
    CAST(count(*) FILTER (WHERE n_nationkey % 5 = 4) AS BIGINT) AS n_corrupt,
    CAST(sum(n_regionkey) FILTER (WHERE n_nationkey % 5 <> 4) AS BIGINT)
    AS sum_region_clean
    FROM nation
    """,
)
def source_json_malformed_permissive(spark, sf_dir):
    """Malformed-input resilience of the JSON source: a JSONL file where a
    deterministic subset of lines (nationkey % 5 == 4) is corrupted is
    read back in PERMISSIVE mode with a _corrupt_record column — bad rows
    are quarantined, not fatal, and clean rows parse fully.  The oracle
    computes the expected clean/corrupt split from the canonical table
    (the corruption rule is content-keyed, so the outcome is exact).

    This is the ingest posture a 100 TB crawl pipeline needs: per-record
    error isolation at the source (PERMISSIVE + corrupt-record routing to
    a quarantine sink) rather than job-level failure (FAILFAST) or silent
    loss (DROPMALFORMED)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    t = tables(spark, sf_dir)
    nat = t["nation"].select("n_nationkey", "n_name", "n_regionkey")
    lines = nat.select(
        F.when(
            F.col("n_nationkey") % 5 == 4,
            F.concat(F.lit('{"n_nationkey": '), F.col("n_name")),  # truncated JSON
        )
        .otherwise(F.to_json(F.struct("n_nationkey", "n_name", "n_regionkey")))
        .alias("value")
    )
    path = _sink_dir(sf_dir, "nation_json_malformed")
    lines.coalesce(1).write.mode("overwrite").text(path)
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    clean = F.col("_corrupt_record").isNull()
    return parsed.agg(
        F.sum(F.when(clean, 1).otherwise(0)).alias("n_clean"),
        F.sum(F.when(~clean, 1).otherwise(0)).alias("n_corrupt"),
        F.sum(F.when(clean, F.col("n_regionkey"))).alias("sum_region_clean"),
    )
