"""r5 probe: can the COLD prepared path reach >=2x vs fstring?

Two candidate mechanisms measured against the r4 bench strategies, all
interleaved round-robin on disjoint fresh keys (memory: +-40% sequential
drift; interleaving is the only trustworthy layout):

  current     stmt.execute (r4 policy: eager plan, per-key conf toggle)
  clone       template planned on a CLONED SparkSession with
              wholeStage=false (+ optionally AQE off) set once — no per-key
              conf round-trips, no lock, same interpreted plan
  part_lit    literal binding over the pk_bucket-partitioned layout with
              the partition predicate augmented in (static partition
              pruning: the scan reads 1 of 64 bucket dirs)
  part_clone  part_lit planned on the cloned no-JIT session
  fstring     unprepared baseline on the flat table (plain user query)
  fstring_p   unprepared on the partitioned table WITHOUT the bucket
              predicate (what a layout-unaware user pays on the same data)
"""

import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from datafusion_dynamic_filter_spark import Engine, registry
from datafusion_dynamic_filter_spark.sources import (
    _cached_layout_stale,
    _sink_dir,
    _write_layout_marker,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("PROBE_KEYS", "40"))

eng = Engine(
    app_name="probe-cold-r5",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
)
spark = eng.spark
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()
t = registry.tables(spark, SF_DIR)
spark.table("orders").count()

# Partitioned layout (same one the DPP query maintains).
part_path = _sink_dir(SF_DIR, "orders_by_pk_bucket")
src = os.path.join(SF_DIR, "orders.parquet")
if _cached_layout_stale(part_path, src):
    (
        t["orders"]
        .withColumn("pk_bucket", F.pmod("o_orderkey", F.lit(64)).cast("int"))
        .write.mode("overwrite")
        .partitionBy("pk_bucket")
        .parquet(part_path)
    )
    _write_layout_marker(part_path, src)
orders_part = spark.read.parquet(part_path)
orders_part.count()

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(11)
SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"

stmt0 = eng.prepare(SQL)

# Cloned planning session: same shared state/temp views at clone time,
# independent SQLConf — wholestage off ONCE, no per-key toggles.
jclone = spark._jsparkSession.cloneSession()
clone = SparkSession(spark.sparkContext, jclone)
clone.conf.set("spark.sql.codegen.wholeStage", "false")
clone_flat = clone.table("orders")
clone_part = clone.read.parquet(part_path)


def v_current(k):
    return stmt0.execute({"$1": k})


def v_clone(k):
    return (
        clone_flat.filter(F.col("o_orderkey") == F.lit(k))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def v_part_lit(k):
    return (
        orders_part.filter(
            (F.col("pk_bucket") == F.lit(k % 64)) & (F.col("o_orderkey") == F.lit(k))
        ).select("o_orderkey", "o_custkey", "o_totalprice")
    )


def v_part_clone(k):
    return (
        clone_part.filter(
            (F.col("pk_bucket") == F.lit(k % 64)) & (F.col("o_orderkey") == F.lit(k))
        ).select("o_orderkey", "o_custkey", "o_totalprice")
    )


def v_fstring(k):
    return spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
    )


orders_part.createOrReplaceTempView("orders_part_probe")


def v_fstring_p(k):
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders_part_probe "
        f"WHERE o_orderkey = {k}"
    )


VARIANTS = [
    ("current", v_current),
    ("clone", v_clone),
    ("part_lit", v_part_lit),
    ("part_clone", v_part_clone),
    ("fstring", v_fstring),
    ("fstring_p", v_fstring_p),
]

pool = rng.sample(range(0, int(max_key) + 1), (N + 8) * len(VARIANTS))
it = iter(pool)
for _ in range(8):
    for _, fn in VARIANTS:
        fn(next(it)).collect()

acc = {name: {"build": [], "coll": []} for name, _ in VARIANTS}
for _ in range(N):
    for name, fn in VARIANTS:
        k = next(it)
        a = time.perf_counter()
        df = fn(k)
        b = time.perf_counter()
        df.collect()
        c = time.perf_counter()
        acc[name]["build"].append(b - a)
        acc[name]["coll"].append(c - b)


def med(xs):
    return round(statistics.median(xs) * 1000, 1)


fs_tot = sum(acc["fstring"]["build"]) + sum(acc["fstring"]["coll"])
for name, _ in VARIANTS:
    b, c = acc[name]["build"], acc[name]["coll"]
    tot = sum(b) + sum(c)
    print(
        f"{name:10s} total={tot:6.2f}s  build_ms={med(b):7.1f}  "
        f"collect_ms={med(c):7.1f}  per_key_ms={round(1000 * tot / N, 1):7.1f}"
        f"  vs_fstring={round(fs_tot / tot, 2)}x"
    )
