"""Measurement probe for the prepared-vs-unprepared gap (round-2 headline).

Breaks one point-lookup into phases per strategy and reports medians, so the
fix targets the real cost, not a guess. Not part of the driver surface.
"""

import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dynamic_filter_spark import Engine, registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

eng = Engine(
    app_name="perf-probe",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
)
spark = eng.spark
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()
registry.tables(spark, SF_DIR)

spark.table("orders").count()  # warm FS cache / JIT

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(42)
keys = rng.sample(range(0, int(max_key) + 1), 120)
warm, cold_a, cold_b = keys[:20], keys[20:70], keys[70:120]

canon = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = :p1"
stmt = eng.prepare(
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"
)

print("scan partitions:", spark.table("orders").rdd.getNumPartitions())
import glob

print("orders files:", len(glob.glob(os.path.join(SF_DIR, "orders.parquet", "*.parquet")))
      or os.path.isfile(os.path.join(SF_DIR, "orders.parquet")))


def med(xs):
    return round(statistics.median(xs) * 1000, 1)


def phase_fstring(k):
    t0 = time.perf_counter()
    df = spark.sql(f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}")
    t1 = time.perf_counter()
    df.collect()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


def phase_sqlargs(k):
    t0 = time.perf_counter()
    df = spark.sql(canon, args={"p1": k})
    t1 = time.perf_counter()
    df.collect()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


def phase_prepared(k):
    t0 = time.perf_counter()
    df = stmt.execute({"$1": k})
    t1 = time.perf_counter()
    df.collect()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t1


for k in warm:
    phase_fstring(k)
    phase_sqlargs(k)
    phase_prepared(k)

# cold keys per strategy (disjoint sets per strategy would be ideal; use the
# same cold set but measure the FIRST strategy to touch it separately)
results = {}
for name, fn, ks in (
    ("fstring_coldkeys", phase_fstring, cold_a),
    ("sqlargs_samekeys", phase_sqlargs, cold_a),   # compile-warm if source matches
    ("prepared_samekeys", phase_prepared, cold_a), # compile-warm if source matches
    ("prepared_coldkeys", phase_prepared, cold_b), # compile-cold for prepared
    ("fstring_samekeys2", phase_fstring, cold_b),  # after prepared warmed them
):
    build, coll = [], []
    for k in ks:
        b, c = fn(k)
        build.append(b)
        coll.append(c)
    results[name] = (med(build), med(coll))
    print(f"{name:22s} build_ms={med(build):7.1f} collect_ms={med(coll):7.1f}")

# steady state: same DataFrame object re-collected
df0 = stmt.execute({"$1": cold_a[0]})
df0.collect()
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    df0.collect()
    ts.append(time.perf_counter() - t0)
print("recollect_same_df_ms:", med(ts))

# pure job floor: trivial plan
rng1 = spark.range(1)
rng1.collect()
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    rng1.collect()
    ts.append(time.perf_counter() - t0)
print("range1_collect_ms:", med(ts))

# cached table variant
spark.catalog.cacheTable("orders")
spark.table("orders").count()  # materialize
for k in warm:
    phase_fstring(k)
    phase_prepared(k)
for name, fn, ks in (
    ("fstring_cached", phase_fstring, cold_a),
    ("prepared_cached", phase_prepared, cold_b),
):
    build, coll = [], []
    for k in ks:
        b, c = fn(k)
        build.append(b)
        coll.append(c)
    print(f"{name:22s} build_ms={med(build):7.1f} collect_ms={med(coll):7.1f}")

df1 = stmt.execute({"$1": cold_b[0]})
df1.collect()
ts = []
for _ in range(20):
    t0 = time.perf_counter()
    df1.collect()
    ts.append(time.perf_counter() - t0)
print("recollect_cached_ms:", med(ts))
spark.catalog.uncacheTable("orders")
