"""Probe the COLD prepared path's per-key cost structure (r3 VERDICT #2).

BENCH_r03: prepared_cold_50keys = plan 16ms/key + exec 61ms/key vs fstring
109ms/key -> 1.41x (target >= 2x).  Hypotheses measured here:

- plan 16ms/key: WHERE text re-parse + full Catalyst pass per key.
- exec 61ms/key: wholestage is OFF for point lookups (jit policy), but
  FilterExec still calls GeneratePredicate per plan; the bound literal is
  embedded in the generated source, so the 100-entry codegen cache MISSES
  on every new key -> a fresh Janino compile inside every collect.
- A scalar-subquery / params-as-data bind keeps the generated source
  byte-identical across keys (literal becomes a runtime reference), turning
  every per-key compile into a cache hit.

Variants, 50 fresh keys each (disjoint key sets so nothing is plan-cached):
  v0_current        stmt.execute (nojit interpreted-wholestage policy)
  v1_jit            stmt.execute with jit=True (per-key wholestage compile)
  v2_interp         factoryMode=NO_CODEGEN (no compiles, interpreted rows)
  v3_subquery       filter `col = (SELECT k FROM pview)`, 1-row view swapped
  v4_aqe_off        v0 with spark.sql.adaptive.enabled=false
  v5_fstring        unprepared baseline on the same fresh keys
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
    app_name="probe-cold",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
)
spark = eng.spark
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()
registry.tables(spark, SF_DIR)
spark.table("orders").count()

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(7)
pool = rng.sample(range(0, int(max_key) + 1), 400)
SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"


def med(xs):
    return round(statistics.median(xs) * 1000, 1)


def run(name, fn, keys, warm):
    for k in warm:
        fn(k)
    build, coll = [], []
    t0 = time.perf_counter()
    for k in keys:
        a = time.perf_counter()
        df = fn(k)
        b = time.perf_counter()
        df.collect()
        c = time.perf_counter()
        build.append(b - a)
        coll.append(c - b)
    total = time.perf_counter() - t0
    print(
        f"{name:14s} total={total:6.2f}s  build_ms={med(build):7.1f}  "
        f"collect_ms={med(coll):7.1f}"
    )


chunks = [pool[i : i + 60] for i in range(0, 360, 60)]

# v0 current policy
stmt0 = eng.prepare(SQL)
run("v0_current", lambda k: stmt0.execute({"$1": k}), chunks[0][10:], chunks[0][:10])

# v1 jit=True
stmt1 = eng.prepare(SQL, jit=True)
run("v1_jit", lambda k: stmt1.execute({"$1": k}), chunks[1][10:], chunks[1][:10])

# v2 fully interpreted
spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
stmt2 = eng.prepare(SQL)
run("v2_interp", lambda k: stmt2.execute({"$1": k}), chunks[2][10:], chunks[2][:10])
spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")

# v3 scalar subquery bind (plan source identical per key; wholestage ON)
scan = spark.table("orders")


def subq(k):
    pdf = spark.createDataFrame([(k,)], "k long")
    pdf.createOrReplaceTempView("probe_param")
    return scan.filter(
        "o_orderkey = (SELECT first(k) FROM probe_param)"
    ).selectExpr("o_orderkey", "o_custkey", "o_totalprice")


run("v3_subquery", subq, chunks[3][10:], chunks[3][:10])

# v4 AQE off x current policy
spark.conf.set("spark.sql.adaptive.enabled", "false")
stmt4 = eng.prepare(SQL)
run("v4_aqe_off", lambda k: stmt4.execute({"$1": k}), chunks[4][10:], chunks[4][:10])
spark.conf.set("spark.sql.adaptive.enabled", "true")

# v5 fstring baseline on fresh keys
run(
    "v5_fstring",
    lambda k: spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
    ),
    chunks[5][10:],
    chunks[5][:10],
)
