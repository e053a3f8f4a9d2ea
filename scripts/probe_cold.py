"""Probe the COLD prepared path's per-key cost structure (r3 VERDICT #2).

BENCH_r03: prepared_cold_50keys = plan 16ms/key + exec 61ms/key vs fstring
109ms/key -> 1.41x (target >= 2x).  A first sequential probe was confounded
by JVM warmup drift (later sections always looked faster), so variants here
run INTERLEAVED round-robin on fresh disjoint keys — warmup affects all
variants equally.

Variants:
  current   stmt.execute (nojit interpreted-wholestage policy)
  aqe_off   same, planned with spark.sql.adaptive.enabled=false
  jit       stmt.execute with jit=True (per-key wholestage compile)
  fstring   unprepared baseline
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
N = int(os.environ.get("PROBE_KEYS", "60"))

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
SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"

stmt0 = eng.prepare(SQL)
stmt_jit = eng.prepare(SQL, jit=True)


def v_current(k):
    return stmt0.execute({"$1": k})


def v_aqe_off(k):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return stmt0.execute({"$1": k})
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def v_jit(k):
    return stmt_jit.execute({"$1": k})


def v_fstring(k):
    return spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
    )


VARIANTS = [
    ("current", v_current),
    ("aqe_off", v_aqe_off),
    ("jit", v_jit),
    ("fstring", v_fstring),
]

pool = rng.sample(range(0, int(max_key) + 1), (N + 10) * len(VARIANTS))
it = iter(pool)

# warmup: 10 keys per variant, interleaved
for _ in range(10):
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


for name, _ in VARIANTS:
    b, c = acc[name]["build"], acc[name]["coll"]
    tot = sum(b) + sum(c)
    print(
        f"{name:10s} total={tot:6.2f}s  build_ms={med(b):7.1f}  "
        f"collect_ms={med(c):7.1f}  per_key_ms={round(1000 * tot / N, 1)}"
    )
