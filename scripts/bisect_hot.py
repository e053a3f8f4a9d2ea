"""Bisect the r3 hot-template bench collapse (VERDICT r3 'What's wrong #1').

Replicates bench.py's section sequence exactly, but each earlier section can
be toggled off via SECTIONS, and the hot 50-key loop at the end is always
measured with a per-key breakdown plus JVM GC / compilation deltas.  Run with
different SECTIONS masks to find which predecessor inflates the hot loop:

  SECTIONS=fstring,sqlargs,cold,probe python scripts/bisect_hot.py  # = bench
  SECTIONS=cold,probe               python scripts/bisect_hot.py
  SECTIONS=fstring,sqlargs          python scripts/bisect_hot.py
  SECTIONS=                         python scripts/bisect_hot.py  # = fresh
"""

import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dynamic_filter_spark import Engine, registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SECTIONS = {s for s in os.environ.get("SECTIONS", "fstring,sqlargs,cold,probe").split(",") if s}

eng = Engine(
    app_name="bisect-hot",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    },
)
spark = eng.spark
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()
registry.tables(spark, SF_DIR)

_jvm = spark.sparkContext._jvm
_mf = _jvm.java.lang.management.ManagementFactory


def jvm_stats():
    gc_ms = 0
    gc_n = 0
    it = _mf.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        b = it.next()
        gc_ms += b.getCollectionTime()
        gc_n += b.getCollectionCount()
    comp = _mf.getCompilationMXBean().getTotalCompilationTime()
    loaded = _mf.getClassLoadingMXBean().getTotalLoadedClassCount()
    heap = _mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() // (1 << 20)
    return {"gc_ms": gc_ms, "gc_n": gc_n, "jit_ms": comp, "classes": loaded, "heap_mb": heap}


spark.table("lineitem").count()
spark.table("orders").count()

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(42)
keys = rng.sample(range(0, int(max_key) + 1), 50)
sql = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"
warm_keys = rng.sample(range(0, int(max_key) + 1), 10)
canon = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = :p1"

marks = {"start": jvm_stats()}

if "fstring" in SECTIONS:
    for k in warm_keys + keys:
        spark.sql(
            f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
        ).collect()
    marks["after_fstring"] = jvm_stats()

if "sqlargs" in SECTIONS:
    for k in warm_keys + keys:
        spark.sql(canon, args={"p1": k}).collect()
    marks["after_sqlargs"] = jvm_stats()

stmt_cold = None
if "cold" in SECTIONS:
    stmt_cold = eng.prepare(sql)
    for k in warm_keys + keys:
        stmt_cold.execute({"$1": k}).collect()
    marks["after_cold"] = jvm_stats()

if "probe" in SECTIONS:
    if stmt_cold is None:
        stmt_cold = eng.prepare(sql)
    probe_key = rng.sample(range(0, int(max_key) + 1), 1)[0]
    stmt_cold.execute({"$1": probe_key}).collect()
    spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {probe_key}"
    ).collect()
    marks["after_probe"] = jvm_stats()

# --- the hot section, always measured ---
t_prep0 = time.perf_counter()
stmt = eng.prepare(sql, hot=True)
prep_s = time.perf_counter() - t_prep0

for k in warm_keys:
    stmt.execute({"$1": k}).collect()
marks["before_hot_loop"] = jvm_stats()

build_ms, coll_ms = [], []
t0 = time.perf_counter()
for k in keys:
    a = time.perf_counter()
    df = stmt.execute({"$1": k})
    b = time.perf_counter()
    df.collect()
    c = time.perf_counter()
    build_ms.append(round((b - a) * 1000, 1))
    coll_ms.append(round((c - b) * 1000, 1))
hot_total = time.perf_counter() - t0
marks["after_hot_loop"] = jvm_stats()

med = lambda xs: round(statistics.median(xs), 1)  # noqa: E731
out = {
    "sections": sorted(SECTIONS),
    "hot_total_s": round(hot_total, 3),
    "hot_prepare_s": round(prep_s, 3),
    "build_ms": {"median": med(build_ms), "first10": build_ms[:10], "last10": build_ms[-10:]},
    "coll_ms": {"median": med(coll_ms), "first10": coll_ms[:10], "last10": coll_ms[-10:]},
    "jvm": {
        name: {
            k: v - marks["start"][k] if k != "heap_mb" else v
            for k, v in st.items()
        }
        for name, st in marks.items()
        if name != "start"
    },
}
print(json.dumps(out, indent=1))
