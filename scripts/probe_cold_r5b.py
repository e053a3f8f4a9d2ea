"""r5 probe B: per-job overhead is the cold floor (~40-60ms collect even on
a 40KB pruned scan).  Which knobs cut it?  All interleaved, disjoint keys.

  part_clone   r5a best: partitioned layout + cloned nojit session
  pc_noaqe     same + spark.sql.adaptive.enabled=false on the clone
  pc_noaqe_cg  partitioned + AQE off + wholestage ON (codegen clone)
  bucketdir    per-key read of the single bucket DIRECTORY (fresh relation
               per key: listing + footer per key, 1-task job, AQE off)
  fstring      unprepared baseline on the flat table
"""

import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from datafusion_dynamic_filter_spark import Engine, registry
from datafusion_dynamic_filter_spark.sources import _sink_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = int(os.environ.get("PROBE_KEYS", "40"))

eng = Engine(
    app_name="probe-cold-r5b",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
)
spark = eng.spark
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()
registry.tables(spark, SF_DIR)
spark.table("orders").count()

part_path = _sink_dir(SF_DIR, "orders_by_pk_bucket")
max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(13)

def mk_clone(**conf):
    c = SparkSession(spark.sparkContext, spark._jsparkSession.cloneSession())
    for k, v in conf.items():
        c.conf.set(k, v)
    return c

cl_nojit = mk_clone(**{"spark.sql.codegen.wholeStage": "false"})
cl_noaqe = mk_clone(**{
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.adaptive.enabled": "false",
})
cl_noaqe_cg = mk_clone(**{"spark.sql.adaptive.enabled": "false"})

p_nojit = cl_nojit.read.parquet(part_path)
p_noaqe = cl_noaqe.read.parquet(part_path)
p_noaqe_cg = cl_noaqe_cg.read.parquet(part_path)
for d in (p_nojit, p_noaqe, p_noaqe_cg):
    d.count()

SEL = ("o_orderkey", "o_custkey", "o_totalprice")


def point(df, k):
    return df.filter(
        (F.col("pk_bucket") == F.lit(k % 64)) & (F.col("o_orderkey") == F.lit(k))
    ).select(*SEL)


def v_part_clone(k):
    return point(p_nojit, k)


def v_pc_noaqe(k):
    return point(p_noaqe, k)


def v_pc_noaqe_cg(k):
    return point(p_noaqe_cg, k)


def v_bucketdir(k):
    return (
        cl_noaqe.read.parquet(os.path.join(part_path, f"pk_bucket={k % 64}"))
        .filter(F.col("o_orderkey") == F.lit(k))
        .select(*SEL)
    )


def v_fstring(k):
    return spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
    )


VARIANTS = [
    ("part_clone", v_part_clone),
    ("pc_noaqe", v_pc_noaqe),
    ("pc_noaqe_cg", v_pc_noaqe_cg),
    ("bucketdir", v_bucketdir),
    ("fstring", v_fstring),
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
        f"{name:12s} total={tot:6.2f}s  build_ms={med(b):7.1f}  "
        f"collect_ms={med(c):7.1f}  per_key_ms={round(1000 * tot / N, 1):7.1f}"
        f"  vs_fstring={round(fs_tot / tot, 2)}x"
    )
