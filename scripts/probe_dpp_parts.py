"""r5 probe D: decompose the 3.5s-per-batch DPP cost.

Pieces, each timed separately (median of 5):
  write      10-row params parquet write
  read       params read + filter collect
  dpp_join   semi-join WITH DPP (parquet params)
  local_join semi-join with LocalRelation params (no DPP, full scan)
  inlist     literal IN-list with static partition pruning (no join at all)
"""

import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark import Engine, registry
from datafusion_dynamic_filter_spark.sources import _sink_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

eng = Engine(
    app_name="probe-dpp-parts",
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
orders_part = spark.read.parquet(part_path)
orders_part.count()
keys_path = _sink_dir(SF_DIR, "probe_dpp_keys2")

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(23)
SEL = ("o_orderkey", "o_custkey", "o_totalprice")


def timeit(fn, n=5):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return round(statistics.median(out) * 1000, 1), [round(x * 1000) for x in out]


def keys10():
    return rng.sample(range(0, int(max_key) + 1), 10)


def w():
    spark.createDataFrame(
        [(k, k % 64) for k in keys10()], "k bigint, kb int"
    ).coalesce(1).write.mode("overwrite").parquet(keys_path)


def r():
    spark.read.parquet(keys_path).filter(F.col("k") >= 0).collect()


def dpp_join():
    params = spark.read.parquet(keys_path).filter(F.col("k") >= 0)
    orders_part.join(
        F.broadcast(params),
        (F.col("pk_bucket") == F.col("kb")) & (F.col("o_orderkey") == F.col("k")),
        "left_semi",
    ).select(*SEL).collect()


def local_join():
    params = spark.createDataFrame(
        [(k, k % 64) for k in keys10()], "k bigint, kb int"
    )
    orders_part.join(
        F.broadcast(params),
        (F.col("pk_bucket") == F.col("kb")) & (F.col("o_orderkey") == F.col("k")),
        "left_semi",
    ).select(*SEL).collect()


def inlist():
    ks = keys10()
    orders_part.filter(
        F.col("pk_bucket").isin([k % 64 for k in ks])
        & F.col("o_orderkey").isin(ks)
    ).select(*SEL).collect()


w()  # seed the params path
for name, fn in [("write", w), ("read", r), ("dpp_join", dpp_join),
                 ("local_join", local_join), ("inlist", inlist)]:
    fn()  # warm
    ms, raw = timeit(fn)
    print(f"{name:10s} median_ms={ms:8.1f}  runs={raw}")
