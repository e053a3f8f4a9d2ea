"""r5 probe C: the fixed-plan DPP batch strategy vs sequential fstring.

50 fresh keys, processed as B batches of 50/B keys through ONE prepared
params-as-data plan over the pk_bucket-partitioned layout.  Per batch the
parameter rows are written to a small parquet (the params side must be a
parquet scan with a selective predicate for Catalyst's PartitionPruning
rule to fire — a LocalRelation never triggers it), then the semi-join
collects.  The orders scan's plan is byte-identical across batches; only
the params DATA changes — the Spark analog of the reference updating one
physical plan's filter state (src/physical.rs:247-255).

Compared against: sequential fstring on the flat table (the unprepared
user), and sequential fstring on the partitioned table (layout-aware user
without the engine).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark import Engine, registry
from datafusion_dynamic_filter_spark.sources import _sink_dir

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = 50

eng = Engine(
    app_name="probe-dpp-batch",
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
keys_path = os.path.join(_sink_dir(SF_DIR, "probe_dpp_keys"))

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(17)
SEL = ("o_orderkey", "o_custkey", "o_totalprice")


def dpp_batch(keys):
    spark.createDataFrame(
        [(k, k % 64) for k in keys], "k bigint, kb int"
    ).coalesce(1).write.mode("overwrite").parquet(keys_path)
    params = spark.read.parquet(keys_path).filter(F.col("k") >= 0)
    return orders_part.join(
        F.broadcast(params),
        (F.col("pk_bucket") == F.col("kb")) & (F.col("o_orderkey") == F.col("k")),
        "left_semi",
    ).select(*SEL)


def fstring(spark_df_name, k):
    return spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM {spark_df_name} "
        f"WHERE o_orderkey = {k}"
    )


orders_part.createOrReplaceTempView("orders_part_probe")

pool = rng.sample(range(0, int(max_key) + 1), 6 * N + 60)
it = iter(pool)

# warm each shape
for _ in range(3):
    dpp_batch([next(it) for _ in range(10)]).collect()
    fstring("orders", next(it)).collect()
    fstring("orders_part_probe", next(it)).collect()

results = {}
for nbatch in (1, 5, 10):
    ks = [next(it) for _ in range(N)]
    per = N // nbatch
    t0 = time.perf_counter()
    rows = 0
    for b in range(nbatch):
        rows += len(dpp_batch(ks[b * per : (b + 1) * per]).collect())
    results[f"dpp_{nbatch}x{per}"] = (time.perf_counter() - t0, rows)

ks = [next(it) for _ in range(N)]
t0 = time.perf_counter()
for k in ks:
    fstring("orders", k).collect()
results["fstring_flat_seq"] = (time.perf_counter() - t0, N)

ks = [next(it) for _ in range(N)]
t0 = time.perf_counter()
for k in ks:
    fstring("orders_part_probe", k).collect()
results["fstring_part_seq"] = (time.perf_counter() - t0, N)

fs = results["fstring_flat_seq"][0]
for name, (sec, rows) in results.items():
    print(f"{name:18s} {sec:6.2f}s  rows={rows:3d}  vs_fstring_flat={fs / sec:5.2f}x")

# plan stability: two batches, compare executed plan strings (normalized)
import re

d1 = dpp_batch([next(it) for _ in range(10)])
d1.collect()
p1 = d1._jdf.queryExecution().executedPlan().toString()
d2 = dpp_batch([next(it) for _ in range(10)])
d2.collect()
p2 = d2._jdf.queryExecution().executedPlan().toString()
norm = lambda s: re.sub(r"#\d+L?|plan_id=\d+|Statistics\([^)]*\)", "", s)
print("plan_identical_across_batches:", norm(p1) == norm(p2))
print("dpp_in_plan:", "dynamicpruning" in p1.lower())
