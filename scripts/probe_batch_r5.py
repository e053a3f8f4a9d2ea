"""r5 probe C: the DPP batch path as the cold 50-key strategy.

50 fresh keys served as execute_batch() micro-batches over the registered
point layout (fixed plan + DPP runtime pruning) vs per-key fstring and
per-key prepared-with-layout.  Interleaved at batch granularity.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dynamic_filter_spark import Engine, registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = 50
BATCH = int(os.environ.get("PROBE_BATCH", "10"))

eng = Engine(
    app_name="probe-batch-r5",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS),
    extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
)
spark = eng.spark
spark.sparkContext.setLogLevel("ERROR")
registry.load_all()
registry.tables(spark, SF_DIR)
spark.table("orders").count()
eng.ensure_point_layout(
    "orders", "o_orderkey", source_path=os.path.join(SF_DIR, "orders.parquet")
)

max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
rng = random.Random(17)
SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"

stmt_seq = eng.prepare(SQL)   # layout-adopting, literal bind per key
stmt_bat = eng.prepare(SQL)   # same, batches go through DPP arrow params


def run_fstring(k):
    spark.sql(
        f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
    ).collect()


pool = rng.sample(range(0, int(max_key) + 1), 3 * (N + 2 * BATCH))
ks = {
    "fstring": pool[: N + 2 * BATCH],
    "seq": pool[N + 2 * BATCH : 2 * (N + 2 * BATCH)],
    "bat": pool[2 * (N + 2 * BATCH) :],
}

# warm each strategy
for k in ks["fstring"][:BATCH]:
    run_fstring(k)
for k in ks["seq"][:BATCH]:
    stmt_seq.execute({"$1": k}).collect()
stmt_bat.execute_batch([[k] for k in ks["bat"][:BATCH]]).collect()
stmt_bat.execute_batch([[k] for k in ks["bat"][BATCH : 2 * BATCH]]).collect()
spark.sparkContext._jvm.System.gc()

t = {"fstring": 0.0, "seq": 0.0, "bat": 0.0}
off = 2 * BATCH
for i in range(0, N, BATCH):
    t0 = time.perf_counter()
    for k in ks["fstring"][off + i : off + i + BATCH]:
        run_fstring(k)
    t["fstring"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    for k in ks["seq"][off + i : off + i + BATCH]:
        stmt_seq.execute({"$1": k}).collect()
    t["seq"] += time.perf_counter() - t0
    t0 = time.perf_counter()
    stmt_bat.execute_batch(
        [[k] for k in ks["bat"][off + i : off + i + BATCH]]
    ).collect()
    t["bat"] += time.perf_counter() - t0

for name in t:
    print(
        f"{name:8s} total={t[name]:6.2f}s per_key_ms={1000 * t[name] / N:7.1f} "
        f"vs_fstring={t['fstring'] / t[name]:5.2f}x"
    )
