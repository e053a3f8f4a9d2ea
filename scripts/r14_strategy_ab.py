#!/usr/bin/env python
"""r14 item 1c: per-strategy A/B of the expression-codegen policy for
nojit templates (factoryMode NO_CODEGEN + constraintPropagation off vs
default FALLBACK).

Measures every bench point strategy under each mode, interleaved round-
robin within one session so host drift hits the modes equally.  An
fstring control rides along (untouched by the knob) to expose window
drift."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
NK = 50

MODES = {
    "default": {},
    "nocodegen": {
        "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        "spark.sql.constraintPropagation.enabled": "false",
    },
}


def main():
    import random

    from datafusion_dynamic_filter_spark import Engine, registry

    eng = Engine(
        app_name="r14-strategy-ab",
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
    max_cust = spark.table("orders").selectExpr("max(o_custkey) k").first()["k"]
    rng = random.Random(11)
    print(f"loadavg {os.getloadavg()}")
    sql = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    gsql = (
        "SELECT o_custkey, count(*) AS n_orders, "
        "round(sum(o_totalprice), 2) AS total "
        "FROM orders WHERE o_custkey = $1 GROUP BY o_custkey"
    )
    eng.ensure_point_layout(
        "orders", "o_orderkey", source_path=os.path.join(SF_DIR, "orders.parquet")
    )

    def build(mode):
        st = {
            "cold": eng.prepare(sql, layout=False),
            "layout": eng.prepare(sql),
            "hot": eng.prepare(sql, hot=True),
            "batch": eng.prepare(sql),
            "grouped": eng.prepare(gsql),
        }
        for s in st.values():
            if s._template is not None:
                for k, v in MODES[mode].items():
                    s._template.spark.conf.set(k, v)
        return st

    sts = {m: build(m) for m in MODES}
    # disjoint fresh keys per (mode, strategy)
    need = len(MODES) * 5 * (NK + 10)
    pool = rng.sample(range(0, int(max_key) + 1), need)
    kit = iter(pool)
    keys = {
        (m, s): [next(kit) for _ in range(NK + 10)]
        for m in MODES
        for s in ("cold", "layout", "hot", "batch", "fstring")
    }
    cust_pool = rng.sample(range(0, int(max_cust) + 1), min(int(max_cust), 3100 * len(MODES) + 200))

    def run_one(m, s, k):
        if s == "fstring":
            spark.sql(
                f"SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = {k}"
            ).collect()
        else:
            sts[m][s].execute({"$1": k}).collect()

    # warm 10 keys each
    for i in range(10):
        for m in MODES:
            for s in ("cold", "layout", "hot", "fstring"):
                run_one(m, s, keys[(m, s)][i])
            sts[m]["batch"].execute_batch(
                [[k] for k in keys[(m, "batch")][:10]]
            ).collect()
    spark.sparkContext._jvm.System.gc()

    acc = {(m, s): 0.0 for m in MODES for s in ("cold", "layout", "hot", "fstring")}
    accb = {m: 0.0 for m in MODES}
    for i in range(NK):
        for m in MODES:
            for s in ("cold", "layout", "hot", "fstring"):
                t0 = time.perf_counter()
                run_one(m, s, keys[(m, s)][10 + i])
                acc[(m, s)] += time.perf_counter() - t0
        if (i + 1) % 10 == 0:
            for m in MODES:
                chunk = keys[(m, "batch")][i + 1 : i + 11]
                t0 = time.perf_counter()
                sts[m]["batch"].execute_batch([[k] for k in chunk]).collect()
                accb[m] += time.perf_counter() - t0
    for m in MODES:
        for s in ("cold", "layout", "hot", "fstring"):
            print(f"{m:10s} {s:8s} 50keys = {acc[(m, s)]:.3f} s")
        print(f"{m:10s} dpp_batch 50keys = {accb[m]:.3f} s")

    # repeat regime (same keys re-executed, plan-cache hits)
    for m in MODES:
        ks = keys[(m, "hot")][10:]
        t0 = time.perf_counter()
        for k in ks:
            sts[m]["hot"].execute({"$1": k}).collect()
        print(f"{m:10s} hot_repeat 50keys = {time.perf_counter() - t0:.3f} s")

    # IN-list 1000 + grouped batch 1000, 3 samples each
    import statistics

    ci = iter(cust_pool)
    for m in MODES:
        sts[m]["hot"].execute_batch(
            [[k] for k in rng.sample(range(0, int(max_key) + 1), 100)]
        ).collect()
        ss = []
        for _ in range(3):
            bk = rng.sample(range(0, int(max_key) + 1), 1000)
            t0 = time.perf_counter()
            sts[m]["hot"].execute_batch([[k] for k in bk]).collect()
            ss.append(time.perf_counter() - t0)
        print(f"{m:10s} inlist_1000 = {statistics.median(ss):.3f} s  {sorted(ss)}")
        gs = []
        sts[m]["grouped"].execute_batch(
            [[next(ci)] for _ in range(100)]
        ).collect()
        for _ in range(3):
            gk = [next(ci) for _ in range(min(1000, int(max_cust) // (3 * len(MODES)) - 50))]
            t0 = time.perf_counter()
            sts[m]["grouped"].execute_batch([[k] for k in gk]).collect()
            gs.append(time.perf_counter() - t0)
        print(f"{m:10s} grouped_1000 = {statistics.median(gs):.3f} s  {sorted(gs)}")
    print(f"loadavg end {os.getloadavg()}")


if __name__ == "__main__":
    main()
