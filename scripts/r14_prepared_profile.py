#!/usr/bin/env python
"""r14 item 1: decompose the prepared steady-state per-key floor.

prepared_50keys_repeat = ~30 ms/key is a dict cache hit + df.collect() on
the HOT template's pinned scan; prepared_50keys adds ~18 ms/key of per-key
template bind + physical planning; prepared_layout adds ~37 ms/key planning
+ ~55 ms/key exec.  This script measures where each slice goes:

  A. py4j + trivial-job floor        : spark.range(1).collect()
  B. hot collect, as shipped        : partitions of the pinned relation,
                                      per-collect wall time
  C. hot collect, 1-partition cache  : same lookup with the pinned scan
                                      coalesced to 1 partition
  D. AQE on/off for the template     : per-collect and per-plan time
  E. fresh-key plan cost             : build+executedPlan per new key
  F. layout exec breakdown           : per-key collect on the pruned scan

Run on a quiet host (loadavg settled); min-of-N per cell.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N = 30


def best(f, n=N, warm=3):
    for _ in range(warm):
        f()
    s = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        s.append(time.perf_counter() - t0)
    s.sort()
    return {
        "min_ms": round(s[0] * 1e3, 2),
        "med_ms": round(s[len(s) // 2] * 1e3, 2),
        "mean_ms": round(sum(s) / len(s) * 1e3, 2),
    }


def main():
    import random

    from datafusion_dynamic_filter_spark import Engine, registry

    eng = Engine(
        app_name="r14-prepared-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    registry.tables(spark, SF_DIR)
    print(f"loadavg {os.getloadavg()}")

    spark.table("orders").count()
    max_key = spark.table("orders").selectExpr("max(o_orderkey) k").first()["k"]
    rng = random.Random(42)
    keys = rng.sample(range(0, int(max_key) + 1), 400)
    sql = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"

    # A. trivial-job floor
    print("A. range(1).collect()       ", best(lambda: spark.range(1).collect()))
    one = spark.range(1)
    one.collect()
    print("A2. same-df re-collect      ", best(lambda: one.collect()))

    # B. hot template as shipped
    stmt = eng.prepare(sql, hot=True)
    cached = stmt._template.scan_df
    nparts = cached.rdd.getNumPartitions()
    print(f"B. hot pinned scan partitions = {nparts}")
    df = stmt.execute({"$1": keys[0]})
    df.collect()
    print("B1. hot same-key re-collect ", best(lambda: df.collect()))
    it = iter(keys[1:200])
    print(
        "B2. hot fresh-key execute+collect",
        best(lambda: stmt.execute({"$1": next(it)}).collect(), n=60, warm=5),
    )
    it2 = iter(keys[200:400])
    print(
        "B3. hot fresh-key execute only (plan)",
        best(lambda: stmt.execute({"$1": next(it2)}), n=60, warm=5),
    )
    stmt.close()

    # Job/task accounting for one hot re-collect
    st = spark.sparkContext.statusTracker()
    ids0 = set(st.getJobIdsForGroup() or [])
    stmt2 = eng.prepare(sql, hot=True)
    d0 = stmt2.execute({"$1": keys[0]})
    d0.collect()
    before = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    for _ in range(5):
        d0.collect()
    after = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    print(f"B4. jobs per hot re-collect = {(after - before) / 5}")
    stmt2.close()

    # C. 1-partition pinned scan (manual template twin)
    from pyspark.sql import SparkSession

    tpl_session = SparkSession(
        spark.sparkContext, spark._jsparkSession.cloneSession()
    )
    tpl_session.conf.set("spark.sql.codegen.wholeStage", "false")
    tpl_session.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
    base = tpl_session.table("orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    for np_ in (1, 4):
        pin = base.coalesce(np_).persist()
        pin.count()
        k = keys[5]
        d1 = pin.filter(pin.o_orderkey == k)
        d1.collect()
        print(f"C. hot re-collect, {np_}-part cache", best(lambda: d1.collect()))
        it3 = iter(keys[6:120])

        def fresh():
            kk = next(it3)
            d = pin.filter(pin.o_orderkey == kk)
            d._jdf.queryExecution().executedPlan()
            d.collect()

        print(f"C2. fresh-key filter+plan+collect, {np_}-part", best(fresh, n=40, warm=3))
        pin.unpersist()

    # D. AQE off in the template session
    tpl2 = SparkSession(
        spark.sparkContext, spark._jsparkSession.cloneSession()
    )
    tpl2.conf.set("spark.sql.codegen.wholeStage", "false")
    tpl2.conf.set("spark.sql.adaptive.enabled", "false")
    tpl2.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
    base2 = tpl2.table("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    pin2 = base2.coalesce(1).persist()
    pin2.count()
    d2 = pin2.filter(pin2.o_orderkey == keys[7])
    d2.collect()
    print("D. hot re-collect, AQE off, 1-part", best(lambda: d2.collect()))
    it4 = iter(keys[120:240])

    def fresh2():
        kk = next(it4)
        d = pin2.filter(pin2.o_orderkey == kk)
        d._jdf.queryExecution().executedPlan()
        d.collect()

    print("D2. fresh-key filter+plan+collect, AQE off", best(fresh2, n=40, warm=3))
    pin2.unpersist()

    # E. layout path
    eng.ensure_point_layout(
        "orders", "o_orderkey", source_path=os.path.join(SF_DIR, "orders.parquet")
    )
    stmt_lay = eng.prepare(sql)
    it5 = iter(keys[240:360])
    print(
        "E. layout fresh-key execute+collect",
        best(lambda: stmt_lay.execute({"$1": next(it5)}).collect(), n=40, warm=3),
    )
    dl = stmt_lay.execute({"$1": keys[360]})
    dl.collect()
    print("E2. layout same-key re-collect", best(lambda: dl.collect()))
    it6 = iter(keys[361:400])
    print(
        "E3. layout fresh-key execute only (plan)",
        best(lambda: stmt_lay.execute({"$1": next(it6)}), n=30, warm=3),
    )
    stmt_lay.close()
    print(f"loadavg end {os.getloadavg()}")


if __name__ == "__main__":
    main()
