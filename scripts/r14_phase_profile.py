#!/usr/bin/env python
"""r14 item 1b: where do the per-fresh-key milliseconds go?

Phase split via QueryExecution.tracker (analysis / optimization /
planning) + A/B of expression-codegen mode (a new literal per key means a
new Janino compile per key even with wholestage off — NO_CODEGEN forces
the interpreted expression path) and constraint propagation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def stats(s):
    s = sorted(s)
    return f"min {s[0]*1e3:6.2f}  med {s[len(s)//2]*1e3:6.2f}  mean {sum(s)/len(s)*1e3:6.2f} ms"


def main():
    import random

    from datafusion_dynamic_filter_spark import Engine, registry

    eng = Engine(
        app_name="r14-phase-profile",
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
    keys = rng.sample(range(0, int(max_key) + 1), 2000)
    print(f"loadavg {os.getloadavg()}")
    sql = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    eng.ensure_point_layout(
        "orders", "o_orderkey", source_path=os.path.join(SF_DIR, "orders.parquet")
    )

    def phase_split(stmt, ks, label):
        # per-key: build df (no plan), then phases from the tracker, then
        # executedPlan force, then first collect, then re-collect
        rows = []
        from datafusion_dynamic_filter_spark.params import normalize_params
        for k in ks:
            t0 = time.perf_counter()
            df = stmt._template.build(normalize_params({"$1": k}, stmt.placeholders))
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.collect()
            t3 = time.perf_counter()
            df.collect()
            t4 = time.perf_counter()
            ph = {}
            tr = df._jdf.queryExecution().tracker().phases()
            pit = tr.iterator()
            while pit.hasNext():
                e = pit.next()
                ph[e._1()] = e._2().endTimeMs() - e._2().startTimeMs()
            rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, ph))
        n = len(rows)
        for i, nm in ((0, "build df"), (1, "force plan"), (2, "first collect"), (3, "re-collect")):
            print(f"  {label:28s} {nm:14s}", stats([r[i] for r in rows]))
        agg = {}
        for *_, ph in rows:
            for k2, v in ph.items():
                agg.setdefault(k2, []).append(v)
        print(f"  {label:28s} tracker phases:", {k2: round(sum(v) / n, 1) for k2, v in agg.items()})

    for conf_label, confs in [
        ("default(hot)", {}),
        ("NO_CODEGEN(hot)", {"spark.sql.codegen.factoryMode": "NO_CODEGEN"}),
        (
            "NO_CODEGEN+noconstraint(hot)",
            {
                "spark.sql.codegen.factoryMode": "NO_CODEGEN",
                "spark.sql.constraintPropagation.enabled": "false",
            },
        ),
    ]:
        stmt = eng.prepare(sql, hot=True, layout=False)
        for k, v in confs.items():
            stmt._template.spark.conf.set(k, v)
        ks = [keys.pop() for _ in range(40)]
        for k in ks[:5]:
            stmt.execute({"$1": k}).collect()  # warm
        phase_split(stmt, ks[5:], conf_label)
        stmt.close()

    for conf_label, confs in [
        ("default(layout)", {}),
        ("NO_CODEGEN(layout)", {"spark.sql.codegen.factoryMode": "NO_CODEGEN"}),
        (
            "NO_CODEGEN+noconstraint(lay)",
            {
                "spark.sql.codegen.factoryMode": "NO_CODEGEN",
                "spark.sql.constraintPropagation.enabled": "false",
            },
        ),
    ]:
        stmt = eng.prepare(sql)
        for k, v in confs.items():
            stmt._template.spark.conf.set(k, v)
        ks = [keys.pop() for _ in range(40)]
        for k in ks[:5]:
            stmt.execute({"$1": k}).collect()
        phase_split(stmt, ks[5:], conf_label)
        stmt.close()
    print(f"loadavg end {os.getloadavg()}")


if __name__ == "__main__":
    main()
