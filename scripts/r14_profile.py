#!/usr/bin/env python
"""r14 optimization-round profiler.

For each named headline query, in the exact bench session shape
(bench._make_session): write `explain("formatted")` to
plans/r14/<name>_<tag>.txt and time it with the bench's own methodology
(one warm pass + min-of-N timed .count() samples), printing a JSON line.

Usage: python scripts/r13_profile.py [--tag before|after] [--samples N] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _make_session / SF_DIR)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    os.makedirs("plans/r14", exist_ok=True)
    eng, spark, registry = bench._make_session("ddf-r14-profile")
    spark.table("lineitem").count()
    spark.table("documents").count()
    jvm_gc = spark.sparkContext._jvm.System.gc
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        jvm_gc()
        df = fn(spark, bench.SF_DIR)
        if not args.no_plan:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r14/{name}_{args.tag}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"r13 {name} warm")
        rows = fn(spark, bench.SF_DIR).count()  # warm (plan + cache fill)
        samples = []
        for i in range(args.samples):
            spark.sparkContext.setJobDescription(f"r13 {name} sample {i}")
            t0 = time.perf_counter()
            fn(spark, bench.SF_DIR).count()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(samples), "samples": samples, "rows": rows}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"tag": args.tag, "results": out}))


if __name__ == "__main__":
    main()
