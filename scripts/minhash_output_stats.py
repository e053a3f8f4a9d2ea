#!/usr/bin/env python
"""Per-tier output-structure stats for dedup_minhash_lsh — the evidence
behind the README's adjudication of its superlinear ROWS exponent
(rows_exponent_4dec 1.33 vs time 0.46 in SCALING.json, r9 verdict item 3).

For each scaling tier this measures, with the operator's own machinery:
  - per-(band, bucket) population stats (max / mean / p99.9) — a blowup
    here would mean the CANDIDATE equi-join is degenerating (operator bug);
  - candidate-pair count and exact-verify yield — a collapsing yield would
    mean banding is generating junk candidates (operator bug);
  - verified-pair degree stats (partners per partnered doc, partnered-doc
    fraction) — growth here means the OUTPUT itself is growing because the
    corpus's near-dup groups are getting bigger (corpus property).

Measured r10 (committed in the README's scaling section): buckets stay
bounded (max 10/44/253, p99.9 = 3/6/12 at sf1/sf10/sf100), yield stays
~65-87%, while mean degree grows 1.09 -> 1.62 -> 4.77 and the partnered
fraction 9.6% -> 28.2% -> 43.9% — the generator's composed mutation
chains multiply within-slice group sizes, and pairs per group grow
~quadratically in group size.  Attribution: corpus compounding, not
candidate blowup.

Usage: python scripts/minhash_output_stats.py   (tiers must exist — run
the scaling probe first so .scaling_sf{1,10,100} are generated)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datafusion_dynamic_filter_spark import Engine, registry  # noqa: E402
from datafusion_dynamic_filter_spark.functions import band_bucket_array  # noqa: E402
from datafusion_dynamic_filter_spark.operators.dedup import (  # noqa: E402
    _lsh_candidates,
    _minhash_sig,
    _minhash_verified_pairs,
)


def main() -> None:
    eng = Engine(
        app_name="minhash-output-stats",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.ui.enabled": "false",
                    "spark.driver.memory": "32g"},
    )
    spark = eng.spark
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tier, d in (
        ("sf1", os.path.join(REPO, ".scaling_sf1")),
        ("sf10", os.path.join(REPO, ".scaling_sf10")),
        ("sf100", os.path.join(REPO, ".scaling_sf100")),
    ):
        if not os.path.isdir(d):
            print(f"skip {tier}: {d} not generated", file=sys.stderr)
            continue
        t0 = time.perf_counter()
        sig = _minhash_sig(spark, d, num_hashes=32).persist()
        n_docs = sig.count()
        buckets = sig.select(
            "doc_id",
            F.posexplode(band_bucket_array(32, 8)).alias("band_idx", "bucket"),
        )
        bstats = (
            buckets.groupBy("band_idx", "bucket").count()
            .agg(
                F.max("count").alias("max_pop"),
                F.round(F.avg("count"), 3).alias("mean_pop"),
                F.expr("percentile_approx(count, 0.999)").alias("p999_pop"),
            )
            .collect()[0].asDict()
        )
        n_cand = _lsh_candidates(
            sig, num_hashes=32, bands=8, threshold=0.5, size_prune=True
        ).count()
        ver = _minhash_verified_pairs(
            spark, d, num_hashes=32, bands=8, threshold=0.5, size_prune=True
        ).persist()
        n_ver = ver.count()
        deg = (
            ver.select(F.col("doc_a").alias("d"))
            .union(ver.select(F.col("doc_b").alias("d")))
            .groupBy("d").count()
            .agg(
                F.max("count").alias("max_deg"),
                F.round(F.avg("count"), 3).alias("mean_deg"),
                F.count(F.lit(1)).alias("docs_with_partner"),
            )
            .collect()[0].asDict()
        )
        out[tier] = dict(
            n_docs=n_docs,
            n_candidates=n_cand,
            n_verified=n_ver,
            # n_cand == 0 (no banding collisions at all) is itself the
            # diagnostic result — report it instead of dividing by it
            verify_yield_pct=(
                round(100.0 * n_ver / n_cand, 2) if n_cand else None
            ),
            bucket=bstats,
            degree=deg,
            partnered_pct=round(100.0 * deg["docs_with_partner"] / n_docs, 2),
            sec=round(time.perf_counter() - t0, 1),
        )
        print(tier, json.dumps(out[tier]), flush=True)
        ver.unpersist()
        sig.unpersist()
        registry.release_persisted()
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
