"""Recall and candidate-cost gates for the shipped ANN index.

The r5 verdict's top item: the engine's own audit proved the single-probe
sign-LSH default recalled ~0 of the true top-5.  The r6 default is
multi-table banded sign-LSH (L=12 tables x b=4 planes); these tests pin
its quality floor so a future config change cannot silently regress it:

- recall@5 of the true top-5 must stay >= 0.8 (the audit's own number —
  seed-fixed planes + deterministic rounding make this exact, not flaky);
- candidate generation must stay BOUNDED: the deduplicated candidate set
  per query is a strict subset of the corpus (on this near-random synthetic
  geometry ~0.5x corpus — the honest price of recall 0.8 when true
  neighbors sit barely above random; see the config comment in
  operators/similarity.py), never a blowup ABOVE the corpus (which would
  mean the dedup or the join key is broken).
"""

import statistics

from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark import registry

registry.load_all()

SF_DIR = "/root/testdata/sf0.01"  # 500 vectors, 5 queries — the driver's SF


def test_banded_lsh_recall_floor(spark):
    rows = registry.QUERIES["similarity_ann_recall"](spark, SF_DIR).collect()
    mean_recall = statistics.mean(r.lsh_recall for r in rows)
    assert mean_recall >= 0.8, [r.asDict() for r in rows]
    # and the audit still exposes the single-probe baseline as broken here
    assert statistics.mean(r.lsh_single_recall for r in rows) < 0.2


def test_banded_lsh_candidates_bounded(spark):
    from datafusion_dynamic_filter_spark.functions import (
        lsh_table_buckets_udf,
        vec_double,
    )
    from datafusion_dynamic_filter_spark.operators.similarity import (
        _BAND_PLANES,
        _N_TABLES,
        _PACKED_SIGNS,
    )

    emb = (
        spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", vec_double("embedding").alias("v"))
    )
    n_corpus = emb.count()
    buckets_of = lsh_table_buckets_udf(_PACKED_SIGNS, _BAND_PLANES, _N_TABLES)
    blk = emb.select(
        "vec_id", F.posexplode(buckets_of("v")).alias("tbl", "bucket")
    )
    qblk = blk.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("tbl").alias("q_tbl"),
        F.col("bucket").alias("q_bucket"),
    )
    n_queries = qblk.select("q_id").distinct().count()
    cand = (
        F.broadcast(qblk)
        .join(
            blk,
            (F.col("tbl") == F.col("q_tbl"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id")
        .distinct()
        .count()
    )
    frac = cand / (n_queries * n_corpus)
    # measured 0.52 at sf0.01; anything near 1.0 means banding stopped
    # pruning, anything above 1.0 means the pair dedup broke
    assert frac <= 0.7, f"candidate fraction {frac:.3f}"


def test_adaptive_band_low_bits_match_fixed_index(spark):
    """The r8 adaptive-band index must be BYTE-IDENTICAL to the r6 fixed-b
    index wherever b_eff = 4 (every driver/test SF): table t's low 4 key
    bits are the same planes (lsh_plane_signs prefix-stability), so
    full16 & 0b1111 must equal the old 4-bit bucket for every (vector,
    table).  This pins the no-regression claim the driver's correctness
    rows rest on; a plane-layout refactor that breaks it would silently
    re-bucket the shipped ANN default."""
    from datafusion_dynamic_filter_spark.functions import (
        lsh_table_buckets_udf,
        lsh_table_keys_udf,
        vec_double,
    )
    from datafusion_dynamic_filter_spark.operators.similarity import (
        _BAND_PLANE_ROWS,
        _BAND_PLANES,
        _BAND_PLANES_MAX,
        _N_TABLES,
        _PACKED_SIGNS,
    )

    emb = (
        spark.read.parquet(SF_DIR + "/embeddings.parquet")
        .select("vec_id", vec_double("embedding").alias("v"))
    )
    old = lsh_table_buckets_udf(_PACKED_SIGNS, _BAND_PLANES, _N_TABLES)
    new = lsh_table_keys_udf(_BAND_PLANE_ROWS, _BAND_PLANES_MAX, _N_TABLES)
    mask = (1 << _BAND_PLANES) - 1
    diff = (
        emb.select(
            "vec_id",
            F.posexplode(F.arrays_zip(old("v"), new("v"))).alias("tbl", "pair"),
        )
        .filter(F.col("pair")["0"] != F.col("pair")["1"].bitwiseAND(F.lit(mask)))
        .count()
    )
    assert diff == 0
