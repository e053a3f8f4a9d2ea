"""r14 semdedup pair-stage kernel gates.

The intra-cell pair stage is a grouped Arrow kernel (matmul prune +
exact cumsum-fold dot per (cell, sub) group) replacing the vector-
carrying self-join with per-pair interpreted-HOF cosines.  Exactness
rests on two pins:

1. numpy's cumsum left fold is BITWISE the SQL
   ``aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)``
   fold (same sequence of IEEE additions) — checked on adversarial
   mixed-magnitude vectors;
2. the shipped operator equals an in-test rebuild of the r13 join form
   end-to-end at sf0.01 (round / threshold / keeper CASE / distinct all
   stay Spark-side in both).
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.functions import dot

SF001 = "/root/testdata/sf0.01"


def test_cumsum_fold_matches_sql_aggregate_fold(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(500):
        a = rng.randn(64) * (10.0 ** rng.randint(-8, 8))
        b = rng.randn(64) * (10.0 ** rng.randint(-8, 8))
        rows.append((i, a.tolist(), b.tolist()))
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    got = (
        df.select("id", dot(F.col("a"), F.col("b")).alias("d"))
        .orderBy("id")
        .collect()
    )
    for r, (i, a, b) in zip(got, rows):
        mine = float(np.cumsum(np.array(a) * np.array(b))[-1])
        assert mine == r.d or (np.isnan(mine) and np.isnan(r.d)), i


def test_kernel_operator_matches_join_form(spark, testdata):
    """Shipped dedup_semdedup == the r13 self-join form, rebuilt here
    from the same assigned relation, at sf0.01."""
    import tests.conftest as c
    from datafusion_dynamic_filter_spark import registry

    registry.load_all()
    registry.tables(spark, c.SF_DIR)
    shipped = registry.QUERIES["dedup_semdedup"](spark, c.SF_DIR)
    got = sorted(tuple(r) for r in shipped.collect())

    # r13 join form, rebuilt from the module's own pieces
    from pyspark.sql.window import Window

    import datafusion_dynamic_filter_spark.operators.dedup as D
    from datafusion_dynamic_filter_spark.functions import (
        l2_norm,
        vec_double,
    )
    from datafusion_dynamic_filter_spark.registry import tables

    threshold = 0.3
    t = tables(spark, c.SF_DIR)
    packed_lits = ", ".join(str(x) for x in D._sem_packed_signs())
    projs = [
        F.expr(
            f"round(aggregate(zip_with(v, slice(array({packed_lits}), 1, size(v)), "
            f"(x, pk) -> x * (CAST((shiftright(pk, {p}) & 1) * 2 - 1 AS DOUBLE))), "
            "0D, (acc, e) -> acc + e), 6)"
        )
        for p in range(D._SEM_SUB_PLANES)
    ]
    sub_bits = sum(
        F.when((F.col("s_eff") > p) & (projs[p] > 0), F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        for p in range(D._SEM_SUB_PLANES)
    )
    stats = t["embeddings"].agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.countDistinct("label").alias("n_cells"),
    )
    emb = (
        t["embeddings"]
        .select("vec_id", "label", vec_double("embedding").alias("v"))
        .withColumn("nv", l2_norm(F.col("v")))
    )
    by_dim = emb.select("label", F.posexplode("v").alias("dim", "x"))
    cent = (
        by_dim.groupBy("label", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda s: s.getField("cx")).alias("c"),
        )
        .withColumn("cn", l2_norm(F.col("c")))
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "v",
        "nv",
        "cell",
        F.round(dot(F.col("v"), F.col("c")) / (F.col("nv") * F.col("cn")), 4).alias(
            "cc"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cc"), "cell")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(stats))
        .withColumn("s_eff", D._sem_sub_width_col().cast("int"))
        .withColumn("sub", sub_bits.cast("long"))
        .select("vec_id", "cell", "sub", "cc", "v", "nv")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.sub") == F.col("b.sub"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.cell").alias("cell"),
        F.col("a.vec_id").alias("va"),
        F.col("b.vec_id").alias("vb"),
        F.col("a.cc").alias("cca"),
        F.col("b.cc").alias("ccb"),
        F.round(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nv") * F.col("b.nv")), 4
        ).alias("cs"),
    )
    drops = (
        pairs.filter(F.col("cs") >= threshold)
        .select(
            "cell",
            F.when(
                (F.col("cca") > F.col("ccb"))
                | ((F.col("cca") == F.col("ccb")) & (F.col("va") > F.col("vb"))),
                F.col("va"),
            )
            .otherwise(F.col("vb"))
            .alias("vec_id"),
        )
        .distinct()
    )
    want = sorted(
        tuple(r)
        for r in drops.join(assigned.select("vec_id", "cc"), "vec_id")
        .select("cell", "vec_id", F.col("cc").alias("centroid_cos"))
        .collect()
    )
    assert got == want
    assert len(got) > 0  # non-vacuous
