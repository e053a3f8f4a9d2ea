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


def _widened_band_recalls(
    reps: int, expect_b: int, masks, q_stride: int, want_recall: bool = True
):
    """Shared harness for the band-widening recall floors AND (r9 advice)
    the candidate-cost side of the ring jump: build a deterministic
    synthetic corpus of `reps` perturbed replicas of each real sf0.01
    embedding (+-0.05/component — the scaling generator's perturbation
    scale, so true top-5 neighbors sit at the same cosines the probe
    tiers measure), assert the in-plan b_eff formula selects `expect_b`
    at that density, and return {mask_spec: (recall@5 array, candidate
    count array)} over every q_stride-th vector as a query.

    A mask spec is either an int b (ring per the shipped
    _BAND_MULTIPROBE_MIN_B rule) or a (b, use_ring) tuple overriding the
    rule — the override exists so the candidate test can measure the
    REJECTED width-12-with-ring alternative the jump was built to avoid.
    With want_recall=False the exact-cosine ground truth (the
    multi-GB part) is skipped and only candidate counts are returned.

    Key computation replicates functions.lsh_table_keys_udf's contract
    exactly (same plane rows, 6-dp half-away-from-zero rounding before the
    sign test, table-major bit packing) in numpy, so a plane-layout or
    rounding change that shifts buckets shifts this measurement too.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from datafusion_dynamic_filter_spark.operators.similarity import (
        _BAND_PLANE_ROWS,
        _BAND_PLANES_MAX,
        _N_TABLES,
    )

    base = np.array(
        pq.read_table(SF_DIR + "/embeddings.parquet")
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )  # 500 x 64
    rng = np.random.default_rng(20260815)
    corpus = np.repeat(base, reps, axis=0) + rng.uniform(
        -0.05, 0.05, size=(len(base) * reps, base.shape[1])
    )
    n = len(corpus)
    b_base = 4 + sum(n > 500 * (1 << j) for j in range(4, 16))
    b_eff = 16 if b_base >= 12 else b_base  # r9 ring-aware jump
    assert b_eff == expect_b, (n, b_base, b_eff)

    # exact lsh_table_keys_udf semantics, vectorized over the whole corpus
    signs = np.array(_BAND_PLANE_ROWS, dtype=np.float64).T  # dims x 192
    raw = corpus @ signs[: corpus.shape[1]]
    proj = np.trunc(raw * 1e6 + np.copysign(0.5, raw)) / 1e6
    weights = np.zeros((_BAND_PLANES_MAX * _N_TABLES, _N_TABLES), dtype=np.int64)
    for t in range(_N_TABLES):
        for r in range(_BAND_PLANES_MAX):
            weights[t * _BAND_PLANES_MAX + r, t] = 1 << r
    keys = (proj > 0).astype(np.int64) @ weights  # n x 12 full 16-bit keys

    q_idx = np.arange(0, n, q_stride)
    top5 = None
    if want_recall:
        norms = np.linalg.norm(corpus, axis=1)
        unit = (corpus / norms[:, None]).astype(np.float32)
        sims = unit[q_idx] @ unit.T  # exact cosines, queries x n
        sims[np.arange(len(q_idx)), q_idx] = -np.inf
        top5 = np.argpartition(-sims, 5, axis=1)[:, :5]

    from datafusion_dynamic_filter_spark.operators.similarity import (
        _BAND_MULTIPROBE_MIN_B,
    )

    out = {}
    for spec in masks:
        b, use_ring = (
            spec if isinstance(spec, tuple)
            else (spec, spec >= _BAND_MULTIPROBE_MIN_B)
        )
        masked = keys & ((1 << b) - 1)
        # candidate iff ANY table hits: masked keys equal, OR (the r9
        # full Hamming-1 probe ring, live once b >= 12) they differ in
        # exactly one of the b bits — i.e. the masked XOR is zero or a
        # power of two, the (x & (x-1)) == 0 closed form.  Empty ring
        # when b <= 11, where this reduces to exact key equality (the
        # r8 single-probe form).
        q_keys = masked[q_idx]
        recalls, cands = [], []
        for qi in range(len(q_idx)):
            diff = masked ^ q_keys[qi]
            if use_ring:
                hit = (diff & (diff - 1)) == 0
            else:
                hit = diff == 0
            any_hit = hit.any(axis=1)
            cands.append(any_hit.sum() - 1)  # exclude the query itself
            if want_recall:
                recalls.append(any_hit[top5[qi]].mean())
        out[spec] = (
            np.array(recalls) if want_recall else None,
            np.array(cands),
        )
    return out


def test_next_band_widenings_keep_recall_floor():
    """r8 verdict item 3: the adaptive band had measured recall only up to
    b_eff = 9 (min recall@5 = 0.8 at ~sf10 — exactly the gate), so the
    NEXT widenings (b_eff = 10 at >256k vectors, 11 at >512k) shipped with
    no recall floor.  Measured at the exact density the in-plan formula
    maps to b_eff = 10 (260k vectors = 520 replicas), min recall@5 >= 0.8
    under BOTH masks.  Masking to b_eff = 11 on the b_eff = 10 corpus is
    conservative: the corpus that actually selects 11 is denser, its true
    top-5 sit at higher cosine, and a band's survival probability rises
    with cosine."""
    for b, (recalls, _) in _widened_band_recalls(520, 10, (10, 11), 1000).items():
        assert recalls.min() >= 0.8, (
            b, float(recalls.min()), float(recalls.mean()),
        )
        assert recalls.mean() >= 0.95, (b, float(recalls.mean()))


def test_sf100_band_widening_keeps_recall_floor():
    """r9: the ~sf100 scaling tier (2M vectors) is the first corpus whose
    BASE width reaches the multiprobe regime (12 at > 500 * 2^11 =
    1.024M), one past the floors above — the exact 'next decade claimed
    without a measured recall floor' gap the r8 verdict warned about.
    The in-plan formula jumps straight to b_eff = 16 there (the
    ring-aware width jump — see _BAND_MULTIPROBE_MIN_B in
    operators/similarity.py: keeping the population target while the
    Hamming-1 ring multiplies probes 13x generated ~1.6e9 candidate
    pairs at 2M vectors and exhausted the first probe run's spill disk).
    Measured at the exact jump density (1.05M vectors = 2100 replicas),
    min recall@5 >= 0.8 under the b = 16 ring.  History: the
    single-probe form measured min 0.6 at this density (mean 0.995, one
    query of 1050 — its missed cos-0.97 neighbors differed by exactly
    one uniformly-placed bit in most tables), which is what forced the
    full Hamming-1 probe ring; the ring at b = 12/13 measured min = 1.0,
    and the b = 16 jump re-measures here.  Memory note: the harness
    holds the 1.05M x 192 projection (~1.6 GB) and a 1050 x 1.05M
    float32 cosine block (~4.4 GB) transiently — fine on the 128 GB test
    host, and why q_stride stays at 1000."""
    for b, (recalls, _) in _widened_band_recalls(2100, 16, (16,), 1000).items():
        assert recalls.min() >= 0.8, (
            b, float(recalls.min()), float(recalls.mean()),
        )
        assert recalls.mean() >= 0.95, (b, float(recalls.mean()))


def test_ring_budget_guard_fires_at_boundary(spark):
    """r9 verdict item 6: the config comment documented that the b=16
    ring's candidate budget ends where the width formula saturates
    (_BAND_TARGET_BUCKET * 2^15 = 16.384M vectors) and prescribed raising
    _BAND_PLANES_MAX — but nothing ENFORCED the limit where it binds.
    band_width_col now evaluates an in-plan assert_true on the count
    relation; this drives it at both sides of the exact boundary."""
    import pytest

    from datafusion_dynamic_filter_spark.operators.similarity import (
        _BAND_PLANES_MAX,
        _BAND_RING_MAX_VECS,
        band_width_col,
    )

    def width_at(n):
        return (
            spark.range(1)
            .select(F.lit(n).cast("long").alias("n_vecs"))
            .select(band_width_col().alias("b"))
            .collect()[0].b
        )

    assert width_at(_BAND_RING_MAX_VECS) == _BAND_PLANES_MAX
    assert width_at(500) == 4  # driver-SF regime untouched
    with pytest.raises(Exception, match="ring candidate budget"):
        width_at(_BAND_RING_MAX_VECS + 1)


def test_ivf_sub_budget_guard_fires_at_boundary(spark):
    """r10: the same enforcement applied to the second adaptive formula —
    IVF's sub-bucket mask saturates at _IVF_TARGET_CELL * n_labels *
    2^_IVF_SUB_BITS_MAX vectors, past which per-cell population grows
    linearly again.  ivf_sub_width_col raises in-plan at that boundary;
    driven here at both sides with a literal (n, nl) relation."""
    import pytest

    from datafusion_dynamic_filter_spark.operators.similarity import (
        _IVF_SUB_BITS_MAX,
        _IVF_TARGET_CELL,
        ivf_sub_width_col,
    )

    def width_at(n, nl=10):
        return (
            spark.range(1)
            .select(
                F.lit(n).cast("long").alias("n"),
                F.lit(nl).cast("long").alias("nl"),
            )
            .select(ivf_sub_width_col().alias("s"))
            .collect()[0].s
        )

    bound = 10 * _IVF_TARGET_CELL * (1 << _IVF_SUB_BITS_MAX)
    assert width_at(bound) == _IVF_SUB_BITS_MAX
    assert width_at(10 * _IVF_TARGET_CELL) == 0  # driver-SF regime
    with pytest.raises(Exception, match="refinement budget"):
        width_at(bound + 1)


def test_sf100_ring_jump_keeps_candidates_flat():
    """r9 advice: the recall side of the b=16 ring jump is floor-tested
    above, but the COST side — the claim that candidates/query stay ~flat
    through the 12 -> 16 transition instead of the 13x blowup that
    exhausted the first sf100 probe run's spill disk — had no test, so a
    regression of the jump condition would only surface as a multi-hour
    probe-tier failure.  Measured at the exact jump density (1.05M
    vectors), per-query deduplicated candidate counts:

    - the SHIPPED form (b=16 WITH the Hamming-1 ring) must stay within a
      small multiple of the width-12 single-probe volume (the regime the
      tiers below the jump run in), and
    - the REJECTED alternative (b=12 WITH the ring — what a broken jump
      condition would silently ship) must measure the blowup that
      motivated the jump, so this test fails in the direction that
      matters if the ring activates without the width jump.

    Measured at commit time: shipped 8,208 candidates/query (1.2x the
    6,839 single-probe-12 volume); rejected alternative 52,604 (6.4x the
    shipped form) — the gates below leave real headroom on both sides.
    """
    out = _widened_band_recalls(
        2100, 16, ((16, True), (12, False), (12, True)), 10000,
        want_recall=False,
    )
    shipped = out[(16, True)][1].mean()
    single12 = out[(12, False)][1].mean()
    rejected = out[(12, True)][1].mean()
    assert shipped <= 3 * single12, (shipped, single12)
    assert rejected >= 4 * shipped, (rejected, shipped)


def test_ivf_nlist_derivation_pins_cell_population():
    """The 'fixed nlist' adjudication (r11): the IVF index's effective
    cell count nlist_eff = n_labels * 2^s_eff is count-derived, so the
    expected per-cell population n / nlist_eff sits in
    (TARGET/2, TARGET] for EVERY corpus size above one target cell and
    below the saturation boundary — the property that bounds per-query
    candidate volume no matter how the corpus grows.  Pure-Python mirror
    of the in-plan indicator sum (the Spark Column twin is
    boundary-tested in test_ivf_sub_budget_guard_fires_at_boundary)."""
    from datafusion_dynamic_filter_spark.operators.similarity import (
        _IVF_SUB_BITS_MAX,
        _IVF_TARGET_CELL,
    )

    t, bmax = _IVF_TARGET_CELL, _IVF_SUB_BITS_MAX
    for nl in (1, 7, 10, 40):
        saturation = t * nl * (1 << bmax)
        # sweep densely around every power-of-two threshold plus random
        # interior points across four decades
        ns = set()
        for j in range(bmax + 1):
            edge = t * nl * (1 << j)
            ns.update((edge - 1, edge, edge + 1))
        ns.update(int(t * nl * x) for x in (1.5, 3.7, 9.9, 41.0, 777.0))
        for n in sorted(ns):
            if not (t * nl < n <= saturation):
                continue
            s_eff = sum(1 for j in range(bmax) if n > t * nl * (1 << j))
            pop = n / (nl * (1 << s_eff))
            assert t / 2 < pop <= t, (nl, n, s_eff, pop)
        # below one target cell the mask is empty and cells are small
        assert sum(1 for j in range(bmax) if t * nl > t * nl * (1 << j)) == 0


def test_ivf_argmax_assignment_matches_window_twin(spark):
    """The r11 map-side argmax assignment (max(struct(cell_sim, -cell))
    under groupBy(vec_id) + join-back) must pick EXACTLY the cell a
    row_number-over-Window assignment picks — the independent-twin
    pattern (tests/test_semdedup_refinement.py): the twin below is the
    pre-r11 window construction, built here from the same centroid
    relation, so a tie-break or rounding divergence in the shipped form
    cannot hide."""
    from pyspark.sql.window import Window

    from datafusion_dynamic_filter_spark.functions import (
        dot,
        l2_norm,
        vec_double,
    )
    from datafusion_dynamic_filter_spark.registry import tables

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        t = tables(spark, sf_dir)
        emb = t["embeddings"].select(
            "vec_id", vec_double("embedding").alias("v")
        ).withColumn("nv", l2_norm(F.col("v")))
        by_dim = t["embeddings"].select(
            "label", F.posexplode(vec_double("embedding")).alias("i", "x")
        )
        centv = (
            by_dim.groupBy("label", "i")
            .agg(F.avg("x").alias("cx"))
            .groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("p"))
            .select(
                F.col("label").alias("cell"),
                F.transform("p", lambda s: s.getField("cx")).alias("c"),
            )
            .withColumn("cn", l2_norm(F.col("c")))
        )
        cell_sim = F.round(
            dot(F.col("v"), F.col("c")) / (F.col("nv") * F.col("cn")), 4
        )
        scored = emb.crossJoin(F.broadcast(centv)).select(
            "vec_id", "cell", cell_sim.alias("cell_sim")
        )
        # twin: the pre-r11 window form
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("cell_sim"), F.asc("cell")
        )
        twin = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cell").alias("cell_twin"))
        )
        # shipped shape: max of (cell_sim, -cell)
        shipped = (
            scored.select(
                "vec_id",
                F.struct(
                    F.col("cell_sim"), (-F.col("cell")).alias("neg_cell")
                ).alias("s"),
            )
            .groupBy("vec_id")
            .agg(F.max("s").alias("best"))
            .select("vec_id", (-F.col("best.neg_cell")).alias("cell"))
        )
        diff = shipped.join(twin, "vec_id").filter(
            F.col("cell") != F.col("cell_twin")
        )
        assert diff.count() == 0, sf_dir
