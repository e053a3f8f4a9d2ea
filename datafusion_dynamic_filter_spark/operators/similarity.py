"""Similarity search over the ``embeddings`` table (array<float> column).

Baseline: brute-force cosine top-k as a broadcast nested-loop (exact).
Scale path: LSH bucketing (random hyperplanes) so candidate generation is an
equi-join on bucket keys; at 100 TB the query set is broadcast and the corpus
is scanned once, partition-parallel, with per-partition top-k folded by the
final TakeOrdered — no global sort of the full score matrix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import (
    cosine,
    dot,
    fan_out,
    indicator_width,
    l2_norm,
    lsh_bucket_udf,
    lsh_plane_signs,
    lsh_table_buckets_udf,
    lsh_table_keys_udf,
    saturation_guarded,
    vec_double,
)
from ..registry import query, tables, track_persist

# Multi-table (banded) sign-LSH configuration — the shipped default since
# r6.  L tables of b planes each: candidate iff ALL b bits of ANY table
# agree, so recall at angle theta is 1-(1-p^b)^L with p = 1-theta/pi — the
# OR-of-tables trick that MinHash banding uses (dedup._lsh_candidates).
# (b=4, L=12) was chosen by exact seed-fixed simulation on the driver
# corpora: realized recall@5 of the true top-5 is 0.84 (sf0.01) / 0.85
# (sf0.1) at a ~0.5 candidate fraction.  This synthetic corpus is the
# sign-LSH worst case — true top-5 cosines average only ~0.38 while random
# pairs sit at ~0.0, i.e. collision prob 0.62 vs 0.50, a 0.12 gap — so ANY
# config reaching recall 0.8 pays ~half-corpus candidates here; on real
# encoder embeddings (top-1 cos ~0.9 -> p ~0.8 vs 0.5) the identical
# banding prunes orders of magnitude harder.  The old 12-plane single-probe
# index (recall ~0 here, kept as similarity_lsh_single_probe) is the
# cautionary baseline the recall audit exposes.
_BAND_PLANES = 4
_N_TABLES = 12
_N_PLANES = _BAND_PLANES * _N_TABLES
#: single-probe (pre-r6 default) plane count; lsh_plane_signs(48)[:12] ==
#: lsh_plane_signs(12) (row-major generation from one seed), so the old
#: operator's buckets are bit-identical to what it always computed.
_SINGLE_PLANES = 12
_PLANES = lsh_plane_signs(_N_PLANES)  # deterministic +-1 matrix, seed-fixed
# All plane signs of each dimension packed into ONE int (bit p set iff
# plane p's sign at that dim is +1): the per-row projection work becomes
# a single array lookup + bit tests instead of interpreted element_at
# calls on 128-literal arrays (measured: the per-lookup form made the index
# 1.4x SLOWER than brute force at sf0.1).  48 bits < 63, exact in BIGINT.
_PACKED_SIGNS = [
    sum((1 << p) for p in range(_N_PLANES) if _PLANES[p][d] > 0)
    for d in range(len(_PLANES[0]))
]

# --- Adaptive band width (r8) -------------------------------------------
# The r8 three-decade probe caught the fixed b=4 band going quadratic: 16
# buckets per table means bucket population is corpus/16, so candidates
# grow LINEARLY with the corpus and the index measured 574 s at ~sf10
# (vs 3.7 s at sf1) — the same fixed-parameter blind spot the r7 probe
# caught in SemDeDup's fixed cells, one decade later.  Fix: each table
# carries up to 16 planes, and the EFFECTIVE band width
#     b_eff = 4 + sum_{j=4..15} [n_vecs > 500 * 2^j]   (clamped [4, 16])
# is computed INSIDE the plan from a 1-row count relation, with exact
# integer threshold comparisons (no float log2 — cross-engine identical).
# Bucket count grows with the corpus so bucket population stays ~500.
# Plane layout keeps table t's LOW 4 bits equal to the old fixed-b planes
# (lsh_plane_signs is prefix-stable), so wherever b_eff = 4 — every
# driver/test SF — keys, candidates, and results are byte-identical to
# the r6 fixed-b index.  Recall under a wider band is safe exactly where
# the band widens: a bigger corpus is denser, so true top-k neighbors sit
# at higher cosine (p = 1-theta/pi closer to 1) and survive more bits.
# MEASURED (r8, live similarity_ann_recall audit): recall@5 = 1.0 over
# all 200 queries at sf1 (b_eff = 6) and mean 0.999 / min 0.8 over all
# 2000 queries at ~sf10 (b_eff = 9), while the index itself went from
# 574 s (fixed b=4) to ~17-21 s at sf10 — 27x — and stayed flat at sf1.
# The adaptivity costs ~0.4-0.8 s of fixed local-mode job overhead at
# sf0.1 (count relation + broadcast + index persist, amortized away at
# scale) — the same small-SF floor the DPP batch rows document.
_BAND_PLANES_MAX = 16
_BAND_TARGET_BUCKET = 500
#: r9: full Hamming-1 multiprobe once the band is this wide.  The r9
#: numpy floor test caught min recall@5 = 0.6 (mean 0.995) at the
#: b_eff = 12 density — the first widening past the measured floors
#: (b <= 9 live at the probe tiers, 10/11 pinned by the 260k-corpus
#: test).  Diagnosis of the failing query: its missed true neighbors sit
#: at cos ~0.97 (p ~0.92/bit, so ~1 expected flipped bit per 12-bit key)
#: and differed from the query in EXACTLY ONE bit in most tables — a
#: uniformly-placed bit, so a ring over only the widened high bits
#: recovers 1/12th of nothing (it measured min 0.6 unchanged).  For
#: b_eff >= 12, each table therefore probes its own bucket PLUS all
#: b_eff single-bit flips (1 + b_eff probes/table): per-table survival
#: goes p^b -> p^b + b p^(b-1)(1-p), 0.37 -> 0.75 at p = 0.92 / b = 12,
#: and the floor test re-measures min recall@5 = 1.0 at the b = 12/13
#: densities.  Below b_eff = 12 the ring is empty and results stay
#: byte-identical to the r8 index at EVERY measured tier (b_eff <= 9 at
#: ~sf10).
#:
#: Ring-aware width jump (r9, measured): the ring multiplies probe
#: volume by (1 + b), so keeping the POPULATION target while activating
#: it multiplies candidates/query 13x — the first ~sf100 probe run
#: (2M vectors -> base width 12) generated 13 x 500 x 12 ~ 78k
#: candidates/query x 20k queries ~ 1.6e9 id-pairs, whose dedup shuffle
#: spilled > 90 GB and exhausted the probe host's disk.  The width
#: formula therefore targets PROBE VOLUME, not bucket population: once
#: the base width reaches the ring regime (>= 12), b_eff jumps straight
#: to the 16-plane max, so population drops 2^4 = 16x while the ring
#: multiplies 17x — candidates/query stay ~flat through the transition
#: ((1+16) x 30 x 12 ~ 6k at 2M vectors, the same order as the b = 9
#: single-probe tier below it).  Recall survives the jump because the
#: ring absorbs the expected single flipped bit: per-table survival at
#: p = 0.92 (cos ~0.97 neighbors) is p^16 + 16 p^15 (1-p) = 0.64, i.e.
#: ~1.0 over 12 tables, and the numpy floor test measures the b = 16
#: ring at the exact jump density (see test_ann_recall).  Intermediate
#: widths 12-15 are never selected; the formula's headroom past 16
#: (corpus > 500 * 2^15 / ... with the ring at max width) ends at
#: ~O(10M) vectors per 17x500x12 candidate budget — raise
#: _BAND_PLANES_MAX (prefix-stable planes, wider oracle literals) for
#: the next decade beyond that.  Since r10 that boundary is ENFORCED
#: in-plan, not just documented — see _BAND_RING_MAX_VECS below.
_BAND_MULTIPROBE_MIN_B = 12
#: r10 (r9 verdict item 6): the width formula SATURATES at b_eff = 16
#: once the corpus passes _BAND_TARGET_BUCKET * 2^15 = 16.384M vectors —
#: beyond that, bucket population (and with it candidates/query) grows
#: linearly again, the exact silent degradation the adaptive band
#: exists to prevent.  The limit is enforced where it binds: band_width_col
#: evaluates an in-plan assert_true against the same 1-row count
#: relation that selects b_eff, so a corpus past the budget fails
#: loudly with the remedy in the message instead of quietly going
#: linear.  Every measured tier (max 2M vectors at ~sf100) and every
#: driver SF sits far below the boundary, so no current plan changes.
_BAND_RING_MAX_VECS = _BAND_TARGET_BUCKET << 15


def band_width_col():
    """b_eff over a relation carrying the 1-row corpus count ``n_vecs``:
    the shared indicator-sum core (functions.indicator_width), the r9
    ring-aware jump straight to the 16-plane max once the base width
    reaches the multiprobe regime, and the r10 ring-budget guard
    (_BAND_RING_MAX_VECS, functions.saturation_guarded) that raises
    in-plan, with the remedy in the message, where the formula would
    otherwise saturate and silently go linear."""
    b_base = F.lit(_BAND_PLANES) + indicator_width(
        F.col("n_vecs"),
        F.lit(_BAND_TARGET_BUCKET),
        range(_BAND_PLANES, _BAND_PLANES_MAX),
    )
    b_eff = F.when(
        b_base >= F.lit(_BAND_MULTIPROBE_MIN_B), F.lit(_BAND_PLANES_MAX)
    ).otherwise(b_base)
    return saturation_guarded(
        b_eff,
        F.col("n_vecs") <= F.lit(_BAND_RING_MAX_VECS),
        "banded LSH ANN: corpus exceeds the b=16 ring candidate "
        f"budget ({_BAND_RING_MAX_VECS} vectors); raise "
        "_BAND_PLANES_MAX (prefix-stable planes, wider oracle "
        "literals) before indexing at this scale",
    )
_EXT_PLANES = lsh_plane_signs(_N_PLANES + _N_TABLES * (_BAND_PLANES_MAX - _BAND_PLANES))
assert _EXT_PLANES[: _N_PLANES] == _PLANES  # prefix-stable seed stream
#: table-major plane rows: plane t*16+r is bit r of table t; bits r < 4
#: are the OLD planes of table t, bits r >= 4 come from the extension.
_BAND_PLANE_ROWS = [
    _EXT_PLANES[t * _BAND_PLANES + r]
    if r < _BAND_PLANES
    else _EXT_PLANES[_N_PLANES + t * (_BAND_PLANES_MAX - _BAND_PLANES) + (r - _BAND_PLANES)]
    for t in range(_N_TABLES)
    for r in range(_BAND_PLANES_MAX)
]
#: packed literals for the oracle: 4 arrays of 48-bit ints per dim; plane
#: i lives in array i // 48, bit i % 48.
_BAND_PACKED = [
    [
        sum(
            (1 << j)
            for j in range(48)
            if c * 48 + j < _N_TABLES * _BAND_PLANES_MAX
            and _BAND_PLANE_ROWS[c * 48 + j][d] > 0
        )
        for d in range(len(_PLANES[0]))
    ]
    for c in range(4)
]


# --- Adaptive IVF cell refinement (r9) ----------------------------------
# The r9 fourth-decade probe planning caught the NEXT fixed-parameter
# scale bug before measuring it: similarity_ivf_topk's cell list was the
# 10 per-label centroids, so per-query candidates = corpus/10 grow
# LINEARLY with the corpus (the sf1 -> sf10 slice already measured
# ~1.1/decade) — the same blind spot as SemDeDup's fixed cells (r7) and
# the ANN index's fixed band (r8), one operator later.  Fix, following
# the proven adaptive-band pattern: each label cell is subdivided by the
# vector's sign-LSH bits masked to
#     s_eff = sum_{j=0..11} [n_vecs > 2000 * n_labels * 2^j]  (0..12 bits)
# computed INSIDE the plan from a 1-row count relation (exact integer
# thresholds, no float log2), so per-cell population is pinned at
# ~1000-2000 while the cell count grows with the corpus.  Recall is held
# by HAMMING-1 MULTIPROBE on the query side: a query probes its own
# sub-bucket plus the s_eff single-bit flips (s_eff + 1 equi-join probes,
# all within its label cell) — for a near neighbor agreeing per bit with
# p = 1 - theta/pi, recall is p^s + s*p^(s-1)*(1-p), e.g. ~0.98 at
# p = 0.97 / s = 7 (the ~sf100 density), vs ~0.81 single-probe.  At every
# driver/test SF s_eff = 0 (500-2000 vectors < 2000*10), the mask is
# empty, the only probe is sub-bucket 0, and the join degenerates to the
# pure label-cell equi-join — results byte-identical to the fixed-cell
# r6 form, exactly how the banded index pinned its no-regression claim.
# Sub-bucket planes are table 0's first 12 band planes (one 12-plane
# matmul per Arrow batch; same 6-dp rounding contract, same literal
# mirror in the DuckDB oracle).
_IVF_TARGET_CELL = 2000
_IVF_SUB_BITS_MAX = 12

# "Fixed nlist" adjudication (r11, closing the README's self-identified
# suspect): in this design the IVF index's EFFECTIVE cell count is
#     nlist_eff = n_labels * 2^s_eff
# — count-derived since r9 via the indicator-sum above, so per-cell
# population is pinned inside (TARGET/2, TARGET] for every corpus size up
# to the saturation boundary (where the plan raises; boundary-tested both
# sides in tests/test_ann_recall.py, population-band formula pinned in
# test_ivf_nlist_derivation).  What remains fixed is only the COARSE
# quantizer's list (the per-label centroids): that choice costs O(n_labels)
# fold evaluations per vector at assignment — a map-only projection since
# r11, no shuffle — and has NO effect on per-query candidate volume, which
# the sub-bucket mask bounds.  I.e. the classic IVF failure mode (fixed
# nlist => per-cell population, and with it probe cost, grows linearly
# with the corpus) is structurally closed by the same recipe as the
# banded index: the parameter that binds candidate volume is derived from
# the corpus count inside the plan, and saturates loudly.


def ivf_sub_width_col():
    """s_eff over a relation carrying the 1-row (n, nl) corpus stats
    (functions.indicator_width + saturation_guarded): once the corpus
    passes _IVF_TARGET_CELL * nl * 2^_IVF_SUB_BITS_MAX vectors (~82M at
    the corpus's 10 labels) the mask cannot widen further, per-cell
    population goes linear again, and the refinement silently degrades —
    so the plan raises with the remedy instead.  Every measured tier
    (max 2M vectors) and every driver SF is far below the boundary."""
    s_eff = indicator_width(
        F.col("n"),
        F.col("nl") * F.lit(_IVF_TARGET_CELL),
        range(_IVF_SUB_BITS_MAX),
    )
    return saturation_guarded(
        s_eff,
        F.col("n")
        <= F.col("nl") * F.lit(_IVF_TARGET_CELL * (1 << _IVF_SUB_BITS_MAX)),
        "IVF ANN: corpus exceeds the 12-bit sub-bucket refinement "
        f"budget ({_IVF_TARGET_CELL} * n_labels * 2^{_IVF_SUB_BITS_MAX} "
        "vectors); raise _IVF_SUB_BITS_MAX (prefix-stable band "
        "planes, wider oracle literals) before indexing at this scale",
    )
_IVF_SUB_PLANE_ROWS = _BAND_PLANE_ROWS[:_IVF_SUB_BITS_MAX]
_IVF_SUB_PACKED = [
    sum(
        (1 << r)
        for r in range(_IVF_SUB_BITS_MAX)
        if _IVF_SUB_PLANE_ROWS[r][d] > 0
    )
    for d in range(len(_PLANES[0]))
]


def _lsh_single_probe_oracle(k: int = 5, n_planes: int = _SINGLE_PLANES) -> str:
    packed = ", ".join(str(v) for v in _PACKED_SIGNS)
    proj_cols = ",\n".join(
        f"round(SUM(x * (((pk >> {p}) & 1) * 2 - 1)), 6) AS proj{p}"
        for p in range(n_planes)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN proj{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(n_planes)
    )
    return f"""
    WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
    ), ed AS (
    SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e
    ), edp AS (
    SELECT vec_id, x, ([{packed}])[pos] AS pk FROM ed
    ), pr AS (
    SELECT vec_id, {proj_cols} FROM edp GROUP BY vec_id
    ), bk AS (
    SELECT vec_id, {bucket_expr} AS bucket FROM pr
    ), corpus AS (
    SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)
    ), q AS (
    SELECT vec_id AS q_id, v AS qv, bucket AS q_bucket FROM corpus WHERE vec_id % 100 = 0
    ), scored AS (
    SELECT q.q_id, c.vec_id AS neighbor_id,
    round(list_dot_product(q.qv, c.v)
    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v))), 3) AS cos_sim
    FROM q JOIN corpus c ON c.bucket = q.q_bucket AND c.vec_id <> q.q_id
    ), ranked AS (
    SELECT q_id, neighbor_id, cos_sim,
    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
    )
    SELECT q_id, neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    ORDER BY q_id, cos_sim DESC, neighbor_id
    """


def _lsh_topk_oracle(
    k: int = 5, b_max: int = _BAND_PLANES_MAX, n_tables: int = _N_TABLES
) -> str:
    """DuckDB twin of the ADAPTIVE multi-table banded sign-LSH index: same
    table-major packed plane literals (4 x 48-bit chunks), full 16-bit
    per-table keys masked to b_eff bits, where the base width = 4 + the
    count of exact integer thresholds 500*2^j (j = 4..15) the corpus size
    exceeds, jumped to the full 16 planes once the base reaches the
    multiprobe regime (>= 12) — the same indicator sum + CASE the Spark
    plan computes, so b_eff (and at driver SFs, every key and result
    byte) matches exactly.  Candidates =
    DISTINCT pairs agreeing on any (table, masked bucket), where the
    query side probes its own bucket plus — once b_eff >= 12 — all b_eff
    single-bit flips (full Hamming-1 ring, empty below b_eff = 12 — see
    the r9 config comment above _BAND_MULTIPROBE_MIN_B)."""
    n_planes = b_max * n_tables
    chunks = ", ".join(
        "[" + ", ".join(str(v) for v in _BAND_PACKED[c]) + "]" for c in range(4)
    )
    proj_cols = ",\n".join(
        f"round(SUM(x * (((pk{p // 48} >> {p % 48}) & 1) * 2 - 1)), 6) AS proj{p}"
        for p in range(n_planes)
    )
    bbase_expr = str(_BAND_PLANES) + " + " + " + ".join(
        f"(CASE WHEN n > {_BAND_TARGET_BUCKET * (1 << j)} THEN 1 ELSE 0 END)"
        for j in range(_BAND_PLANES, b_max)
    )
    # ring-aware jump: base >= 12 selects the full 16 planes (mirrors the
    # Spark plan's b_eff exactly — see _BAND_MULTIPROBE_MIN_B)
    beff_expr = (
        f"CASE WHEN ({bbase_expr}) >= {_BAND_MULTIPROBE_MIN_B} "
        f"THEN {b_max} ELSE ({bbase_expr}) END"
    )
    bucket_exprs = ", ".join(
        "("
        + " + ".join(
            f"(CASE WHEN {r} < beff AND proj{l * b_max + r} > 0 THEN {1 << r} ELSE 0 END)"
            for r in range(b_max)
        )
        + ")"
        for l in range(n_tables)
    )
    return f"""
    WITH e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
    ), nv AS (
    SELECT {beff_expr} AS beff FROM (SELECT count(*) AS n FROM embeddings)
    ), ed AS (
    SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e
    ), pks AS (
    SELECT [{chunks}] AS pkc
    ), edp AS (
    SELECT vec_id, x, pkc[1][pos] AS pk0, pkc[2][pos] AS pk1,
           pkc[3][pos] AS pk2, pkc[4][pos] AS pk3
    FROM ed CROSS JOIN pks
    ), pr AS (
    SELECT vec_id, {proj_cols} FROM edp GROUP BY vec_id
    ), bk AS (
    SELECT vec_id, [{bucket_exprs}] AS bks FROM pr CROSS JOIN nv
    ), bkl AS (
    SELECT vec_id, CAST(t.i AS INT) AS tbl, bks[CAST(t.i AS INT)] AS bucket
    FROM bk CROSS JOIN range(1, {n_tables + 1}) t(i)
    ), qb AS (
    SELECT vec_id AS q_id, tbl,
    CASE WHEN t2.i = 0 THEN bucket
         ELSE xor(bucket, CAST(1 AS BIGINT) << (CAST(t2.i AS INT) - 1))
    END AS bucket
    FROM bkl CROSS JOIN range(0, {_BAND_PLANES_MAX + 1}) t2(i)
    CROSS JOIN nv
    WHERE vec_id % 100 = 0
      AND (t2.i = 0
           OR (nv.beff >= {_BAND_MULTIPROBE_MIN_B} AND t2.i <= nv.beff))
    ), cand AS (
    SELECT DISTINCT qb.q_id, c.vec_id AS neighbor_id
    FROM qb JOIN bkl c ON c.tbl = qb.tbl AND c.bucket = qb.bucket AND c.vec_id <> qb.q_id
    ), scored AS (
    SELECT cand.q_id, cand.neighbor_id,
    round(list_dot_product(q.v, n.v)
    / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 3) AS cos_sim
    FROM cand JOIN e q ON q.vec_id = cand.q_id JOIN e n ON n.vec_id = cand.neighbor_id
    ), ranked AS (
    SELECT q_id, neighbor_id, cos_sim,
    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
    )
    SELECT q_id, neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    ORDER BY q_id, cos_sim DESC, neighbor_id
    """


_BRUTE_ORACLE = """
    WITH q AS (
    SELECT vec_id AS q_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
    FROM embeddings WHERE vec_id % 100 = 0
    ), scored AS (
    SELECT q.q_id, e.vec_id AS neighbor_id,
    round(list_dot_product(q.qv, list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
    / (sqrt(list_dot_product(q.qv, q.qv))
    * sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
    list_transform(e.embedding, x -> CAST(x AS DOUBLE))))), 3) AS cos_sim
    FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    ), ranked AS (
    SELECT q_id, neighbor_id, cos_sim,
    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
    )
    SELECT q_id, neighbor_id, cos_sim FROM ranked WHERE rn <= 5
    ORDER BY q_id, cos_sim DESC, neighbor_id
    """


@query("similarity_brute_topk", oracle=_BRUTE_ORACLE)
def similarity_brute_topk(spark, sf_dir, *, k: int = 5):
    """Exact ANN baseline: broadcast the query set, score every corpus
    vector, keep top-k per query via window rank.

    The cosine is rounded to 3 decimals BEFORE ranking on both engines so
    float last-ulp differences cannot flip the top-k ordering.
    """
    t = tables(spark, sf_dir)
    emb = fan_out(t["embeddings"]).select(
        "vec_id", vec_double("embedding").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    scored = (
        F.broadcast(queries)
        .join(emb, F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 3).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
        .orderBy("q_id", F.desc("cos_sim"), "neighbor_id")
    )


def _topk_rerank(scored, k):
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
        .orderBy("q_id", F.desc("cos_sim"), "neighbor_id")
    )


@query("similarity_lsh_topk", oracle=_lsh_topk_oracle())
def similarity_lsh_topk(spark, sf_dir, *, k: int = 5):
    """Multi-table (banded) sign-LSH ANN — the shipped default since r6:
    L=12 tables of b=4 planes; a corpus vector is a candidate for a query
    if ALL 4 sign bits of ANY table agree; exact cosine re-rank on the
    deduplicated candidates.

    Why multi-table: the engine's own audit (similarity_ann_recall) proved
    the old 12-plane single-probe index recalls ~0 of the true top-5 on
    this corpus (match had to agree on all 12 bits; P ~ (1-theta/pi)^12 is
    tiny at these angles).  OR-ing L small tables is the standard fix — the
    exact banding trick the MinHash path already uses
    (dedup._lsh_candidates) — and lifts realized recall@5 to 0.84/0.85 at
    sf0.01/sf0.1 (seed-fixed simulation AND the live audit agree).  On this
    deliberately near-random corpus that recall costs a ~0.5 candidate
    fraction (see the config comment at the top of this module); on real
    encoder-embedding geometry the same L x b prunes orders of magnitude
    harder with recall to spare.

    Scale shape (unchanged from the single-table design, per stage):
    - signatures: ONE Arrow-vectorized numpy matmul per batch emits all 192
      projections and packs the 12 per-table 16-bit keys (functions.
      lsh_table_keys_udf) — pure map, no explode/shuffle of vectors;
    - the bucketed corpus is persisted: it IS the ANN index, probed by the
      query side instead of re-hashing the corpus;
    - candidates: posexplode the 12 keys (ids + ints only, never the
      vectors) and equi-join on (table, bucket) against the broadcast
      query buckets; dedup on (q_id, neighbor_id) — an id-pair shuffle;
    - re-rank: join the candidate id-pairs back onto the persisted corpus
      with NO broadcast hint (the candidate relation is unbounded; AQE
      broadcasts it at runtime when small, shuffles when not), join the
      tiny broadcast query vectors, score, per-query top-k window.

    Adaptive band width (r8): the index persists FULL 16-bit per-table
    keys and masks them down to b_eff bits at probe time, where b_eff is
    computed in-plan from the corpus count (see the config comment above
    _BAND_PLANES_MAX).  The r8 three-decade probe measured the fixed b=4
    band at 574 s / ~sf10 (bucket population = corpus/16 -> candidates
    linear in corpus, quadratic overall); with the adaptive band, bucket
    population is pinned at ~500 and the candidate relation scales with
    corpus x queries / buckets.  b_eff = 4 at every driver/test SF, where
    keys and results are byte-identical to the fixed-b index.

    The table/plane geometry (L=12 tables x up to 16 planes) is fixed by
    the module constants (_N_TABLES, _BAND_PLANES_MAX): since the r8
    adaptive band, the plane matrix, the oracle literals, and the
    byte-identity guarantee at driver SFs are all derived from that one
    layout, so the former per-call (planes_per_table, n_tables) kwargs —
    which the r8 index silently ignored — were removed (r8 advice).
    Change the constants (and with them the oracle) to re-tune; only k
    is a per-call knob."""
    t = tables(spark, sf_dir)
    # No fan_out: one vectorized matmul per Arrow batch (see single-probe
    # note below); scan partitioning carries cluster parallelism.
    emb = t["embeddings"].select("vec_id", vec_double("embedding").alias("v"))
    keys_of = lsh_table_keys_udf(_BAND_PLANE_ROWS, _BAND_PLANES_MAX, _N_TABLES)
    # The persisted index also carries each vector's norm (r10): the
    # re-rank evaluates O(candidates) cosines, and dot / (nq * nv) with
    # per-row norms is ONE array fold per candidate instead of three —
    # identical IEEE values (same folds, same operand order), measured
    # ~2x on the re-rank stage at the ~sf100 tier.
    corpus = track_persist(
        emb.select(
            "vec_id", "v", l2_norm(F.col("v")).alias("nv"),
            keys_of("v").alias("bks"),
        )
    )
    # b_eff from a 1-row count relation (band_width_col: exact integer
    # thresholds, the r9 ring-aware jump, and the r10 in-plan ring-budget
    # guard).  The crossJoin attaches to the exploded-key relation BELOW
    # the persisted corpus, so the index itself is count-independent (the
    # semdedup stats-placement lesson, r8).
    # counted off the persisted corpus (cache read), not a second scan
    nrel = corpus.agg(F.count(F.lit(1)).alias("n_vecs"))
    b_eff = band_width_col()
    # Persisted: the exploded, MASKED (vec_id, tbl, bucket) relation is the
    # probed index (ids + ints only, 12 x ~16 B per vector).  It has two
    # consumers (query extraction + probe side); without the persist each
    # re-ran the count aggregate, the broadcast build, and the mask — four
    # extra jobs whose fixed local-mode overhead measured ~0.8 s at sf0.1
    # (the bench caught it; at cluster scale the same duplication is two
    # corpus-wide map passes).
    blk = track_persist(
        corpus.select("vec_id", F.posexplode("bks").alias("tbl", "key16"))
        .crossJoin(F.broadcast(nrel))
        .withColumn("b_eff", b_eff.cast("int"))
        # shiftleft's numBits is column-typed only in SQL form
        .select(
            "vec_id",
            "tbl",
            F.expr("key16 & (shiftleft(1, b_eff) - 1)").alias("bucket"),
            "b_eff",
        )
    )
    # Query probe ring (r9): own bucket + (once b_eff >= 12) ALL b_eff
    # single-bit flips — full Hamming-1 multiprobe, see the config
    # comment above _BAND_MULTIPROBE_MIN_B.  Empty ring, hence the r8
    # single-probe form, whenever b_eff <= 11.  Probes are pairwise-
    # distinct per (query, table); the existing pair dedup already
    # collapses multi-table hits.
    qblk = (
        blk.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("tbl").alias("q_tbl"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {_BAND_PLANES_MAX}), "
                    "i -> CASE WHEN i = 0 THEN bucket "
                    "ELSE bucket ^ shiftleft(1, i - 1) END)"
                )
            ).alias("pi", "q_bucket"),
            "b_eff",
        )
        .filter(
            (F.col("pi") == 0)
            | (
                (F.col("b_eff") >= F.lit(_BAND_MULTIPROBE_MIN_B))
                & (F.col("pi") <= F.col("b_eff"))
            )
        )
        .select("q_id", "q_tbl", "q_bucket")
    )
    cand = (
        F.broadcast(qblk)
        .join(
            blk,
            (F.col("tbl") == F.col("q_tbl"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
        # Pin the re-rank's parallelism AND dedup through ONE exchange
        # (r14, guide §2.4): the keyed numbered repartition hash-
        # partitions the raw candidate pairs on exactly the dedup keys,
        # so the dropDuplicates aggregate on top reuses that partitioning
        # instead of adding its own Exchange — the r13 form paid a
        # dedup-aggregate exchange AND a round-robin repartition of the
        # same relation (two candidate-sized shuffles; at scale the
        # candidate stream is the operator's largest relation).  A
        # numbered repartition is exempt from AQE coalescing, so the
        # downstream cosine re-rank keeps its parallelism (the PPJoin
        # lesson, dedup.py); (q_id, neighbor_id) has ~|pairs| distinct
        # values, far above the partition count, so the hash spreads
        # evenly (§2.5).
        .repartition(
            spark.sparkContext.defaultParallelism, "q_id", "neighbor_id"
        )
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    qv = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    # cand is UNBOUNDED (~candidate-fraction x |corpus| x |query batch|,
    # quadratic in corpus size on this geometry) — no broadcast hint, or
    # the forced broadcast hits Spark's 8 GB hard limit / driver OOM at
    # scale (r6 advice).  AQE broadcasts it at runtime when small; the
    # bounded query-side relations (qblk, qv) keep their hints.
    scored = (
        cand
        .join(
            corpus.select(F.col("vec_id").alias("neighbor_id"), "v", "nv"),
            "neighbor_id",
        )
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 3
            ).alias("cos_sim"),
        )
    )
    return _topk_rerank(scored, k)


@query("similarity_lsh_single_probe", oracle=_lsh_single_probe_oracle())
def similarity_lsh_single_probe(
    spark, sf_dir, *, k: int = 5, n_planes: int = _SINGLE_PLANES
):
    """Single-table sign-LSH ANN (the pre-r6 default, kept as the recall
    audit's cautionary baseline): one 12-bit signature per vector,
    candidates from the single matching bucket only, exact cosine re-rank.
    On this corpus it recalls ~0 of the true top-5 — which is precisely
    what similarity_ann_recall now shows side-by-side against the banded
    default and IVF.

    Hyperplanes are a seed-fixed +-1 literal matrix (functions.
    lsh_plane_signs) shipped with the plan and embedded identically in the
    DuckDB oracle, so bucket assignment is verifiable cross-engine.
    Projections are rounded to 6 decimals before the sign test on BOTH
    engines so float summation order cannot flip a bucket bit.

    The signature is ONE Arrow-vectorized numpy matmul per batch
    (functions.lsh_bucket_udf) — a pure map over the corpus with no
    explode, no groupBy shuffle, and no join-back of buckets onto vectors.
    Two earlier JVM-side forms lost to brute force at sf0.1: 12 per-plane
    aggregate/zip_with lambdas (interpreted, 10x slower) and an exploded
    (vec_id, dim, x) agg (right compute, but 2 extra corpus shuffles).
    """
    t = tables(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", vec_double("embedding").alias("v"))
    bucket_of = lsh_bucket_udf(_PACKED_SIGNS, n_planes)
    corpus = track_persist(
        emb.select("vec_id", "v", bucket_of("v").alias("bucket"))
    )
    queries = corpus.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = F.broadcast(queries).join(
        corpus,
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("q_id")),
    )
    scored = cand.select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 3).alias("cos_sim"),
    )
    return _topk_rerank(scored, k)


def _ivf_oracle(k: int = 5) -> str:
    """DuckDB twin of the ADAPTIVE IVF (see the r9 config comment above
    _IVF_TARGET_CELL): same per-label centroid assignment, same 12 packed
    sub-bucket plane literals, sub = the s_eff low sign bits where
    s_eff = the count of exact integer thresholds 2000 * n_labels * 2^j
    (j = 0..11) the corpus size exceeds, and the query side probes its
    own sub-bucket plus the s_eff single-bit flips.  At s_eff = 0 (every
    driver/test SF) sub is 0 everywhere and this reduces exactly to the
    old fixed-cell oracle."""
    packed = ", ".join(str(v) for v in _IVF_SUB_PACKED)
    proj_cols = ",\n".join(
        f"round(SUM(x * (((pk >> {r}) & 1) * 2 - 1)), 6) AS proj{r}"
        for r in range(_IVF_SUB_BITS_MAX)
    )
    s_expr = " + ".join(
        f"(CASE WHEN n > {_IVF_TARGET_CELL} * nl * {1 << j} THEN 1 ELSE 0 END)"
        for j in range(_IVF_SUB_BITS_MAX)
    )
    sub_expr = " + ".join(
        f"(CASE WHEN {r} < nv.s AND proj{r} > 0 THEN {1 << r} ELSE 0 END)"
        for r in range(_IVF_SUB_BITS_MAX)
    )
    return f"""
    WITH e AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    ), nv AS (
    SELECT {s_expr} AS s
    FROM (SELECT count(*) AS n, count(DISTINCT label) AS nl FROM embeddings)
    ), bydim AS (
    SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e
    ), cent AS (
    SELECT label, i, avg(x) AS cx FROM bydim GROUP BY label, i
    ), centv AS (
    SELECT label AS cell, list(cx ORDER BY i) AS c FROM cent GROUP BY label
    ), scored_cells AS (
    SELECT e.vec_id, e.v, cv.cell,
    round(list_dot_product(e.v, cv.c)
    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv.c, cv.c))), 4) AS cell_sim,
    row_number() OVER (
    PARTITION BY e.vec_id
    ORDER BY round(list_dot_product(e.v, cv.c)
    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv.c, cv.c))), 4) DESC,
    cv.cell
    ) AS rn
    FROM e CROSS JOIN centv cv
    ), ed AS (
    SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM e
    ), edp AS (
    SELECT vec_id, x, ([{packed}])[pos] AS pk FROM ed
    ), pr AS (
    SELECT vec_id, {proj_cols} FROM edp GROUP BY vec_id
    ), sb AS (
    SELECT vec_id, ({sub_expr}) AS sub FROM pr CROSS JOIN nv
    ), assigned AS (
    SELECT s.vec_id, s.v, s.cell, sb.sub
    FROM scored_cells s JOIN sb USING (vec_id) WHERE s.rn = 1
    ), q AS (
    SELECT vec_id AS q_id, v AS qv, cell AS q_cell, sub FROM assigned
    WHERE vec_id % 100 = 0
    ), qp AS (
    SELECT q_id, qv, q_cell,
    CASE WHEN t.i = 0 THEN sub
         ELSE xor(sub, CAST(1 AS BIGINT) << (CAST(t.i AS INT) - 1)) END AS probe_sub
    FROM q CROSS JOIN range(0, {_IVF_SUB_BITS_MAX + 1}) t(i) CROSS JOIN nv
    WHERE t.i = 0 OR t.i <= nv.s
    ), scored AS (
    SELECT qp.q_id, a.vec_id AS neighbor_id,
    round(list_dot_product(qp.qv, a.v)
    / (sqrt(list_dot_product(qp.qv, qp.qv)) * sqrt(list_dot_product(a.v, a.v))), 3) AS cos_sim
    FROM qp JOIN assigned a
    ON a.cell = qp.q_cell AND a.sub = qp.probe_sub AND a.vec_id <> qp.q_id
    ), ranked AS (
    SELECT q_id, neighbor_id, cos_sim,
    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
    )
    SELECT q_id, neighbor_id, cos_sim FROM ranked WHERE rn <= {k}
    ORDER BY q_id, cos_sim DESC, neighbor_id
    """


@query("similarity_ivf_topk", oracle=_ivf_oracle())
def similarity_ivf_topk(spark, sf_dir, *, k: int = 5):
    """IVF-style ANN: train cells (per-label centroids, one distributed
    pass), assign every vector to its nearest cell, subdivide each cell
    by masked sign-LSH sub-buckets whose width grows with the corpus,
    then search the query's (cell, sub-bucket) — plus the s_eff
    single-bit-flip sub-buckets, Hamming-1 multiprobe — with an exact
    cosine re-rank.

    The cell list is tiny -> broadcast (one row of per-cell structs);
    assignment is MAP-ONLY since r11 — an array_max over per-cell
    (cell_sim, -cell) structs inside a projection, no join explosion, no
    shuffle (the pre-r11 form ran row_number over a Window partitioned
    by vec_id, which shuffled + sorted corpus x cells rows each carrying
    the full vector — ~15 GB at the 2M-vector tier); candidate search is
    an equi-join on (cell, sub).  Cell similarity is rounded to 4
    decimals (tie-broken by cell id) on BOTH engines so assignment is
    deterministic cross-engine; the argmax evaluates the identical
    sequential-fold dot in the identical operand order, so the rework is
    byte-identical (pinned vs the window form at sf0.1 at commit time).
    On nlist: see the adjudication comment above _IVF_TARGET_CELL — the
    candidate-binding cell count nlist_eff = n_labels * 2^s_eff is
    count-derived; only the O(n_labels) per-vector assignment cost rides
    on the coarse list, now a pure map.

    Adaptive cell refinement (r9): the old form searched the ENTIRE label
    cell, so per-query candidates were corpus/n_labels — linear in the
    corpus, the same fixed-parameter scale bug class the probe tiers
    caught in SemDeDup (r7 — fixed cells) and the banded index (r8 —
    fixed band width).  s_eff sub-bucket bits are computed in-plan from a
    1-row (count, n_labels) relation (see the config comment above
    _IVF_TARGET_CELL); per-cell population is pinned ~1000-2000 and the
    query side pays s_eff + 1 probes, so candidates/query stay ~bounded
    while recall is held by the Hamming-1 probe ring.  s_eff = 0 at every
    driver/test SF: sub is 0 everywhere, the probe ring is empty, and
    results are byte-identical to the fixed-cell form."""
    t = tables(spark, sf_dir)
    # Norms ride along from the first projection (r10): assignment folds
    # dot / (nv * cn) once per (vector, cell) and the re-rank once per
    # candidate — one fold each instead of three, identical IEEE values
    # (same folds, same operand order; the semdedup/banded-index change).
    # Persisted (r11): (vec_id, v, nv) feeds BOTH the assignment argmax
    # (via the broadcast cell crossJoin) and the join-back that attaches
    # the winning cell — without the persist the parquet scan, the
    # double-cast transform, and the norm fold all run twice.
    emb = track_persist(
        fan_out(t["embeddings"])
        .select("vec_id", vec_double("embedding").alias("v"))
        .withColumn("nv", l2_norm(F.col("v")))
    )
    by_dim = t["embeddings"].select(
        "label", F.posexplode(vec_double("embedding")).alias("i", "x")
    )
    centv = (
        by_dim.groupBy("label", "i")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda s: s.getField("cx")).alias("c"),
        )
        .withColumn("cn", l2_norm(F.col("c")))
    )
    # s_eff from a 1-row (n, n_labels) relation off the raw table (the
    # assignment relation below can't feed it — it is built FROM this):
    # exact integer thresholds, bit-identical on both engines.
    nrel = t["embeddings"].agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("label").alias("nl")
    )
    s_eff = ivf_sub_width_col()
    sub_keys = lsh_table_keys_udf(
        _IVF_SUB_PLANE_ROWS, _IVF_SUB_BITS_MAX, 1
    )
    cell_sim = F.round(
        dot(F.col("v"), F.col("c")) / (F.col("nv") * F.col("cn")), 4
    )
    # Assignment argmax over IDS + SIMS ONLY (r11): the broadcast
    # nested-loop join still evaluates one fold per (vector, cell) — the
    # unavoidable arithmetic — but the per-vector max now runs as
    # max(struct(cell_sim, -cell)) under a groupBy(vec_id), and the
    # winning cell joins back onto the corpus by vec_id.  The pre-r11
    # form ran row_number over a Window partitioned by vec_id ON THE
    # JOINED RELATION, shuffling + sorting n_vecs * n_cells rows EACH
    # CARRYING THE 96-double VECTOR (~15 GB at the 2M-vector tier); here
    # the aggregate's input rows are ~24 bytes, partial aggregation
    # collapses cells-per-vector to one row per vector BEFORE the
    # exchange, and only the corpus itself (once, not x cells) crosses
    # the wire for the join-back.  Byte-identical by construction: the
    # same sequential-fold dot in the same operand order, the same 4-dp
    # rounding, and max(cell_sim, -cell) == first of (cell_sim DESC,
    # cell ASC) — pinned vs the window form's full sf0.1 output at
    # commit time.
    choice = (
        emb.crossJoin(F.broadcast(centv))
        .select(
            "vec_id",
            F.struct(
                cell_sim.alias("cell_sim"), (-F.col("cell")).alias("neg_cell")
            ).alias("scored"),
        )
        .groupBy("vec_id")
        .agg(F.max("scored").alias("best"))
        .select("vec_id", (-F.col("best.neg_cell")).alias("cell"))
    )
    # Persisted: this IS the probed index — (ids, vector, cell, masked
    # sub) — with two consumers (query extraction + probe side), same
    # shape and rationale as the banded index's persisted corpus.
    assigned = track_persist(
        emb.join(choice, "vec_id")
        .withColumn("key12", sub_keys("v").getItem(0))
        .crossJoin(F.broadcast(nrel))
        .withColumn("s_eff", s_eff.cast("int"))
        .select(
            "vec_id",
            "v",
            "nv",
            "cell",
            F.expr("key12 & (shiftleft(1, s_eff) - 1)").alias("sub"),
            "s_eff",
        )
    )
    # Query probe ring: own sub-bucket + the s_eff single-bit flips.
    # Ids + ints only (the vectors join back after candidate generation,
    # the banded-index shape); probes are pairwise-distinct, so a corpus
    # vector matches a query through at most ONE probe — no pair dedup.
    qprobe = (
        assigned.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("cell").alias("q_cell"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {_IVF_SUB_BITS_MAX}), "
                    "i -> CASE WHEN i = 0 THEN sub "
                    "ELSE sub ^ shiftleft(1, i - 1) END)"
                )
            ).alias("pi", "probe_sub"),
            "s_eff",
        )
        .filter((F.col("pi") == 0) | (F.col("pi") <= F.col("s_eff")))
        .select("q_id", "q_cell", "probe_sub")
    )
    cand = (
        F.broadcast(qprobe)
        .join(
            assigned,
            (F.col("cell") == F.col("q_cell"))
            & (F.col("sub") == F.col("probe_sub"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
        # Pin the re-rank's parallelism: the id-pair relation is tiny in
        # BYTES, so AQE's byte-based coalescing would serialize the
        # downstream cosine re-rank onto ~1 partition (the banded-index
        # lesson); a numbered repartition is exempt.
        .repartition(spark.sparkContext.defaultParallelism)
    )
    qv = assigned.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    # cand is unbounded — no broadcast hint (AQE decides at runtime).
    scored = (
        cand.join(
            assigned.select(F.col("vec_id").alias("neighbor_id"), "v", "nv"),
            "neighbor_id",
        )
        .join(F.broadcast(qv), "q_id")
        .select(
            "q_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 3
            ).alias("cos_sim"),
        )
    )
    return _topk_rerank(scored, k)


@query(
    "similarity_ivf_multiprobe",
    oracle="""
    WITH e AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    ), bydim AS (
    SELECT label, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM e
    ), cent AS (
    SELECT label, i, avg(x) AS cx FROM bydim GROUP BY label, i
    ), centv AS (
    SELECT label AS cell, list(cx ORDER BY i) AS c FROM cent GROUP BY label
    ), scored_cells AS (
    SELECT e.vec_id, e.v, cv.cell,
    row_number() OVER (
    PARTITION BY e.vec_id
    ORDER BY round(list_dot_product(e.v, cv.c)
    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv.c, cv.c))), 4) DESC,
    cv.cell
    ) AS rn
    FROM e CROSS JOIN centv cv
    ), assigned AS (
    SELECT vec_id, v, cell FROM scored_cells WHERE rn = 1
    ), q AS (
    SELECT vec_id AS q_id, v AS qv, cell AS probe_cell
    FROM scored_cells WHERE vec_id % 100 = 0 AND rn <= 2
    ), scored AS (
    SELECT q.q_id, a.vec_id AS neighbor_id,
    round(list_dot_product(q.qv, a.v)
    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))), 3) AS cos_sim
    FROM q JOIN assigned a ON a.cell = q.probe_cell AND a.vec_id <> q.q_id
    ), ranked AS (
    SELECT q_id, neighbor_id, cos_sim,
    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
    )
    SELECT q_id, neighbor_id, cos_sim FROM ranked WHERE rn <= 5
    ORDER BY q_id, cos_sim DESC, neighbor_id
    """,
)
def similarity_ivf_multiprobe(spark, sf_dir, *, k: int = 5, nprobe: int = 2):
    """IVF ANN with multi-probe: the corpus stays single-cell-assigned, but
    each QUERY searches its ``nprobe`` nearest cells — the standard recall
    lever for IVF (a query near a cell boundary finds neighbors across it)
    at ``nprobe``x the candidate cost, still an equi-join on the cell key.

    This variant demonstrates CENTROID-level multiprobe over the fixed
    per-label cells and is deliberately kept in that form as the teaching
    twin; the PRODUCTION scale path is similarity_ivf_topk, whose r9
    adaptive sub-bucket refinement (in-plan cell-width growth + Hamming-1
    sub-bucket probing) bounds per-query candidates as the corpus grows —
    searching nprobe whole label cells here is nprobe x corpus/n_labels
    candidates, linear in the corpus, which is why this variant sits in
    no scaling-probe tier."""
    from pyspark.sql.window import Window

    t = tables(spark, sf_dir)
    emb = fan_out(t["embeddings"]).select("vec_id", vec_double("embedding").alias("v"))
    by_dim = t["embeddings"].select(
        "label", F.posexplode(vec_double("embedding")).alias("i", "x")
    )
    centv = (
        by_dim.groupBy("label", "i")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select(
            F.col("label").alias("cell"),
            F.transform("pairs", lambda s: s.getField("cx")).alias("c"),
        )
    )
    cell_sim = F.round(cosine(F.col("v"), F.col("c")), 4)
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cell_sim"), F.asc("cell"))
    scored_cells = (
        emb.crossJoin(F.broadcast(centv))
        .select("vec_id", "v", "cell", cell_sim.alias("cell_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assigned = scored_cells.filter(F.col("rn") == 1).select("vec_id", "v", "cell")
    probes = (
        scored_cells.filter(
            (F.col("vec_id") % 100 == 0) & (F.col("rn") <= nprobe)
        )
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("cell").alias("probe_cell"),
        )
    )
    scored = (
        F.broadcast(probes)
        .join(
            assigned,
            (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 3).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
        .orderBy("q_id", F.desc("cos_sim"), "neighbor_id")
    )


def _ann_recall_oracle() -> str:
    """SQL mirror of similarity_ann_recall: the brute-force ground truth
    left-joined against each index's top-k picks, all four oracles nested
    as subqueries."""
    return f"""
    WITH brute AS (
    SELECT * FROM ({_BRUTE_ORACLE})
    ), lsh AS (
    SELECT * FROM ({_lsh_topk_oracle()})
    ), lsh1 AS (
    SELECT * FROM ({_lsh_single_probe_oracle()})
    ), ivf AS (
    SELECT * FROM ({_ivf_oracle()})
    )
    SELECT b.q_id,
    CAST(count(*) AS BIGINT) AS n_true,
    CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lsh_hit,
    round(CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) AS lsh_recall,
    CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lsh_single_hit,
    round(CAST(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) AS lsh_single_recall,
    CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivf_hit,
    round(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) AS ivf_recall
    FROM brute b
    LEFT JOIN lsh l ON b.q_id = l.q_id AND b.neighbor_id = l.neighbor_id
    LEFT JOIN lsh1 s ON b.q_id = s.q_id AND b.neighbor_id = s.neighbor_id
    LEFT JOIN ivf i ON b.q_id = i.q_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.q_id
    ORDER BY b.q_id
    """


@query("similarity_ann_recall", oracle=_ann_recall_oracle())
def similarity_ann_recall(spark, sf_dir, *, k: int = 5):
    """ANN-quality audit: per-query recall@k of the approximate indexes
    (banded sign-LSH — the shipped default, the old single-probe sign-LSH,
    and IVF cells) against the brute-force ground truth — the
    similarity-side twin of dedup_minhash_error, and the measurement that
    picks the index and its parameters before a 100 TB corpus runs on an
    approximate path only.

    The r5 run of this audit was decisive and drove the r6 index change:
    the 12-plane single-probe config recalls ~0 of the true top-5 (match
    needs all 12 sign bits; P ~ (1-theta/pi)^12 is tiny at these angles)
    and IVF cells ~0.36, while the banded 12x4 default now recalls ~0.84 —
    the audit keeps all three side-by-side so a config regression is
    immediately visible.

    Ground truth and index results are all deterministic (cosine rounded
    to 3 decimals before ranking, ties broken by neighbor_id on both
    engines), so recall itself is deterministic.  Cost shape: the four
    underlying pipelines as-is — the brute pass is the expensive leg and
    is exactly what a recall audit pays on a SAMPLE of queries at scale —
    plus three joins on the tiny (query, neighbor) result sets."""
    truth = similarity_brute_topk(spark, sf_dir, k=k)
    lsh = similarity_lsh_topk(spark, sf_dir, k=k).select(
        F.col("q_id").alias("l_q_id"),
        F.col("neighbor_id").alias("l_neighbor_id"),
    )
    lsh1 = similarity_lsh_single_probe(spark, sf_dir, k=k).select(
        F.col("q_id").alias("s_q_id"),
        F.col("neighbor_id").alias("s_neighbor_id"),
    )
    ivf = similarity_ivf_topk(spark, sf_dir, k=k).select(
        F.col("q_id").alias("i_q_id"),
        F.col("neighbor_id").alias("i_neighbor_id"),
    )
    lsh_hit = F.sum(F.when(F.col("l_neighbor_id").isNotNull(), 1).otherwise(0))
    lsh1_hit = F.sum(F.when(F.col("s_neighbor_id").isNotNull(), 1).otherwise(0))
    ivf_hit = F.sum(F.when(F.col("i_neighbor_id").isNotNull(), 1).otherwise(0))
    n_true = F.count(F.lit(1))
    return (
        truth.join(
            lsh,
            (F.col("q_id") == F.col("l_q_id"))
            & (F.col("neighbor_id") == F.col("l_neighbor_id")),
            "left",
        )
        .join(
            lsh1,
            (F.col("q_id") == F.col("s_q_id"))
            & (F.col("neighbor_id") == F.col("s_neighbor_id")),
            "left",
        )
        .join(
            ivf,
            (F.col("q_id") == F.col("i_q_id"))
            & (F.col("neighbor_id") == F.col("i_neighbor_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            n_true.alias("n_true"),
            lsh_hit.alias("lsh_hit"),
            F.round(lsh_hit.cast("double") / n_true, 4).alias("lsh_recall"),
            lsh1_hit.alias("lsh_single_hit"),
            F.round(lsh1_hit.cast("double") / n_true, 4).alias("lsh_single_recall"),
            ivf_hit.alias("ivf_hit"),
            F.round(ivf_hit.cast("double") / n_true, 4).alias("ivf_recall"),
        )
        .orderBy("q_id")
    )


@query(
    "embedding_norm_stats",
    oracle="""
    SELECT label,
    CAST(count(*) AS BIGINT) AS n_vecs,
    round(avg(sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
    list_transform(embedding, x -> CAST(x AS DOUBLE))))), 4) AS avg_norm,
    round(avg(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))), 4) AS avg_component_sum
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_norm_stats(spark, sf_dir):
    """Vector-column hygiene stats per label (norms, component sums)."""
    t = tables(spark, sf_dir)
    v = vec_double("embedding")
    return (
        t["embeddings"]
        .select(
            "label",
            l2_norm(v).alias("norm"),
            F.aggregate(v, F.lit(0.0), lambda a, x: a + x).alias("csum"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.avg("csum"), 4).alias("avg_component_sum"),
        )
        .orderBy("label")
    )


@query(
    "embedding_centroid_distance",
    oracle="""
    WITH bydim AS (
    SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i
    FROM embeddings
    ), cent AS (
    SELECT label, i, avg(CAST(x AS DOUBLE)) AS cx FROM bydim GROUP BY label, i
    ), centv AS (
    SELECT label, list(cx ORDER BY i) AS c FROM cent GROUP BY label
    )
    SELECT e.label, CAST(count(*) AS BIGINT) AS n,
    round(avg(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.c)), 3) AS avg_dot_centroid
    FROM embeddings e JOIN centv c ON e.label = c.label
    GROUP BY e.label
    ORDER BY e.label
    """,
)
def embedding_centroid_distance(spark, sf_dir):
    """Per-label centroid, then mean dot(vector, centroid) — the building
    block of IVF-style partitioned ANN (assign -> search nearest cells)."""
    t = tables(spark, sf_dir)
    emb = t["embeddings"].select("label", "vec_id", vec_double("embedding").alias("v"))
    by_dim = emb.select(
        "label", "vec_id", F.posexplode("v").alias("dim", "x")
    )
    cent = (
        by_dim.groupBy("label", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "cx"))
            ).alias("pairs")
        )
        .select(
            "label", F.transform("pairs", lambda s: s.getField("cx")).alias("c")
        )
    )
    joined = emb.join(F.broadcast(cent), "label")
    return (
        joined.select("label", dot(F.col("v"), F.col("c")).alias("d"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("d"), 3).alias("avg_dot_centroid"),
        )
        .orderBy("label")
    )


@query(
    "embedding_int8_quantize",
    oracle="""
    WITH v AS (
    SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    ), bydim AS (
    SELECT unnest(v) AS x, generate_subscripts(v, 1) AS i FROM v
    ), mm0 AS (
    SELECT i, min(x) AS mn, max(x) AS mx FROM bydim GROUP BY i
    ), mm AS (
    SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM mm0
    ), q AS (
    SELECT vec_id, label, v,
    list_transform(range(1, len(v) + 1), i -> CASE WHEN mm.mx[i] > mm.mn[i]
    THEN mm.mn[i] + round((v[i] - mm.mn[i]) / (mm.mx[i] - mm.mn[i]) * 254.0)
         * (mm.mx[i] - mm.mn[i]) / 254.0
    ELSE v[i] END) AS xq
    FROM v, mm
    ), perv AS (
    SELECT label,
    list_sum(list_transform(range(1, len(v) + 1), i -> (v[i] - xq[i]) * (v[i] - xq[i])))
      / len(v) AS mse,
    list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * xq[i]))
      / (sqrt(list_sum(list_transform(v, x -> x * x)))
         * sqrt(list_sum(list_transform(xq, x -> x * x)))) AS cos
    FROM q
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
    round(avg(mse), 8) AS avg_mse,
    round(avg(cos), 6) AS avg_cos,
    round(min(cos), 6) AS min_cos
    FROM perv GROUP BY label ORDER BY label
    """,
)
def embedding_int8_quantize(spark, sf_dir):
    """Int8 scalar quantization audit for the embedding column: per-dim
    global [min, max] ranges, symmetric 255-level quantization (the stored
    code is round((x-mn)/(mx-mn)*254) - 127, an int8), and the fidelity
    report per label — reconstruction MSE and original-vs-dequantized
    cosine.  This is the compression step a 100 TB ANN index takes before
    the IVF/LSH operators here run over it (4x less I/O and memory per
    vector); the audit quantifies what recall that costs.

    Shape at 100 TB: the per-dim range relation is ONE map-side-combinable
    aggregate collapsing to a single row of two fixed-length arrays (dim
    entries — KBs regardless of corpus size), recombined via the same
    bounded 1-row crossJoin pattern as the semdedup corpus-stats relation;
    quantize + error are pure per-row array expressions (zip_with/
    aggregate folds in array order, matching DuckDB's list fold order);
    the only shuffles are the dim-range aggregate and the final per-label
    rollup.  For a production run you'd swap global min/max for clipped
    quantiles; min/max keeps the oracle exact.
    """
    t = tables(spark, sf_dir)
    emb = t["embeddings"].select("label", "vec_id", vec_double("embedding").alias("v"))
    mm = (
        emb.select(F.posexplode("v").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("p"))
        .select(
            F.transform("p", lambda s: s.getField("mn")).alias("mn"),
            F.transform("p", lambda s: s.getField("mx")).alias("mx"),
        )
    )

    def el(name, i):
        return F.element_at(F.col(name), i + F.lit(1))

    xq = F.transform(
        "v",
        lambda x, i: F.when(
            el("mx", i) > el("mn", i),
            el("mn", i)
            + F.round((x - el("mn", i)) / (el("mx", i) - el("mn", i)) * F.lit(254.0))
            * (el("mx", i) - el("mn", i))
            / F.lit(254.0),
        ).otherwise(x),
    )
    q = emb.crossJoin(mm).select("label", "vec_id", "v", xq.alias("xq"))
    err2 = F.aggregate(
        F.zip_with("v", "xq", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    perv = q.select(
        "label",
        (err2 / F.size("v")).alias("mse"),
        cosine(F.col("v"), F.col("xq")).alias("cos"),
    )
    return (
        perv.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("mse"), 8).alias("avg_mse"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
            F.round(F.min("cos"), 6).alias("min_cos"),
        )
        .orderBy("label")
    )


_KM_K = 4  # clusters
_KM_ITERS = 2  # Lloyd update rounds (unrolled; final assignment follows)
_KM_DIM = 64  # embedding dimensionality (constant across SFs)


def _kmeans_oracle(k: int = _KM_K, iters: int = _KM_ITERS, dim: int = _KM_DIM) -> str:
    """Unrolled-SQL mirror of embedding_kmeans_train: same init, same
    per-round 6-dp centroid rounding, same distance rounding and
    cluster-id tie-break, so assignments are identical cross-engine."""
    dist = (
        f"round(list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (e.v[i]-c.c[i])*(e.v[i]-c.c[i]))), 6)"
    )
    parts = [
        f"""WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    ), c0 AS (
    SELECT CAST(vec_id AS BIGINT) AS cluster,
    list_transform(v, x -> round(x, 6)) AS c
    FROM emb WHERE vec_id < {k}
    )"""
    ]
    for r in range(iters + 1):
        parts.append(f""", d{r} AS (
    SELECT e.vec_id, e.v, c.cluster, {dist} AS dist
    FROM emb e CROSS JOIN c{r} c
    ), a{r} AS (
    SELECT vec_id, v, cluster, dist,
    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster) AS rn
    FROM d{r}
    ), m{r} AS (SELECT vec_id, v, cluster, dist FROM a{r} WHERE rn = 1)""")
        if r < iters:
            parts.append(f""", x{r} AS (
    SELECT cluster, r.i, round(avg(v[r.i]), 6) AS cx
    FROM m{r} CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY cluster, r.i
    ), c{r + 1} AS (
    SELECT cluster, array_agg(cx ORDER BY i) AS c FROM x{r} GROUP BY cluster
    )""")
    parts.append(f"""
    SELECT m.cluster, CAST(count(*) AS BIGINT) AS n_members,
    round(sum(m.dist), 2) AS inertia,
    round(sqrt(list_sum(list_transform(c.c, x -> x*x))), 4) AS centroid_norm
    FROM m{iters} m JOIN c{iters} c ON m.cluster = c.cluster
    GROUP BY m.cluster, c.c
    ORDER BY m.cluster""")
    return "".join(parts)


@query("embedding_kmeans_train", oracle=_kmeans_oracle())
def embedding_kmeans_train(
    spark, sf_dir, *, k: int = _KM_K, iters: int = _KM_ITERS
):
    """Lloyd's k-means over the embedding corpus — the cluster-training
    stage behind SemDeDup-style pruning and IVF index building, run as a
    fixed number of unrolled distributed rounds.

    Per round (classic scalable k-means, the MLlib plan shape rebuilt on
    DataFrames): broadcast the k-row centroid relation, assign each vector
    to its nearest centroid (codegen'd fold over the 64-dim arrays — one
    corpus scan, NO shuffle of the corpus), then recompute centroids with
    a per-(cluster, dim) map-side-combined average — the only shuffle, k x
    dim rows wide.  At 100 TB: assignment cost is linear per round,
    centroid state is KB-sized, and rounds compose as a constant-depth
    plan (no driver-side collect — the centroid relation stays a
    DataFrame; determinism comes from 6-dp rounding of centroids and
    distances each round, identical in the oracle).

    Init = the first k vectors by vec_id (deterministic, same on both
    engines).  Output: per-cluster membership count, inertia, and centroid
    norm after the final assignment."""
    t = tables(spark, sf_dir)
    emb = fan_out(t["embeddings"]).select(
        "vec_id", vec_double("embedding").alias("v")
    )
    cent = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"),
        F.transform("v", lambda x: F.round(x, 6)).alias("c"),
    )

    def sqdist(vcol, ccol):
        return F.round(
            F.aggregate(
                F.zip_with(vcol, ccol, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )

    assigned = None
    for r in range(iters + 1):
        # ALL k centroids as one broadcast row; assignment is a pure map:
        # per vector, distances to the k centroids and an inline argmin via
        # array_min over (dist, cluster) structs — same (dist, cluster)
        # tie-break as the oracle's row_number, but with NO k-x-corpus
        # explode and NO per-round shuffle of the corpus.
        cent_row = cent.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("cluster", "c"))).alias("cents")
        )
        best = F.array_min(
            F.transform(
                F.col("cents"),
                lambda cc: F.struct(
                    sqdist(F.col("v"), cc.getField("c")).alias("dist"),
                    cc.getField("cluster").alias("cluster"),
                ),
            )
        )
        assigned = (
            emb.crossJoin(F.broadcast(cent_row))
            .withColumn("best", best)
            .select(
                "vec_id",
                "v",
                F.col("best.cluster").alias("cluster"),
                F.col("best.dist").alias("dist"),
            )
        )
        if r < iters:
            cent = (
                assigned.select("cluster", F.posexplode("v").alias("p", "x"))
                .groupBy("cluster", "p")
                .agg(F.round(F.avg("x"), 6).alias("cx"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("p", "cx"))).alias("ps"))
                .select(
                    "cluster",
                    F.transform("ps", lambda s: s.getField("cx")).alias("c"),
                )
            )
    norm = F.round(
        F.sqrt(F.aggregate(F.col("c"), F.lit(0.0), lambda a, x: a + x * x)), 4
    )
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_members"), F.round(F.sum("dist"), 2).alias("inertia"))
        .join(cent, "cluster")
        .select("cluster", "n_members", "inertia", norm.alias("centroid_norm"))
        .orderBy("cluster")
    )


_PI_ITERS = 2  # power-iteration rounds (unrolled)


def _power_iteration_oracle(iters: int = _PI_ITERS, dim: int = _KM_DIM) -> str:
    """Unrolled-SQL mirror of embedding_power_iteration: same uniform init,
    same per-round 6-dp rounding of the un-normalized iterate, so the
    normalized direction is identical cross-engine."""
    x0 = f"round(1.0 / sqrt({dim}), 6)"
    parts = [
        f"""WITH emb AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    ), x0 AS (
    SELECT list_transform(range(1, {dim + 1}), i -> {x0}) AS x
    )"""
    ]
    for r in range(iters):
        parts.append(f""", y{r} AS (
    SELECT e.vec_id, e.v,
    list_sum(list_transform(range(1, {dim + 1}), i -> e.v[i] * x.x[i])) AS y
    FROM emb e CROSS JOIN x{r} x
    ), zc{r} AS (
    SELECT r.i, round(sum(v[r.i] * y), 6) AS z
    FROM y{r} CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY r.i
    ), z{r} AS (
    SELECT array_agg(z ORDER BY i) AS z FROM zc{r}
    ), x{r + 1} AS (
    SELECT list_transform(z, e -> round(e / sqrt(list_sum(list_transform(z, w -> w*w))), 6)) AS x,
    round(sqrt(list_sum(list_transform(z, w -> w*w))), 2) AS eigval
    FROM z{r}
    )""")
    parts.append(f"""
    SELECT CAST(r.i - 1 AS BIGINT) AS dim, x.x[r.i] AS loading, x.eigval
    FROM x{iters} x CROSS JOIN range(1, {dim + 1}) r(i)
    ORDER BY dim""")
    return "".join(parts)


@query("embedding_power_iteration", oracle=_power_iteration_oracle())
def embedding_power_iteration(spark, sf_dir, *, iters: int = _PI_ITERS):
    """Top principal direction of the (uncentered) embedding Gram matrix by
    distributed power iteration — the whitening/top-component pass an
    embedding-curation pipeline runs before spectral filtering or index
    rotation.

    The d x d Gram matrix is NEVER materialized: each round computes
    y = X.x (one codegen'd fold per row against the broadcast 1-row
    direction — a corpus scan, no shuffle) and then z = X'.y (posexplode
    with the row weight, ONE map-side-combined sum per dimension — the
    only shuffle, d rows wide).  Cost per round is linear in rows x dim at
    any corpus size; direction state is a single d-vector DataFrame, no
    driver-side collect.  Cross-engine determinism: the un-normalized
    iterate is rounded to 6 dp each round before normalizing (sum-order
    noise is ~1e-12, far below the rounding grain).

    Output: the final unit direction (dim, loading) with the eigenvalue
    estimate ||X'X x|| carried per row."""
    t = tables(spark, sf_dir)
    emb = fan_out(t["embeddings"]).select(
        "vec_id", vec_double("embedding").alias("v")
    )
    dim = _KM_DIM
    xdf = spark.range(1).select(
        F.array([F.round(F.lit(1.0 / dim**0.5), 6) for _ in range(dim)]).alias("x")
    )
    for _ in range(iters):
        y = emb.crossJoin(F.broadcast(xdf)).select(
            "v",
            F.aggregate(
                F.zip_with(F.col("v"), F.col("x"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ).alias("y"),
        )
        zc = (
            y.select(F.posexplode("v").alias("p", "vx"), "y")
            .groupBy("p")
            .agg(F.round(F.sum(F.col("vx") * F.col("y")), 6).alias("z"))
        )
        zdf = zc.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("p", "z"))).alias("ps")
        ).select(F.transform("ps", lambda s: s.getField("z")).alias("z"))
        norm = F.sqrt(
            F.aggregate(F.col("z"), F.lit(0.0), lambda a, w: a + w * w)
        )
        xdf = zdf.select(
            F.transform("z", lambda e: F.round(e / norm, 6)).alias("x"),
            F.round(norm, 2).alias("eigval"),
        )
    return (
        xdf.select(F.posexplode("x").alias("p", "loading"), "eigval")
        .select(F.col("p").cast("bigint").alias("dim"), "loading", "eigval")
        .orderBy("dim")
    )
