"""Gates for SemDeDup's r10 masked-bits sub-bucket refinement.

r9 verdict item 1: the r8 mod-fold refinement capped its sub-bucket count
at 1024 = 2^10 (the plane count WAS the cap), and the sf100 tier measured
n_sub ~800 of it — one decade of headroom before per-cell density went
linear again.  The r10 form subdivides each cell by the low s_eff bits of
a 16-plane signature, with s_eff an in-plan indicator sum over exact
integer thresholds (the b_eff recipe).  These tests pin the three claims
that rework rests on:

1. the refinement is INERT at every driver SF (s_eff = 0, output
   byte-identical to a plain per-label SemDeDup with no sub machinery);
2. the formula pins per-(cell, sub) population inside a constant band
   across its whole 2^16 range — the property that keeps intra-cell pair
   work bounded at any corpus size;
3. near-duplicate pairs at the scaling corpus's perturbation scale still
   land in the same sub-bucket at a usable rate at the FIRST width the
   old cap could not express (s_eff = 11, selected above 2.56M vectors)
   — the recall side of the widening, measured not assumed.
"""

import numpy as np
import pyarrow.parquet as pq

from datafusion_dynamic_filter_spark import registry
from datafusion_dynamic_filter_spark.operators.dedup import (
    _SEM_SUB_PLANES,
    _SEM_TARGET_CELL,
)

registry.load_all()

SF_DIR = "/root/testdata/sf0.01"


def _s_eff(n_vecs: int, n_cells: int) -> int:
    """Python mirror of the in-plan indicator sum (and of the oracle's
    _sem_s_eff_sql) — kept inline so a formula change must touch the test."""
    return sum(
        n_vecs > _SEM_TARGET_CELL * n_cells * (1 << j)
        for j in range(_SEM_SUB_PLANES)
    )


# Plain per-label SemDeDup with NO sub-bucket machinery at all — an
# independent twin (not the generated oracle, which carries the s_eff
# CTEs).  Byte-equality of the registered query against this at a driver
# SF is the literal meaning of "the refinement is inert where s_eff = 0".
_PLAIN_SQL = """
WITH v AS (
SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), bydim AS (
SELECT label, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS i FROM embeddings
), cent AS (
SELECT label AS cell, i, avg(CAST(x AS DOUBLE)) AS cx FROM bydim GROUP BY label, i
), centv AS (
SELECT cell, list(cx ORDER BY i) AS c FROM cent GROUP BY cell
), scored AS (
SELECT v.vec_id, v.v, cv.cell,
round(list_dot_product(v.v, cv.c)
/ (sqrt(list_dot_product(v.v, v.v)) * sqrt(list_dot_product(cv.c, cv.c))), 4) AS cc
FROM v CROSS JOIN centv cv
), assigned AS (
SELECT t.vec_id, t.cell, t.cc, t.v FROM (
SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cc DESC, cell) AS rn
FROM scored) t WHERE t.rn = 1
), pairs AS (
SELECT a.cell AS cell, a.vec_id AS va, b.vec_id AS vb, a.cc AS cca, b.cc AS ccb,
round(list_dot_product(a.v, b.v)
/ (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cs
FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
), drops AS (
SELECT DISTINCT cell,
CASE WHEN cca > ccb OR (cca = ccb AND va > vb) THEN va ELSE vb END AS vec_id
FROM pairs WHERE cs >= 0.3
)
SELECT d.cell AS cell, d.vec_id AS vec_id, a.cc AS centroid_cos
FROM drops d JOIN assigned a ON d.vec_id = a.vec_id
ORDER BY cell, vec_id
"""


def test_refinement_inert_at_driver_sfs(spark):
    import duckdb

    tbl = pq.read_table(SF_DIR + "/embeddings.parquet")
    n_vecs = tbl.num_rows
    n_cells = len(set(tbl.column("label").to_pylist()))
    assert _s_eff(n_vecs, n_cells) == 0, (n_vecs, n_cells)

    got = sorted(
        tuple(r)
        for r in registry.QUERIES["dedup_semdedup"](spark, SF_DIR).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(_PLAIN_SQL).fetchall())
    assert got == want
    assert len(got) > 0


def test_population_pinned_across_full_range():
    """For every corpus size up to the formula's saturation point, the
    expected per-(cell, sub) population n / (n_cells * 2^s_eff) must stay
    inside [_SEM_TARGET_CELL/2, _SEM_TARGET_CELL] — the bounded-pair-work
    invariant.  Checked at threshold boundaries (+-1) and log-spaced
    points; below the first threshold s_eff = 0 by construction."""
    n_cells = 10
    first = _SEM_TARGET_CELL * n_cells
    sat = first * (1 << _SEM_SUB_PLANES)  # ~164M at 10 cells
    points = {first, first + 1}
    for j in range(_SEM_SUB_PLANES):
        t = first * (1 << j)
        points.update((t - 1, t, t + 1))
    points.update(int(first * 1.37 * (1 << j)) for j in range(_SEM_SUB_PLANES))
    for n in sorted(points):
        s = _s_eff(n, n_cells)
        if n <= first:
            assert s == 0, (n, s)
            continue
        assert 0 < s <= _SEM_SUB_PLANES
        if s < _SEM_SUB_PLANES:  # below saturation the band must hold
            pop = n / (n_cells * (1 << s))
            assert _SEM_TARGET_CELL / 2 <= pop <= _SEM_TARGET_CELL, (n, s, pop)
    # the documented headroom: saturation is two decades past the sf100
    # tier's 2M vectors
    assert sat >= 100 * 2_000_000 * 0.8, sat


def test_sub_budget_guard_fires_at_boundary(spark):
    """r10: the enforcement half of the derived cap — the width formula
    saturates at _SEM_TARGET_CELL * n_cells * 2^_SEM_SUB_PLANES vectors,
    past which per-(cell, sub) density grows linearly and intra-cell
    pair work returns to quadratic.  _sem_sub_width_col raises in-plan
    at that boundary; driven here at both sides with a literal
    (n_vecs, n_cells) relation."""
    import pytest
    from pyspark.sql import functions as F

    from datafusion_dynamic_filter_spark.operators.dedup import (
        _sem_sub_width_col,
    )

    def width_at(n, nc=10):
        return (
            spark.range(1)
            .select(
                F.lit(n).cast("long").alias("n_vecs"),
                F.lit(nc).cast("long").alias("n_cells"),
            )
            .select(_sem_sub_width_col().alias("s"))
            .collect()[0].s
        )

    bound = 10 * _SEM_TARGET_CELL * (1 << _SEM_SUB_PLANES)
    assert width_at(bound) == _SEM_SUB_PLANES
    assert width_at(10 * _SEM_TARGET_CELL) == 0  # driver-SF regime
    assert width_at(10 * _SEM_TARGET_CELL * (1 << 10) + 1) == 11
    with pytest.raises(Exception, match="refinement budget"):
        width_at(bound + 1)


def test_masked_bits_agreement_floor_at_first_new_width():
    """Recall floor at the first width the old 1024 cap could not
    express: s_eff = 11 (selected above 2500 * 2^10 = 2.56M vectors at 10
    labels).  Near-dup pairs are built exactly the way the scaling corpus
    builds them — two independent +-0.05/component perturbations of the
    same real sf0.01 embedding — and their 16-bit signatures computed
    under the operator's exact contract (seed-fixed lsh_plane_signs
    rows, 6-dp half-away-from-zero rounding before the sign test).

    Measured at commit time: per-bit agreement p = 0.901 (pair cosine
    ~0.95), same-sub-bucket fraction 0.320 at s_eff = 11 — within 2% of
    the p^11 independence model, so the floor below is a real margin,
    not a boundary.  The trade is the one SemDeDup already makes at
    k-means granularity (and the old mod-fold paid ~p^10 ~ 0.36 at its
    cap); detection never degrades further per decade than one extra
    bit's p."""
    from datafusion_dynamic_filter_spark.functions import lsh_plane_signs

    n_at_density = _SEM_TARGET_CELL * 10 * (1 << 10) + 1
    assert _s_eff(n_at_density, 10) == 11

    base = np.array(
        pq.read_table(SF_DIR + "/embeddings.parquet")
        .column("embedding")
        .to_pylist(),
        dtype=np.float64,
    )
    planes = np.array(lsh_plane_signs(_SEM_SUB_PLANES), dtype=np.float64)
    signs = np.where(planes > 0, 1.0, -1.0)[:, : base.shape[1]]
    rng = np.random.default_rng(20260816)
    reps = 40
    shape = (len(base) * reps, base.shape[1])
    a = np.repeat(base, reps, axis=0) + rng.uniform(-0.05, 0.05, size=shape)
    b = np.repeat(base, reps, axis=0) + rng.uniform(-0.05, 0.05, size=shape)

    def sig(x):
        raw = x @ signs.T
        proj = np.trunc(raw * 1e6 + np.copysign(0.5, raw)) / 1e6
        return (proj > 0).astype(np.int64) @ (
            1 << np.arange(_SEM_SUB_PLANES)
        )

    sa, sb = sig(a), sig(b)
    per_bit = np.mean(
        [((sa >> p) & 1) == ((sb >> p) & 1) for p in range(_SEM_SUB_PLANES)]
    )
    assert per_bit >= 0.88, float(per_bit)  # plane/rounding drift guard
    mask = (1 << 11) - 1
    same_sub = float(np.mean((sa & mask) == (sb & mask)))
    assert same_sub >= 0.25, same_sub
