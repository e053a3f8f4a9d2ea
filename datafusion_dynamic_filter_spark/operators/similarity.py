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
    l2_norm,
    lsh_bucket_udf,
    lsh_plane_signs,
    vec_double,
)
from ..registry import query, tables, track_persist

_N_PLANES = 12
_PLANES = lsh_plane_signs(_N_PLANES)  # deterministic +-1 matrix, seed-fixed
# The 12 plane signs of each dimension packed into ONE 12-bit int (bit p set
# iff plane p's sign at that dim is +1): the per-row projection work becomes
# a single array lookup + bit tests instead of 12 interpreted element_at
# calls on 128-literal arrays (measured: the 12-lookup form made the index
# 1.4x SLOWER than brute force at sf0.1).
_PACKED_SIGNS = [
    sum((1 << p) for p in range(_N_PLANES) if _PLANES[p][d] > 0)
    for d in range(len(_PLANES[0]))
]


def _lsh_topk_oracle(k: int = 5) -> str:
    packed = ", ".join(str(v) for v in _PACKED_SIGNS)
    proj_cols = ",\n".join(
        f"round(SUM(x * (((pk >> {p}) & 1) * 2 - 1)), 6) AS proj{p}"
        for p in range(_N_PLANES)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN proj{p} > 0 THEN {1 << p} ELSE 0 END)" for p in range(_N_PLANES)
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


@query("similarity_lsh_topk", oracle=_lsh_topk_oracle())
def similarity_lsh_topk(spark, sf_dir, *, k: int = 5, n_planes: int = _N_PLANES):
    """LSH-bucketed ANN: sign-random-projection signatures, candidates from
    matching buckets only, exact cosine re-rank on candidates.

    Hyperplanes are a seed-fixed +-1 literal matrix (functions.
    lsh_plane_signs) shipped with the plan (12 x 128 ints — trivial) and
    embedded identically in the DuckDB oracle, so bucket assignment is
    verifiable cross-engine.  Projections are rounded to 6 decimals before
    the sign test on BOTH engines so float summation order cannot flip a
    bucket bit.  At 100 TB this replaces the full cross product with an
    equi-join whose right side is ~corpus/2^planes per bucket.

    The signature is ONE Arrow-vectorized numpy matmul per batch
    (functions.lsh_bucket_udf) — a pure map over the corpus with no
    explode, no groupBy shuffle, and no join-back of buckets onto vectors.
    Two earlier JVM-side forms lost to brute force at sf0.1: 12 per-plane
    aggregate/zip_with lambdas (interpreted, 10x slower) and an exploded
    (vec_id, dim, x) agg (right compute, but 2 extra corpus shuffles).
    """
    t = tables(spark, sf_dir)
    # No fan_out here: the signature is one vectorized numpy matmul per
    # Arrow batch (microseconds for thousands of rows), so repartitioning
    # a small corpus to core count just buys 32 Python-worker round trips
    # and a shuffle.  On a real cluster the scan's own partitioning carries
    # the parallelism (fan_out would be a no-op there anyway), and the
    # candidate scoring after the bucket equi-join is small BY DESIGN —
    # that is what the index is for.
    emb = t["embeddings"].select("vec_id", vec_double("embedding").alias("v"))
    bucket_of = lsh_bucket_udf(_PACKED_SIGNS, n_planes)
    # The bucketed corpus IS the ANN index — materialize it so the query
    # side probes the same structure instead of re-scanning and re-hashing
    # the corpus (released by the registry on the next query build; at
    # scale a resident index is precisely what an ANN service keeps).
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
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
        .orderBy("q_id", F.desc("cos_sim"), "neighbor_id")
    )


_IVF_ORACLE = """
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
    round(list_dot_product(e.v, cv.c)
    / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv.c, cv.c))), 4) AS cell_sim,
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
    SELECT vec_id AS q_id, v AS qv, cell AS q_cell FROM assigned WHERE vec_id % 100 = 0
    ), scored AS (
    SELECT q.q_id, a.vec_id AS neighbor_id,
    round(list_dot_product(q.qv, a.v)
    / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v))), 3) AS cos_sim
    FROM q JOIN assigned a ON a.cell = q.q_cell AND a.vec_id <> q.q_id
    ), ranked AS (
    SELECT q_id, neighbor_id, cos_sim,
    row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM scored
    )
    SELECT q_id, neighbor_id, cos_sim FROM ranked WHERE rn <= 5
    ORDER BY q_id, cos_sim DESC, neighbor_id
    """


@query("similarity_ivf_topk", oracle=_IVF_ORACLE)
def similarity_ivf_topk(spark, sf_dir, *, k: int = 5):
    """IVF-style ANN: train cells (per-label centroids, one distributed
    pass), assign every vector to its nearest cell, then search only the
    query's cell with an exact cosine re-rank.

    The cell list is tiny -> broadcast; assignment is a broadcast nested
    scan, never a shuffle of the corpus; candidate search is an equi-join
    on the cell key.  At 100 TB the cell count grows (k-means on a sample)
    but the plan shape — broadcast centroids, equi-join on cell — is
    unchanged.  Cell similarity is rounded to 4 decimals (tie-broken by
    cell id) on BOTH engines so assignment is deterministic cross-engine.
    """
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
    assigned = (
        emb.crossJoin(F.broadcast(centv))
        .select("vec_id", "v", "cell", cell_sim.alias("cell_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cell")
    )
    queries = assigned.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("cell").alias("q_cell"),
    )
    scored = (
        F.broadcast(queries)
        .join(
            assigned,
            (F.col("cell") == F.col("q_cell")) & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 3).alias("cos_sim"),
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos_sim")
        .orderBy("q_id", F.desc("cos_sim"), "neighbor_id")
    )


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
    Plan shape is identical to similarity_ivf_topk; only the probe set
    grows, so the 100 TB story is unchanged (broadcast centroids, no
    corpus reshuffle)."""
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
    left-joined against each index's top-k picks, all three oracles nested
    as subqueries."""
    return f"""
    WITH brute AS (
    SELECT * FROM ({_BRUTE_ORACLE})
    ), lsh AS (
    SELECT * FROM ({_lsh_topk_oracle()})
    ), ivf AS (
    SELECT * FROM ({_IVF_ORACLE})
    )
    SELECT b.q_id,
    CAST(count(*) AS BIGINT) AS n_true,
    CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lsh_hit,
    round(CAST(sum(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) AS lsh_recall,
    CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ivf_hit,
    round(CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) AS ivf_recall
    FROM brute b
    LEFT JOIN lsh l ON b.q_id = l.q_id AND b.neighbor_id = l.neighbor_id
    LEFT JOIN ivf i ON b.q_id = i.q_id AND b.neighbor_id = i.neighbor_id
    GROUP BY b.q_id
    ORDER BY b.q_id
    """


@query("similarity_ann_recall", oracle=_ann_recall_oracle())
def similarity_ann_recall(spark, sf_dir, *, k: int = 5):
    """ANN-quality audit: per-query recall@k of BOTH approximate indexes
    (sign-LSH buckets, IVF cells) against the brute-force ground truth —
    the similarity-side twin of dedup_minhash_error, and the measurement
    that picks the index and its parameters before a 100 TB corpus runs on
    an approximate path only.  On this corpus it is decisive: the 12-plane
    single-probe LSH config recalls ~0 of the true top-5 (match needs all
    12 sign bits; P ~ (1-theta/pi)^12 is tiny at these angles) while IVF
    cells recall ~0.36 — i.e. the label-clustered geometry wants
    cell-based blocking, and the LSH path needs multiprobe or fewer planes
    (both exist as operators).

    Ground truth and index results are all deterministic (cosine rounded
    to 3 decimals before ranking, ties broken by neighbor_id on both
    engines), so recall itself is deterministic.  Cost shape: the three
    underlying pipelines as-is — the brute pass is the expensive leg and
    is exactly what a recall audit pays on a SAMPLE of queries at scale —
    plus two joins on the tiny (query, neighbor) result sets."""
    truth = similarity_brute_topk(spark, sf_dir, k=k)
    lsh = similarity_lsh_topk(spark, sf_dir, k=k).select(
        F.col("q_id").alias("l_q_id"),
        F.col("neighbor_id").alias("l_neighbor_id"),
    )
    ivf = similarity_ivf_topk(spark, sf_dir, k=k).select(
        F.col("q_id").alias("i_q_id"),
        F.col("neighbor_id").alias("i_neighbor_id"),
    )
    lsh_hit = F.sum(F.when(F.col("l_neighbor_id").isNotNull(), 1).otherwise(0))
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
