"""Training-data pipeline operators over ``documents``: duplicate-cluster
resolution (connected components), deterministic train/valid/test splitting,
sequence packing, and stratified sampling.

These extend the reference's query surface (SURVEY.md §2 Tier C admits any
non-DDL plan) with the operations a 100 TB pretraining pipeline actually
runs after near-dup detection:
- connected components turn pairwise dup edges into keep/drop decisions;
- hash-based splits must be deterministic and content-keyed (no RNG state,
  reproducible across re-runs and engines);
- packing groups documents into fixed token budgets per partition;
- stratified sampling takes an exact per-stratum fraction.

All of it is built-in column expressions + joins/windows (JVM-side,
whole-stage codegen); the only iteration (CC label propagation) is a fixed
unrolled chain of equi-joins — no driver-side actions in any builder.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import h60, h60_sql, tokens
from ..registry import query, tables, track_persist
from .dedup import _simhash_oracle, dedup_simhash

# Fixed propagation depth.  Each round is min-label PROPAGATION (one hop
# along edges) followed by a pointer-doubling SHORTCUT (label <- label of
# label), so the label horizon roughly DOUBLES per round — 6 rounds cover
# cluster diameters ~2^k, not k (the plain-propagation version tripped its
# own convergence guard at sf0.1, where the SimHash graph's largest
# component has diameter > 6; the r5 scaling probe caught it).  Same
# O(log d) convergence class as large-star/small-star (Kiveris et al.,
# "Connected Components in MapReduce and Beyond") with the same per-round
# shuffle shape (equi-joins on node id).  Since r6 the kernel iterates to
# CONVERGENCE (the two-decade probe's ~sf1 corpus chained past every fixed
# unroll tried — diameter > 510); _CC_MAX_ITERS is the runaway cap, not
# the working depth: 16 doubling rounds cover diameter ~2^17, and normal
# corpora early-exit in ~log2(diameter) rounds.
_CC_MAX_ITERS = 16


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_simhash_oracle()}),
    edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    walk(node, comp) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.node
    ),
    comps AS (
    SELECT node AS doc_id, min(comp) AS component FROM walk GROUP BY node
    )
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
    CAST(c.component AS BIGINT) AS component,
    CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT) AS cluster_size,
    c.doc_id = c.component AS is_keeper
    FROM comps c
    ORDER BY doc_id
    """,
)
def dedup_connected_components(spark, sf_dir):
    """Resolve near-dup PAIRS (SimHash Hamming<=3, dedup_simhash) into
    duplicate CLUSTERS: every document labeled with its component id
    (= min doc_id reachable over dup edges), cluster size, and the
    keep-this-one flag a dedup pipeline acts on.

    Min-label propagation WITH pointer doubling, unrolled ``_CC_ITERS``
    times: each round first takes label <- min(label, min over neighbors'
    labels) (one equi-join + groupBy), then shortcuts label <- label[label]
    (a self-join on the label table — every label is a doc_id, so the
    lookup always resolves).  Doubling makes the covered diameter grow
    ~2x per round instead of +1, the standard O(log d) CC recipe — every
    shuffle still keys on doc id (uniform, unskewed).  The edge relation
    is persisted so the SimHash sketch pipeline runs once, not once per
    round.  The DuckDB oracle computes the EXACT components via a
    recursive CTE, so the parity gate proves the fixed depth reached the
    fixpoint; a final guarded propagation round asserts fixpoint at
    RUNTIME (labels equal across every edge => exact min per component,
    since labels are monotone non-increasing ids of reachable nodes).
    """
    from pyspark.storagelevel import StorageLevel

    t = tables(spark, sf_dir)
    pairs = dedup_simhash(spark, sf_dir).select("doc_a", "doc_b")
    edges = track_persist(
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        ).toDF("src", "dst"),
        StorageLevel.MEMORY_AND_DISK,
    )
    nodes = t["documents"].select("doc_id")
    labels = cc_resolve(nodes, edges)
    w = Window.partitionBy("component")
    return (
        labels.withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("is_keeper", F.col("doc_id") == F.col("component"))
        .orderBy("doc_id")
    )


def cc_resolve(nodes, edges, max_iters: int = _CC_MAX_ITERS):
    """Connected-components kernel: label every node in ``nodes`` (one
    ``doc_id`` column) with the MIN doc_id reachable over ``edges``
    (symmetric ``src``/``dst`` columns) — returned as
    DataFrame[doc_id, component].

    Iterates (propagate + pointer-double) rounds TO CONVERGENCE: after
    each round a loop-control count checks whether any label changed and
    the loop exits on the first all-quiet round — the GraphX/Pregel
    control pattern (a scalar job per round, never a data collect; each
    round already runs a job for its localCheckpoint, so the check adds
    one cheap scan of the checkpointed n-row label table).  A zero-change
    round implies exactness: the propagate step updated every node with
    the min over its neighbors, so no change means labels are equal
    across every (symmetric) edge, labels are monotone non-increasing ids
    of reachable nodes, and each component's constant label is its min
    member id.  r5 shipped a fixed unroll instead; the r6 two-decade
    probe's ~sf1 corpus chained past every fixed depth tried (diameter >
    510), which is exactly the failure mode a data-dependent diameter
    always holds over a fixed plan.

    ``max_iters`` is a runaway cap (2^17 diameter coverage at the
    default), not the working depth; if it is ever exhausted, ONE final
    guarded propagate round runs assert_true and fails the JOB with a
    diagnosis instead of silently returning split components."""
    labels = nodes.select("doc_id", F.col("doc_id").alias("component"))

    def _propagate(lbl):
        nbr = (
            edges.join(lbl, edges["dst"] == lbl["doc_id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
        )
        return lbl.join(nbr, lbl["doc_id"] == nbr["src"], "left").select(
            "doc_id",
            F.col("component").alias("prev_component"),
            F.least(
                "component", F.coalesce("nbr_comp", "component")
            ).alias("component"),
        )

    for _ in range(max_iters):
        stepped = _propagate(labels)
        # pointer doubling: component <- component's current component.
        # Labels are always doc_ids present in the label table, so the
        # inner equi-join resolves every row; least() keeps monotonicity
        # explicit (comp[comp] <= comp already holds by construction).
        ptr = stepped.select(
            F.col("doc_id").alias("c_id"), F.col("component").alias("c_comp")
        )
        new = stepped.join(ptr, stepped["component"] == ptr["c_id"]).select(
            "doc_id",
            "prev_component",
            F.least("component", "c_comp").alias("component"),
        )
        # Truncate lineage EVERY round: the self-join references labels
        # twice, so without a cut the logical plan doubles per round
        # (2^ITERS analysis blow-up — measured driver OOM during
        # CheckAnalysis at 6 rounds).  localCheckpoint materializes the
        # n-row label table to executor storage and replaces the plan
        # with an RDD scan — the per-round plan stays constant-size, the
        # iterative-algorithm norm (GraphX checkpoints the same way).  At
        # 100 TB use spark.sparkContext.setCheckpointDir + .checkpoint()
        # instead: reliable storage survives executor loss.
        new = new.localCheckpoint(eager=True)
        # Loop-control action — allowlisted by name in
        # tests/test_registry_coverage.py: ONE scalar job per round over
        # the just-checkpointed n-row label table (limit(1) short-circuits
        # on the first changed row), the GraphX/Pregel convergence-probe
        # norm.  It is control flow, not a data collect: no rows ever
        # reach the driver, and the builder cannot terminate a
        # data-dependent fixpoint loop without observing a scalar.
        changed = new.filter(F.col("component") != F.col("prev_component")).limit(1).count()
        labels = new.select("doc_id", "component")
        if changed == 0:
            # zero-change round => the propagate step was already a
            # fixpoint => exact components (see docstring)
            return labels
    labels = _propagate(labels)
    converged_guard = F.assert_true(
        F.col("prev_component") == F.col("component"),
        F.lit(
            "dedup_connected_components: label still changing after "
            f"{max_iters} rounds (cluster diameter exceeds the doubled "
            "horizon); raise max_iters or switch to large-star/small-star"
        ),
    )
    return (
        # coalesce(assert, true) keeps every row while forcing the assert
        # to evaluate per row (a bare `assert | true` would be folded away
        # by BooleanSimplification and never run).
        labels.filter(F.coalesce(converged_guard.cast("boolean"), F.lit(True)))
        .select("doc_id", "component")
    )


@query(
    "split_train_eval",
    oracle=f"""
    WITH b AS (
    SELECT lang,
    CASE WHEN {h60_sql('text')} % 1000 < 900 THEN 'train'
    WHEN {h60_sql('text')} % 1000 < 950 THEN 'valid'
    ELSE 'test' END AS split,
    len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok,
    length(text) AS nchars
    FROM documents
    )
    SELECT lang, split,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(ntok) AS BIGINT) AS total_tokens,
    round(avg(nchars), 4) AS avg_chars
    FROM b GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def split_train_eval(spark, sf_dir):
    """Deterministic content-hash train/valid/test split (90/5/5): the split
    is a pure function of the document TEXT (not row order, not RNG state),
    so re-runs, retries, and different cluster layouts assign identically —
    the property a reproducible 100 TB pipeline needs.  Near-identical
    copies land in the same split (hash of content), limiting train/eval
    leakage from exact dups.  One scan, one groupBy on (lang, split)."""
    t = tables(spark, sf_dir)
    bucket = h60("text") % F.lit(1000)
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "valid").otherwise("test")
    )
    return (
        t["documents"]
        .select(
            "lang",
            split.alias("split"),
            F.size(tokens("text")).alias("ntok"),
            F.length("text").alias("nchars"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("nchars"), 4).alias("avg_chars"),
        )
        .orderBy("lang", "split")
    )


_PACK_BUDGET = 2048


@query(
    "pack_sequences",
    oracle=f"""
    WITH d AS (
    SELECT lang, doc_id,
    len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok
    FROM documents
    ), c AS (
    SELECT lang, doc_id, ntok,
    coalesce(sum(ntok) OVER (
    PARTITION BY lang ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
    FROM d
    )
    SELECT lang, CAST(pre // {_PACK_BUDGET} AS BIGINT) AS pack_id,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(ntok) AS BIGINT) AS pack_tokens,
    CAST(min(doc_id) AS BIGINT) AS first_doc,
    CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM c GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
)
def pack_sequences(spark, sf_dir):
    """Sequence packing: assign documents to fixed token-budget packs
    (budget ``_PACK_BUDGET`` = 2048 whitespace tokens) by running token
    count within each ``lang`` partition, deterministic doc_id order.

    The window partitions by ``lang`` — packing is per-partition-sequential
    by nature, and partition-local windows are exactly how it distributes:
    at 100 TB the partition key becomes (lang, shard) so no single window
    partition exceeds an executor, while pack ids stay deterministic.
    One scan, one shuffle on the partition key.
    """
    t = tables(spark, sf_dir)
    d = t["documents"].select(
        "lang", "doc_id", F.size(tokens("text")).alias("ntok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn("pre", F.coalesce(F.sum("ntok").over(w), F.lit(0)))
        .withColumn("pack_id", F.floor(F.col("pre") / _PACK_BUDGET))
        .groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "pack_id")
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH r AS (
    SELECT lang, doc_id,
    row_number() OVER (
    PARTITION BY lang ORDER BY {h60_sql("'sample:' || text")}, doc_id) AS rn,
    count(*) OVER (PARTITION BY lang) AS n
    FROM documents
    )
    SELECT lang, CAST(doc_id AS BIGINT) AS doc_id
    FROM r WHERE rn <= ceil(n * 0.1)
    ORDER BY lang, doc_id
    """,
)
def sample_stratified(spark, sf_dir):
    """Exact-rate stratified sample: 10% of documents PER language, chosen
    by content-hash order (deterministic, reproducible, engine-independent —
    no RNG).  row_number over a salted content hash picks the sample;
    count(*) over the stratum fixes the exact cutoff.  Both windows share
    one partitioning on ``lang`` (one shuffle); at 100 TB the stratum key
    stays the partition key and the sample is computed without any
    driver-side pass."""
    t = tables(spark, sf_dir)
    h = h60(F.concat(F.lit("sample:"), F.col("text")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    wc = Window.partitionBy("lang")
    return (
        t["documents"]
        .select(
            "lang",
            "doc_id",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.col("rn") <= F.ceil(F.col("n") * 0.1))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@query(
    "shuffle_deterministic",
    oracle=f"""
    WITH ranked AS (
    SELECT doc_id,
    row_number() OVER (ORDER BY {h60_sql("'epoch7:' || text")}, doc_id) AS pos
    FROM documents
    )
    SELECT doc_id, CAST(pos AS BIGINT) AS pos
    FROM ranked WHERE pos <= 20 ORDER BY pos
    """,
)
def shuffle_deterministic(spark, sf_dir):
    """Seeded deterministic corpus shuffle — the epoch-reshuffle a training
    pipeline needs WITHOUT RNG state: global order = content hash of
    (seed || text), tie-broken by doc_id.  Same seed -> identical order on
    any cluster layout, any retry; new seed -> a fresh permutation.

    Scale shape: the order key is computed per-row (one md5), and the
    global ordering is Spark's distributed range sort — the same exchange
    any epoch shuffle pays.  The registered result keeps the first 20
    positions (deterministic witness of the full permutation); a real
    pipeline would write the sorted corpus instead of limiting."""
    t = tables(spark, sf_dir)
    skey = h60(F.concat(F.lit("epoch7:"), F.col("text")))
    w = Window.orderBy(skey, "doc_id")
    return (
        t["documents"]
        .select("doc_id", F.row_number().over(w).cast("long").alias("pos"))
        .filter(F.col("pos") <= 20)
        .orderBy("pos")
    )


@query(
    "dedup_keeper_by_quality",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
    CAST(count(*) AS BIGINT) AS n_copies,
    arg_max(doc_id, n_chars * 10000000 + doc_id) AS keeper_doc_id,
    CAST(max(n_chars) AS BIGINT) AS keeper_nchars
    FROM documents
    GROUP BY 1
    ORDER BY fingerprint
    """,
)
def dedup_keeper_by_quality(spark, sf_dir):
    """Exact-dup resolution with a QUALITY-keyed keeper policy: within each
    normalized-content group, keep the doc with the highest quality signal
    (here n_chars; any scalar score slots in) instead of the arbitrary
    min-id — the policy real curation pipelines use so the best-formatted
    copy survives.  The ranking key is score * 10^7 + doc_id, unique by
    construction, so max_by/arg_max is deterministic on both engines.
    Single hash-groupBy on the fingerprint: same one-shuffle shape as
    dedup_exact."""
    from ..functions import fingerprint_md5

    t = tables(spark, sf_dir)
    rank = F.col("n_chars") * F.lit(10_000_000) + F.col("doc_id")
    return (
        t["documents"]
        .groupBy(fingerprint_md5("text").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.max_by("doc_id", rank).alias("keeper_doc_id"),
            F.max("n_chars").alias("keeper_nchars"),
        )
        .orderBy("fingerprint")
    )


@query(
    "pipeline_end_to_end",
    oracle=f"""
    WITH q AS (
    SELECT doc_id, lang, text,
    len(string_split_regex(lower(trim(text)), '\\s+')) AS ntok,
    CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
    / len(string_split_regex(lower(trim(text)), '\\s+')) AS uniq
    FROM documents WHERE n_chars > 0
    ), kept AS (
    SELECT * FROM q WHERE ntok >= 20 AND uniq >= 0.3
    ), ded AS (
    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM kept
    ), fin AS (
    SELECT lang, ntok, length(text) AS nchars,
    CASE WHEN {h60_sql('text')} % 1000 < 900 THEN 'train'
    WHEN {h60_sql('text')} % 1000 < 950 THEN 'valid'
    ELSE 'test' END AS split
    FROM ded WHERE doc_id = keeper
    )
    SELECT split, lang,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(ntok) AS BIGINT) AS total_tokens,
    round(avg(nchars), 4) AS avg_chars
    FROM fin GROUP BY split, lang
    ORDER BY split, lang
    """,
)
def pipeline_end_to_end(spark, sf_dir):
    """The whole curation pipeline as ONE composed plan: quality filter
    (Gopher-style keep rule) -> exact dedup (keeper = min doc_id per
    content hash) -> deterministic content-hash train/valid/test split ->
    per-(split, lang) corpus stats.  This is the statement a pipeline
    operator actually submits — each stage is an operator already verified
    in isolation, and the composition stays one declarative DataFrame
    chain Catalyst optimizes END TO END (the quality filter pushes below
    the dedup window's shuffle; no stage materializes driver-side).

    Scale shape: one scan; one fingerprint-keyed window shuffle for the
    dedup keeper; one (split, lang) rollup.  Every stage key is
    content-derived and uniform."""
    t = tables(spark, sf_dir)
    tok = tokens("text")
    ntok = F.size(tok)
    uniq = F.size(F.array_distinct(tok)).cast("double") / ntok
    kept = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "text", ntok.alias("ntok"))
        .filter((F.col("ntok") >= 20) & (uniq >= 0.3))
    )
    keeper = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    fin = kept.withColumn("keeper", keeper).filter(F.col("doc_id") == F.col("keeper"))
    bucket = h60("text") % F.lit(1000)
    split = (
        F.when(bucket < 900, "train").when(bucket < 950, "valid").otherwise("test")
    )
    return (
        fin.select(
            split.alias("split"),
            "lang",
            "ntok",
            F.length("text").alias("nchars"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("nchars"), 4).alias("avg_chars"),
        )
        .orderBy("split", "lang")
    )


_SCD2_NEW_KEY_OFFSET = 10_000_000  # new business keys land above every real key


@query(
    "scd2_merge_actions",
    oracle=f"""
    WITH snap AS (
    SELECT c_custkey AS custkey,
    c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS acctbal
    FROM customer WHERE c_custkey % 11 <> 0
    UNION ALL
    SELECT c_custkey + {_SCD2_NEW_KEY_OFFSET}, 0.0
    FROM customer WHERE c_custkey % 13 = 0
    ), merged AS (
    SELECT d.c_custkey AS dk, s.custkey AS sk,
    d.c_acctbal AS da, s.acctbal AS sa
    FROM customer d FULL OUTER JOIN snap s ON d.c_custkey = s.custkey
    )
    SELECT CASE WHEN dk IS NULL THEN 'insert'
    WHEN sk IS NULL THEN 'retire'
    WHEN da <> sa THEN 'update'
    ELSE 'unchanged' END AS action,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(sum(coalesce(dk, sk)) AS BIGINT) AS key_checksum
    FROM merged
    GROUP BY 1
    ORDER BY 1
    """,
)
def scd2_merge_actions(spark, sf_dir):
    """Slowly-changing-dimension (type 2) merge classification: compare
    the current dimension against an incoming snapshot and classify
    every business key as insert / update / retire / unchanged — the
    decision table that drives the close-old-row + write-new-row pass
    of a warehouse dimension load.  The snapshot is derived
    deterministically from the canonical table (keys %7 changed, %11
    missing, %13 spawning a new key above every real one) so the oracle
    computes the expected action counts exactly.

    Scale notes (100 TB): the merge is ONE full-outer shuffle equi-join
    on the business key — the canonical MERGE plan — followed by a
    4-group classification rollup with map-side partial aggregation.
    No collect, no window; the snapshot derivation is two scans of the
    dim unioned.  Action counts and key checksums are exact integers."""
    t = tables(spark, sf_dir)
    cust = t["customer"]
    snap = (
        cust.filter(F.col("c_custkey") % 11 != 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            (
                F.col("c_acctbal")
                + F.when(F.col("c_custkey") % 7 == 0, 100.0).otherwise(0.0)
            ).alias("acctbal"),
        )
        .unionByName(
            cust.filter(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + _SCD2_NEW_KEY_OFFSET).alias("custkey"),
                F.lit(0.0).alias("acctbal"),
            )
        )
    )
    merged = cust.select("c_custkey", "c_acctbal").join(
        snap, F.col("c_custkey") == F.col("custkey"), "full_outer"
    )
    action = (
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("custkey").isNull(), "retire")
        .when(F.col("c_acctbal") != F.col("acctbal"), "update")
        .otherwise("unchanged")
    )
    return (
        merged.select(
            action.alias("action"),
            F.coalesce("c_custkey", "custkey").alias("k"),
        )
        .groupBy("action")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("k").alias("key_checksum"),
        )
        .orderBy("action")
    )
