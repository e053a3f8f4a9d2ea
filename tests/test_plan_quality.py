"""Plan-quality gate: correctness tests prove WHAT is computed; these prove
HOW — that the physical plans are the ones that survive a 100 TB scale-up.

Each assertion encodes a scale invariant:
- filters reach the parquet scan (row-group pruning = I/O proportional to
  selectivity, not table size);
- scans read only projected columns (columnar I/O proportional to width
  used);
- small dimensions broadcast (no shuffle of the fact table for star joins);
- shuffle counts are bounded and justified (every exchange is a full
  network repartition of its input at scale).
"""

import os

import pytest

from datafusion_dynamic_filter_spark import registry
from datafusion_dynamic_filter_spark.plans import (
    broadcast_join_count,
    executed_plan,
    explain_formatted,
    pushed_filters,
    scan_columns,
    shuffle_count,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


@pytest.fixture(scope="module", autouse=True)
def _tables(spark):
    registry.tables(spark, SF_DIR)


def test_prepared_lookup_filter_pushed(engine, testdata):
    """The defining reference behavior at the physical level: the bound key
    must reach the scan as a pushed filter (DynamicFilterExec pushdown mode,
    src/physical.rs:247-255), not a post-scan Filter."""
    stmt = engine.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    df = stmt.execute({"$1": 42})
    assert any("o_orderkey" in f for f in pushed_filters(df)), pushed_filters(df)


def test_prepared_range_filter_pushed(engine, testdata):
    stmt = engine.prepare(
        "SELECT o_orderkey FROM orders WHERE o_orderkey >= $1 AND o_orderkey <= $2"
    )
    df = stmt.execute({"$1": 10, "$2": 20})
    fs = pushed_filters(df)
    assert any("GreaterThanOrEqual" in f or ">=" in f for f in fs), fs
    assert any("LessThanOrEqual" in f or "<=" in f for f in fs), fs


def test_prepared_projection_prunes_columns(engine, testdata):
    """2-column projection must not scan all 9 orders columns."""
    stmt = engine.prepare("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1")
    cols = set(scan_columns(stmt.execute({"$1": 1})))
    assert cols <= {"o_orderkey", "o_totalprice"}, cols


def test_q1_column_pruning(spark):
    """TPC-H Q1 touches 7 of 16 lineitem columns; the scan must too."""
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    cols = set(scan_columns(df))
    assert "l_comment" not in cols and "l_orderkey" not in cols, cols


def test_star_join_broadcasts(spark):
    """Dims (region/nation) must broadcast — shuffling the fact side on a
    star join is the canonical 100 TB mistake."""
    df = registry.QUERIES["join_broadcast_dims"](spark, SF_DIR)
    assert broadcast_join_count(df) >= 1, executed_plan(df)


def test_q5_broadcasts_small_dims(spark):
    df = registry.QUERIES["q5_local_supplier_volume"](spark, SF_DIR)
    assert broadcast_join_count(df) >= 2, executed_plan(df)


def test_similarity_broadcasts_queries(spark):
    """ANN: the query set broadcasts; the corpus is scanned exactly once
    partition-parallel (never shuffled)."""
    df = registry.QUERIES["similarity_brute_topk"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or broadcast_join_count(df) >= 1, plan


def test_dedup_exact_single_shuffle(spark):
    """Exact dedup = one hash-agg: exactly one exchange on the fingerprint
    (plus the final sort's range exchange) — anything more is waste."""
    df = registry.QUERIES["dedup_exact"](spark, SF_DIR)
    assert shuffle_count(df) <= 2, executed_plan(df)


def test_q1_shuffle_bounded(spark):
    """Scan -> partial agg -> exchange -> final agg -> sort: <=2 exchanges."""
    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    assert shuffle_count(df) <= 2, executed_plan(df)


def test_bucketed_join_shuffle_free(spark):
    """Both sides bucketed+sorted on the join key: the sort-merge join must
    consume bucket files directly — the ONLY exchange allowed is the final
    nationkey agg (and its sort). At 100 TB this is the difference between
    joining in place and re-shuffling the fact table every query."""
    df = registry.QUERIES["source_bucketed_join"](spark, SF_DIR)
    df.collect()
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan, plan
    # join children (the text below the SMJ node) must contain no exchange:
    # the bucket files ARE the join partitioning
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange hashpartitioning" not in join_part, plan
    assert "Bucketed: true" in plan, plan


def test_partitioned_sink_prunes_partitions(spark):
    """Reading one status partition must plan a partition-filtered scan."""
    df = registry.QUERIES["sink_partitioned_parquet"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan or (
        "o_orderstatus" in plan and "PartitionFilters" in plan
    ), plan


def test_hot_prepared_reads_in_memory_and_skips_jit(engine, testdata):
    """Hot template: column-pruned scan pinned in memory (reference MemTable
    regime) and NO per-key generated class — execution cost deterministic,
    immune to driver codegen-cache churn."""
    stmt = engine.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1", hot=True
    )
    try:
        df = stmt.execute({"$1": 42})
        rows = df.collect()
        plan = executed_plan(df)
        assert "InMemoryTableScan" in plan, plan
        assert "WholeStageCodegen" not in plan, plan
        # same answer as the cold (pushdown) path
        cold = engine.prepare(
            "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
        )
        assert rows == cold.execute({"$1": 42}).collect()
        # cached projection is column-pruned: only the referenced columns
        cached_cols = set(stmt._template.scan_df.columns)
        assert cached_cols == {"o_orderkey", "o_totalprice"}, cached_cols
    finally:
        stmt.close()


def test_scan_metrics_reports_files_and_rows(engine, testdata):
    from datafusion_dynamic_filter_spark.plans import scan_metrics

    stmt = engine.prepare(
        "SELECT o_orderkey FROM orders WHERE o_orderkey = $1"
    )
    df = stmt.execute({"$1": 7})
    df.collect()
    m = scan_metrics(df)
    assert m["files_read"] >= 1 and m["bytes_read"] > 0, m


def test_whole_stage_codegen_covers_q1(spark):
    """The hot path must be inside WholeStageCodegen (JVM, vectorized), not
    interpreted row-at-a-time.  AQE finalizes codegen stages only at
    execution, so run the query first and inspect the final plan."""
    from datafusion_dynamic_filter_spark.plans import codegen_stage_count

    df = registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    df.collect()
    assert codegen_stage_count(df) >= 1, executed_plan(df)


def test_lsh_similarity_no_cartesian_no_corpus_reshuffle(spark):
    """The ANN index plan: bucket equi-join (never a cartesian product) and
    the signature computed as a per-row map — no explode/groupBy shuffle of
    the corpus arrays, so shuffles stay bounded to the final rank/sort."""
    df = registry.QUERIES["similarity_lsh_topk"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # BroadcastNestedLoopJoins are allowed ONLY for the 1-row corpus-count
    # broadcast that the r8 adaptive band width masks the persisted 16-bit
    # keys with (the semdedup corpus-stats pattern — a bounded build side
    # by construction).  The masked-key relation has two consumers (query
    # extraction + probe side), so the pre-adaptive plan text shows the
    # pattern twice; at runtime AQE reuses the single 1-row broadcast
    # exchange (verified: ReusedExchange appears in the executed plan).
    # Anything beyond 2 would be an all-pairs structure over the corpus.
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    # candidate dedup + the r7 parallelism-pinning repartition of the
    # id-pair relation (AQE-coalesce exemption) + rank/sort + the 1-row
    # count aggregate's exchanges (reused at runtime): all keyed or
    # round-robin on ids only, or 1-row — never the vectors.
    assert shuffle_count(df) <= 6, executed_plan(df)


def test_ngram_jaccard_is_equi_join(spark):
    """Prefix filtering must plan the candidate join as a hash/sort-merge
    EQUI join on (prefix token, lang) — an all-pairs nested-loop join here
    is the quadratic plan the operator was rewritten to eliminate."""
    df = registry.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_compute_dense_chains_pin_parallelism(spark):
    """r7 regression gate: AQE's bytes-based coalescing serialized the
    PPJoin and ANN re-rank chains onto one core (tiny-by-bytes shuffle
    reads).  The fix is an explicit numbered repartition (exempt from AQE
    coalescing) — its REPARTITION_BY_NUM exchange must stay in the plan."""
    for q in ("dedup_ngram_jaccard", "similarity_lsh_topk"):
        df = registry.QUERIES[q](spark, SF_DIR)
        assert "REPARTITION_BY_NUM" in executed_plan(df), (q, executed_plan(df))
        registry.release_persisted()


def test_exact_verify_joins_stay_equi_without_broadcast_hint(spark):
    """r6 verdict: the candidate-pair relations feeding the exact-verify
    joins are unbounded, so their F.broadcast hints were dropped in favor
    of AQE.  The joins must STILL plan as equi-joins (hash or sort-merge —
    AQE picks by measured size); a CartesianProduct/BNLJ here would mean
    the join keys were lost with the hint."""
    for q in ("dedup_lsh_verified", "dedup_jaccard_partners"):
        df = registry.QUERIES[q](spark, SF_DIR)
        df.count()  # finalize AQE so the inspected plan is the real one
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, (q, plan)
        # r13: back to the strict form.  The r12 in-plan count-flag
        # crossJoin (the one blessed Cross BNLJ) is gone — the MinHash
        # branch gate moved to plan build time (dedup._documents_row_count
        # reads parquet footers; no flag relation in the plan) — so NO
        # BNLJ of any form is legal here again; the r12 "any Cross line
        # passes" loophole (verdict #4: a genuine unkeyed cross join of
        # broadcastable relations would also print Cross) is closed.
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)
        registry.release_persisted()


def test_bpe_pair_stats_single_agg_shuffle(spark):
    """Pair counting = per-row transform + explode + one pair-keyed
    aggregation; top-k rides TakeOrdered, not a global sort shuffle."""
    df = registry.QUERIES["bpe_merge_pair_stats"](spark, SF_DIR)
    assert shuffle_count(df) <= 2, executed_plan(df)
    assert "TakeOrderedAndProject" in executed_plan(df), executed_plan(df)


def test_minhash_signature_built_from_word_hash_arithmetic(spark):
    """The sketch's md5 runs per WORD in codegen; shingle hashes are
    arithmetic (no concat'd shingle strings in the plan)."""
    df = registry.QUERIES["dedup_minhash_lsh"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_tfidf_bounded_shuffles_and_broadcast_n(spark):
    """TF-IDF: the corpus size N must enter as a broadcast 1-row relation
    (BroadcastNestedLoopJoin with a single-row build is the intended shape,
    NOT a shuffle), and the keyed groupBys/joins must keep the shuffle count
    bounded — no all-pairs structure anywhere."""
    df = registry.QUERIES["text_tfidf_top_terms"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # TF groupBy, DF groupBy (recomputed branch), the term-keyed join's two
    # sides, per-doc window, 1-row N agg, final sort — all KEYED exchanges,
    # none all-pairs; the window is WindowGroupLimit-capped to top-3 before
    # its shuffle.
    assert shuffle_count(df) <= 10, explain_formatted(df)


def test_retention_cohorts_scan_pruning_and_shape(spark):
    """Retention cohorts touch only user_id/ts of events; both reductions
    key on user_id and the cell rollup on (cohort_week, offset) — bounded
    shuffles, no broadcast of the user dimension required."""
    df = registry.QUERIES["events_retention_cohorts"](spark, SF_DIR)
    cols = set(scan_columns(df))
    assert cols <= {"user_id", "ts"}, cols
    assert shuffle_count(df) <= 7, explain_formatted(df)


def test_boilerplate_single_scan_no_broadcast(spark):
    """Cross-doc boilerplate: document frequency rides in a window
    aggregate, so the plan must scan+shingle the corpus exactly ONCE and
    never broadcast the gram dictionary (it grows with the corpus).  The
    groupBy-then-join-back formulation this replaced planned 2 scans and
    a dictionary broadcast."""
    df = registry.QUERIES["text_boilerplate_spans"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    assert "BroadcastExchange" not in plan, plan
    # gram-keyed window shuffle + doc_id rollup + final sort, plus
    # fan_out's round-robin repartition (a local-mode no-op on real
    # multi-split inputs)
    assert shuffle_count(df) <= 4, explain_formatted(df)


def test_minhash_error_reuses_persisted_signature(spark):
    """The accuracy audit re-joins the signature relation three ways
    (buckets + both pair sides); those joins must consume the PERSISTED
    sketch (InMemoryTableScan), not recompute the corpus shingling per
    branch, and the bounded candidate set must be the broadcast side."""
    try:
        df = registry.QUERIES["dedup_minhash_error"](spark, SF_DIR)
        plan = executed_plan(df)
        # sig consumed by >=3 branches (buckets + both pair sides), all
        # from the cache.  (No "Scan parquet" count here: InMemoryTableScan
        # nodes print their cached child plan, so the text overcounts.)
        assert plan.count("InMemoryTableScan") >= 3, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastExchange" in plan, plan
    finally:
        registry.release_persisted()


def test_range_join_broadcasts_tiny_bins(spark):
    """A pure range join (no equi-key) must plan as a broadcast
    nested-loop against the TINY bins relation — each event row tests 4
    bin rows, which is the right plan; a CartesianProduct (both sides
    unbroadcast) would be the scale bug."""
    df = registry.QUERIES["events_range_join_bins"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pipeline_end_to_end_single_scan_no_join(spark):
    """The composed quality->dedup->split statement must stay ONE scan
    with the dedup keeper as a window (no self-join of the corpus) and a
    bounded shuffle count — proof the stages fused into one plan."""
    df = registry.QUERIES["pipeline_end_to_end"](spark, SF_DIR)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 1, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert j not in plan, plan
    assert shuffle_count(df) <= 4, explain_formatted(df)


def test_salted_join_shuffles_on_salt(spark):
    """The salted-skew join must actually be a shuffle join keyed on
    (event_type, salt) — if Spark broadcasts the dim the salt mechanics
    are dead code, and without the salt in the join keys each hot key
    still lands on one reducer."""
    df = registry.QUERIES["join_salted_skew"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    join_keys = plan.split("SortMergeJoin", 1)[1][:200]
    assert "salt" in join_keys, plan


def test_dpp_point_lookup_prunes_partitions(spark):
    """The data-bound (fixed-plan) lookup over the hash-bucket-partitioned
    layout must carry a runtime dynamic-partition-pruning expression in the
    scan's PartitionFilters — scan I/O proportional to the parameter batch's
    buckets, with key-independent generated code.  This is the engine's
    answer to the reference's update-one-physical-plan mechanism at scale.

    Pinned to sf0.01: Catalyst's DPP cost model (measured, correctly)
    declines to insert the pruning subquery when the whole partitioned
    table is a few hundred KB (sf0.001), so the smallest SF cannot witness
    the plan shape that matters at scale."""
    dpp_dir = "/root/testdata/sf0.01"
    df = registry.QUERIES["prepared_dpp_partition_pruning"](spark, dpp_dir)
    try:
        assert df.count() == 3
        plan = executed_plan(df)
        assert "dynamicpruning" in plan.lower(), plan
    finally:
        # Re-register views for SF_DIR so later tests see their own scale.
        registry.tables(spark, SF_DIR)


def test_semdedup_broadcasts_centroids_pairs_equi_join(spark):
    """SemDeDup's scale contract: the k-row centroid table BROADCASTS for
    assignment (one allowed nested-loop over k rows — never a shuffle of
    the corpus), the intra-cell pair join is a hash EQUI join on the
    assigned cell (no corpus cartesian), and the assigned relation is
    persisted so assignment computes once, not once per self-join side."""
    df = registry.QUERIES["dedup_semdedup"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the persisted assignment feeds both pair-join sides and the final
    # centroid_cos join — three cache reads, zero recomputes
    assert plan.count("InMemoryTableScan") >= 3, plan
    # The only nested-loop joins are the bounded broadcasts inside the
    # cached assignment subtree (k-row centroids + the 1-row corpus-stats
    # relation feeding the n_sub formula): the subtree's plan text
    # reprints once per cache-read site, so the BNLJ count must be an
    # exact per-site multiple — a BNLJ at top level (outside
    # InMemoryRelation) would break the multiplicity.
    n_sites = plan.count("InMemoryTableScan")
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_sites > 0 and n_bnlj % n_sites == 0, plan


def test_substring_spans_persists_anchored_spans(spark):
    """Substring-span dedup's scale contract: the anchored-span relation
    (a full scan plus a per-character-position md5 transform — the
    dominant cost) feeds BOTH the repeat-count aggregate and the scoring
    join, so it must be consumed from the cache on both branches; an
    unpersisted plan recomputes the scan + anchor transform twice."""
    try:
        df = registry.QUERIES["dedup_substring_spans"](spark, SF_DIR)
        plan = executed_plan(df)
        assert plan.count("InMemoryTableScan") >= 2, plan
        assert "CartesianProduct" not in plan, plan
    finally:
        registry.release_persisted()


def test_fuzzy_decontam_equi_join_no_cartesian(spark):
    """Fuzzy decontam's scale contract: train-vs-eval candidates come from
    a bucket EQUI-join (never all-pairs), and the exact verify stays an
    equi-join without a broadcast hint (the candidate relation is
    unbounded; AQE decides at runtime).  The shared signature relation is
    persisted and read from cache by the bucketing and both verify sides."""
    try:
        df = registry.QUERIES["decontam_fuzzy_minhash"](spark, SF_DIR)
        df.count()  # finalize AQE so the inspected plan is the real one
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        # r13: strict again — the r12 count-flag crossJoin left the plan
        # with the plan-build-time branch gate (see
        # test_exact_verify_joins_stay_equi_without_broadcast_hint).
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert plan.count("InMemoryTableScan") >= 3, plan
    finally:
        registry.release_persisted()


def test_token_budget_prefix_sum_is_two_level(spark):
    """The global running sum must NOT plan as a single-partition window
    over the document relation (the classic prefix-sum scale trap).  The
    doc-level Window must be hash-partitioned on the score bucket; the
    only unpartitioned window allowed is over the <=1001-row per-bucket
    aggregate."""
    try:
        df = registry.QUERIES["corpus_token_budget_select"](spark, SF_DIR)
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        # the per-doc running sum (keyed by quality_score DESC, doc_id) is
        # partitioned by the bucket column qb
        import re

        doc_windows = [
            ln for ln in plan.splitlines()
            if "Window" in ln and "quality_score" in ln and "doc_id" in ln
        ]
        assert doc_windows, plan
        assert all(re.search(r"\[qb[#L0-9]*\]", ln) for ln in doc_windows), (
            "doc-level window not partitioned by qb:\n" + "\n".join(doc_windows)
        )
    finally:
        registry.release_persisted()


def test_adaptive_threshold_single_scan_partial_agg(spark):
    """Per-domain percentile thresholds: one groupBy(source) aggregation
    whose exact-percentile state is bounded (integer-quantized scores),
    joined back as an equi-join — no cartesian, bounded shuffles."""
    try:
        df = registry.QUERIES["quality_adaptive_threshold"](spark, SF_DIR)
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        # fan_out repartition + percentile agg exchange + verdict agg
        # exchange + final order-by range exchange (+1 for the cached
        # subtree's own repartition reprinting per cache-read site)
        assert shuffle_count(df) <= 5, plan
    finally:
        registry.release_persisted()


def test_vocab_stats_two_level_agg_no_join(spark):
    """Vocabulary stats: explode + two map-side-combinable aggregations,
    no joins — the heavy shuffle carries one row per distinct
    (source, token), not per occurrence."""
    df = registry.QUERIES["token_vocab_stats"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Join" not in plan, plan
    # fan_out repartition + (source, token) agg + source rollup + order-by
    assert shuffle_count(df) <= 4, plan


def test_ngram_novelty_equi_join_linear(spark):
    """Novelty scoring: the document-frequency relation joins back on the
    shingle key as an EQUI join (hash/sort-merge); an all-pairs plan here
    would be quadratic in corpus size."""
    df = registry.QUERIES["text_ngram_novelty"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_int8_quantize_bounded_crossjoin_only(spark):
    """Quantization audit: the only non-equi join is the 1-row dim-range
    relation recombination (bounded crossJoin, the semdedup corpus-stats
    pattern); everything else is per-row array math + one label rollup."""
    df = registry.QUERIES["embedding_int8_quantize"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the dim-range recombination is a broadcast nested-loop against a
    # 1-row relation — allowed; a second BNLJ would mean an unbounded one
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    # dim-range agg (+AQE) + final label rollup + order-by; no vector
    # shuffle beyond the posexplode feeding the 64-row dim aggregate
    assert shuffle_count(df) <= 4, plan


def test_cms_topk_bounded_sketch_and_takeordered(spark):
    """The CMS relation is a fixed 4096-row map-side-combinable aggregate
    and the exact top-20 rides TakeOrdered (no global sort shuffle of the
    token counts); every join is an equi-join of bounded relations."""
    try:
        df = registry.QUERIES["token_cms_topk"](spark, SF_DIR)
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
    finally:
        registry.release_persisted()


def test_hll_distinct_mergeable_register_agg(spark):
    """HLL registers come from a bounded (source x 256)-row max-aggregate;
    the exact ground-truth distinct and the sketch side recombine on one
    source equi-join — no cartesian, bounded shuffles."""
    try:
        df = registry.QUERIES["token_hll_distinct"](spark, SF_DIR)
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        # fan_out + the distinct-(source, token) subtree (which the STATIC
        # plan prints once per consumer — register agg and exact count —
        # but AQE computes once at runtime; the reuse is pinned by
        # test_multi_consumer_shuffles_are_exchange_reused) + register
        # agg + source rollups + final join/sort exchanges.  9 static,
        # of which one duplicated (fan_out + distinct) pair collapses at
        # runtime.
        assert shuffle_count(df) <= 9, plan
    finally:
        registry.release_persisted()


def test_bloom_runtime_filter_injected_and_confs_restored(spark):
    """The reference's dynamic JOIN filter analog: the filtered build
    side's keys must reach the probe-side scan as a runtime
    might_contain() predicate (InjectRuntimeFilter), and the builder's
    widened thresholds must NOT leak into the session."""
    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
        )
    }
    df = registry.QUERIES["join_bloom_runtime_filter"](spark, SF_DIR)
    after = {k: spark.conf.get(k, None) for k in before}
    assert before == after, (before, after)
    df.collect()
    plan = executed_plan(df)
    low = plan.lower()
    assert "might_contain" in low, plan
    assert "bloom_filter_agg" in low, plan
    # the bloom predicate must sit on the lineitem (probe) side scan
    probe = [ln for ln in plan.splitlines() if "might_contain" in ln.lower()]
    assert any("l_orderkey" in ln for ln in probe), probe


def test_zorder_layout_prunes_box_scan(spark):
    """Z-order clustering contract, measured at sf0.1 (at sf0.001 the box
    covers a third of the key space, so there is nothing to prune): the
    2-D box over the z-ordered copy must read a small fraction of the
    table's rows via row-group stats — the multi-dimensional analog of
    the point layout's bucket pruning.  Granularity at test SF is the 64
    single-row-group files; at 100 TB it is the 128 MB row group."""
    from datafusion_dynamic_filter_spark.plans import scan_metrics

    sf_dir = "/root/testdata/sf0.1"
    try:
        df = registry.QUERIES["layout_zorder_pruning"](spark, sf_dir)
        df.collect()
        m = scan_metrics(df)
        total = spark.read.parquet(sf_dir + "/orders.parquet").count()
        assert m["scan_output_rows"] < 0.25 * total, (m, total)
    finally:
        # re-point the shared session's temp views at the suite's SF --
        # leaving them on sf0.1 breaks later tests that spark.sql() the
        # same table names against SF_DIR-loaded fixtures
        registry.tables(spark, SF_DIR)


def test_q21_correlated_quantifiers_plan_as_hash_joins(spark):
    """Q21's EXISTS / NOT EXISTS pair must de-correlate into left-semi and
    left-anti HASH joins on l_orderkey — a correlated re-execution or a
    nested-loop here is the plan that dies at 100 TB."""
    df = registry.QUERIES["q21_waiting_suppliers"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q2_q20_decorrelate_no_nested_loop(spark):
    """The correlated MIN (Q2) and correlated half-of-total (Q20) scalars
    must plan as aggregate + equi-join (Catalyst de-correlation), never a
    per-row nested-loop re-execution."""
    for q in ("q2_min_cost_supplier", "q20_potential_promotion"):
        df = registry.QUERIES[q](spark, SF_DIR)
        plan = executed_plan(df)
        assert "CartesianProduct" not in plan, (q, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)


def test_skew_profile_takeordered_no_full_sort(spark):
    """The heavy-hitter top-5 must be a TakeOrdered, not a global sort of
    the per-key counts (the counts relation is key-cardinality-sized)."""
    df = registry.QUERIES["join_key_skew_profile"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_ri_audit_all_edges_equi_joins(spark):
    """Every foreign-key probe must be a hash/sort-merge equi join of the
    child key against the de-duplicated parent keys — one NOT-IN planned
    as a nested loop would dominate the audit at scale."""
    df = registry.QUERIES["audit_referential_integrity"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ewma_in_row_fold_no_window(spark):
    """The EWMA fold happens inside each user's collected row — the plan
    must contain NO Window operator (a windowed cumulative form would
    sort every partition) and only the user_id shuffle + output sort."""
    df = registry.QUERIES["events_ewma_value"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Window" not in plan, plan
    assert shuffle_count(df) <= 2, plan


def test_decile_audit_no_global_window(spark):
    """Decile assignment must come from broadcast percentile bounds + an
    in-row filter — NOT a global ntile Window (single-partition sort of
    the corpus)."""
    df = registry.QUERIES["quality_score_decile_audit"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Window" not in plan, plan
    # the bounds relation must broadcast (1 row), and the score relation
    # must bucket itself row-locally against it
    assert "BroadcastExchange" in plan, plan


def test_scd2_merge_single_full_outer_equi_join(spark):
    """The SCD2 classification must be exactly one full-outer EQUI join on
    the business key (the canonical MERGE plan), never a nested loop."""
    df = registry.QUERIES["scd2_merge_actions"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_join_size_estimate_sketch_bounded(spark):
    """The CMS build must aggregate to the fixed d x w cell grid (bounded
    shuffle payload); the only join is the 1-row x 1-row exact/estimate
    cross join."""
    df = registry.QUERIES["join_size_estimate_cms"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert shuffle_count(df) <= 6, plan


def test_market_basket_pair_join_is_equi_on_order_key(spark):
    """Pair generation must hash/sort-merge on the ORDER key (the a<b
    part rides as a post-join condition) — an all-pairs nested loop over
    items is the plan that dies at 100 TB."""
    df = registry.QUERIES["market_basket_pairs"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the pair join must be an equi hash/SMJ on the order key with the
    # a<b part as a post-join condition
    assert "[l_orderkey" in plan and "[o2" in plan, plan
    # the ONLY nested-loop allowed is the deliberate 1-row totals cross
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rfm_no_global_window_bounds_broadcast(spark):
    """RFM splits at broadcast exact medians — no Window, no global sort
    of the per-customer relation."""
    df = registry.QUERIES["rfm_segmentation"](spark, SF_DIR)
    plan = executed_plan(df)
    assert "Window" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_multi_consumer_shuffles_are_exchange_reused(spark):
    """Several operators feed one aggregated/deduplicated relation to
    multiple consumers (tfidf's TF relation -> DF rollup + scored join;
    market-basket's distinct item set -> both self-join sides + order
    counts + total; the skew profile's per-key counts -> total + scores).
    The scale-correct execution computes that shuffle ONCE.  Spark provides
    this via AQE exchange/stage reuse on identical canonical subtrees, so
    these plans must show a runtime ReusedExchange/ReusedQueryStage rather
    than paying a persist: an r8 A/B measured explicit .persist() of these
    relations 1.05-1.66x SLOWER at sf0.1 (materialization barrier + broken
    whole-stage codegen) than letting AQE reuse the exchange, with
    identical results.  This gate pins the reuse so a refactor that breaks
    subtree canonical-equality (e.g. adding a column to only one consumer)
    is caught as the scale regression it is."""
    from datafusion_dynamic_filter_spark.plans import runtime_exchange_reuse_count

    for name in (
        "text_tfidf_top_terms",
        "market_basket_pairs",
        "join_key_skew_profile",
        # r13: the HLL registers and the exact count share one
        # distinct-(source, token) exchange via AQE reuse (the persisted
        # occurrence-stream form was measured slower at sf0.1 AND is a
        # corpus-sized persist at scale; 3-way A/B in the operator)
        "token_hll_distinct",
    ):
        df = registry.QUERIES[name](spark, SF_DIR)
        assert runtime_exchange_reuse_count(df) >= 1, name
