"""Gates for the MinHash family's adaptive word-hash switch and the
two-phase prefix-filtered exact verify (r12).

The r11 sf100 stage split priced dedup_lsh_verified's signature front end
at 230 s of its 363 s total — one md5 + hex conv per WORD (~400M calls at
5M docs), the same md5-dominance profile dedup_substring_spans had before
its anchor switch.  md5 is only needed where the DuckDB oracle must
reproduce the sketch bit-for-bit (the driver SFs); above
_MINHASH_XX_MIN_DOCS the per-word hash is pmod(xxhash64(w), HASH_P),
a codegen'd native hash.  Claims pinned here:

1. below the threshold the md5 branch is byte-identical to the
   pre-switch formulation (an independent twin built here from the raw
   h60 expression; the DuckDB oracle-parity suite re-checks the whole
   pipeline end-to-end every run);
2. both branches land in [0, HASH_P) — the shingle-mix / affine
   signature arithmetic's overflow-safety precondition;
3. the two branches are statistically interchangeable: both are content
   hashes of the same words, so the verified near-dup pair sets at
   Jaccard >= 0.8 must agree closely, and EXACT jaccard values must be
   equal on the shared pairs (both branches compute set Jaccard of the
   same underlying shingle sets, modulo ~2^-31-scale hash collisions);
4. the prefix + positional prune is PURE pruning: verified output with
   prefix_verify on and off is byte-identical, and the prune's phase-one
   survivor count sits between the verified-pair count (no false
   negatives) and the raw candidate count (it actually prunes).
"""

import pandas as pd
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.functions import HASH_P, h60, tokens
from datafusion_dynamic_filter_spark.operators import dedup
from datafusion_dynamic_filter_spark.operators.dedup import (
    _MINHASH_XX_MIN_DOCS,
    _SPAN_XX_MIN_DOCS,
    _lsh_candidates,
    _minhash_sig,
    _minhash_verified_pairs,
    _prefix_positional_prune,
)

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"


def test_switch_shares_the_span_parity_boundary():
    """One constant guards both adaptive switches, so the parquet-backed
    test that every oracle-gated SF sits below it
    (test_substring_anchor_switch.test_every_parity_gated_sf_is_below_the_switch)
    covers the MinHash family too."""
    assert _MINHASH_XX_MIN_DOCS == _SPAN_XX_MIN_DOCS


def test_md5_branch_matches_pre_switch_form(spark):
    """With the flag False (every driver SF), the adaptive hw expression
    equals the pre-switch ``h60(w) % HASH_P`` on every word of sf0.01."""
    words = (
        spark.read.parquet(SF001 + "/documents.parquet")
        .select(F.explode(tokens("text")).alias("w"))
        .withColumn("use_xx", F.lit(False))
    )
    adaptive = F.when(
        F.col("use_xx"), F.pmod(F.xxhash64("w"), F.lit(HASH_P))
    ).otherwise(h60("w") % F.lit(HASH_P))
    diff = words.filter(adaptive != h60("w") % F.lit(HASH_P)).count()
    assert diff == 0


def test_both_branches_land_in_hash_range(spark):
    """xxhash64 is SIGNED — pmod (not %) is what keeps the xx branch in
    [0, HASH_P); a negative hw would break the overflow-safety bound of
    the shingle product mix (products must stay < 2^62)."""
    words = (
        spark.read.parquet(SF001 + "/documents.parquet")
        .select(F.explode(tokens("text")).alias("w"))
    )
    row = words.select(
        F.min(F.pmod(F.xxhash64("w"), F.lit(HASH_P))).alias("xlo"),
        F.max(F.pmod(F.xxhash64("w"), F.lit(HASH_P))).alias("xhi"),
        F.min(h60("w") % F.lit(HASH_P)).alias("mlo"),
        F.max(h60("w") % F.lit(HASH_P)).alias("mhi"),
        # the raw signed hash really does go negative on this corpus —
        # i.e. pmod is load-bearing, not decorative
        F.min(F.xxhash64("w")).alias("raw_min"),
    ).first()
    assert 0 <= row.xlo and row.xhi < HASH_P
    assert 0 <= row.mlo and row.mhi < HASH_P
    assert row.raw_min < 0


def test_signature_relation_below_threshold_is_on_md5_branch(spark):
    """End-to-end: _minhash_sig at sf0.01 (500 docs <= threshold) equals
    an independent twin built with the pre-switch md5-only word hash —
    signatures AND sorted element sets."""
    sig = _minhash_sig(spark, SF001, num_hashes=8).orderBy("doc_id")
    t = spark.read.parquet(SF001 + "/documents.parquet")
    from datafusion_dynamic_filter_spark.functions import (
        SHINGLE_K1,
        SHINGLE_K2,
        SHINGLE_K3,
        minhash_agg_columns,
    )

    hws = (
        t.select("doc_id", F.posexplode(tokens("text")).alias("pos", "w"))
        .select("doc_id", "pos", (h60("w") % F.lit(HASH_P)).alias("hw"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "hw"))).alias("ph"))
        .select(
            "doc_id", F.transform("ph", lambda x: x.getField("hw")).alias("hws")
        )
    )
    twin = (
        hws.select(
            "doc_id",
            F.when(
                F.size("hws") >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size("hws") - 2),
                    lambda i: (F.element_at(F.col("hws"), i) * F.lit(SHINGLE_K1))
                    .bitwiseXOR(F.element_at(F.col("hws"), i + 1) * F.lit(SHINGLE_K2))
                    .bitwiseXOR(F.element_at(F.col("hws"), i + 2) * F.lit(SHINGLE_K3)),
                ),
            )
            .otherwise(F.array().cast("array<bigint>"))
            .alias("elems"),
        )
        .select("doc_id", F.explode("elems").alias("h"))
        .withColumn("hp", F.col("h") % F.lit(HASH_P))
        .groupBy("doc_id")
        .agg(
            *minhash_agg_columns("hp", 8),
            F.array_sort(F.collect_set("h")).alias("elems"),
        )
        .orderBy("doc_id")
    )
    a = sig.toPandas()
    b = twin.toPandas()
    pd.testing.assert_frame_equal(a, b)


def _pair_sets(spark):
    pairs = _minhash_verified_pairs(
        spark, SF01, num_hashes=32, bands=16, threshold=0.8, size_prune=True
    )
    return {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}


def test_branches_statistically_interchangeable(spark, monkeypatch):
    """Verified pair sets at t=0.8 on sf0.1: md5 branch vs forced-xx
    branch.  Banding randomness differs (different minima win), so the
    sets need not be identical — but recall at the threshold is ~1 for
    any content hash (P(candidate | J=0.8) ~ 0.99998), so agreement must
    be near-total, and exact jaccard on shared pairs must be EQUAL (both
    branches verify the same underlying shingle sets)."""
    md5_pairs = _pair_sets(spark)
    monkeypatch.setattr(dedup, "_MINHASH_XX_MIN_DOCS", 0)
    xx_pairs = _pair_sets(spark)
    inter = set(md5_pairs) & set(xx_pairs)
    union = set(md5_pairs) | set(xx_pairs)
    assert len(union) > 100  # non-vacuous corpus
    agreement = len(inter) / len(union)
    assert agreement >= 0.95, f"pair-set agreement {agreement:.4f}"
    mismatched = [k for k in inter if md5_pairs[k] != xx_pairs[k]]
    assert not mismatched, f"jaccard drift on shared pairs: {mismatched[:5]}"


def test_prefix_prune_is_pure(spark):
    """prefix_verify on vs off at t=0.8, sf0.1: byte-identical verified
    output, and survivor counts bracket correctly."""
    base = _minhash_verified_pairs(
        spark, SF01, num_hashes=32, bands=16, threshold=0.8, size_prune=True
    )
    pruned = _minhash_verified_pairs(
        spark,
        SF01,
        num_hashes=32,
        bands=16,
        threshold=0.8,
        size_prune=True,
        prefix_verify=True,
    )
    a = base.orderBy("doc_a", "doc_b").toPandas()
    b = pruned.orderBy("doc_a", "doc_b").toPandas()
    pd.testing.assert_frame_equal(a, b)

    sig = _minhash_sig(spark, SF01, num_hashes=32)
    cand = _lsh_candidates(
        sig, num_hashes=32, bands=16, threshold=0.8, size_prune=True
    )
    n_cand = cand.count()
    n_kept = _prefix_positional_prune(sig, cand, 0.8).count()
    n_verified = len(a)
    assert n_verified <= n_kept <= n_cand
    # the prune must actually prune on this corpus — otherwise phase one
    # is pure overhead and the two-phase claim is vacuous here
    assert n_kept < n_cand, (n_kept, n_cand)
