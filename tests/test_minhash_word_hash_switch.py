"""Gates for the MinHash family's adaptive signature-build switch and the
two-phase prefix-filtered exact verify (r12).

The r11 sf100 stage split priced dedup_lsh_verified's signature front end
at 230 s of its 363 s total — one md5 + hex conv per WORD (~400M calls at
5M docs) plus two 400M-row doc_id aggregations.  md5 is only needed where
the DuckDB oracle must reproduce the sketch bit-for-bit (the driver SFs);
above _MINHASH_XX_MIN_DOCS the WHOLE sketch (signature + distinct shingle
set) is computed map-side by ``functions.minhash_kernel_udf`` — one
Arrow/numpy pass, no explode, no collect_list exchange.  Claims pinned:

1. below the threshold the md5 branch is byte-identical to the
   pre-switch formulation (an independent twin built here from the raw
   h60 expression; the DuckDB oracle-parity suite re-checks the whole
   pipeline end-to-end every run);
2. the kernel computes EXACTLY its specification — ASCII-whitespace word
   split, Horner/_POLY_M + splitmix64 word hash mod HASH_P, the SQL
   branch's shingle mix and affine signature family — checked against an
   independent pure-Python big-int reference on adversarial inputs
   (unicode, empty docs, sub-3-word docs, repeated words, long words),
   and respects per-row use_xx gating;
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
import pytest
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.functions import (
    _POLY_M,
    HASH_P,
    MINHASH_A,
    MINHASH_B,
    SHINGLE_K1,
    SHINGLE_K2,
    SHINGLE_K3,
    h60,
    minhash_kernel_udf,
    tokens,
)
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

_M64 = (1 << 64) - 1
_WS = {0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20}


def test_switch_shares_the_span_parity_boundary():
    """One constant guards both adaptive switches, so the parquet-backed
    test that every oracle-gated SF sits below it
    (test_substring_anchor_switch.test_every_parity_gated_sf_is_below_the_switch)
    covers the MinHash family too."""
    assert _MINHASH_XX_MIN_DOCS == _SPAN_XX_MIN_DOCS


# -- kernel vs pure-Python reference ---------------------------------------


def _mix_int(z: int) -> int:
    z &= _M64
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & _M64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _ref_minhash(text: str, num_hashes: int):
    """Big-int reference of minhash_kernel_udf's specification."""
    words, cur = [], []
    for byte in text.encode("utf-8"):
        if byte in _WS:
            if cur:
                words.append(cur)
                cur = []
        else:
            cur.append(byte)
    if cur:
        words.append(cur)
    hws = []
    for w in words:
        h = 0
        for byte in w:
            h = (h * _POLY_M + byte) & _M64
        hws.append(_mix_int(h) % HASH_P)
    if len(hws) < 3:
        return [], []
    elems = [
        (hws[i] * SHINGLE_K1) ^ (hws[i + 1] * SHINGLE_K2) ^ (hws[i + 2] * SHINGLE_K3)
        for i in range(len(hws) - 2)
    ]
    sig = [
        min(((e % HASH_P) * MINHASH_A[i] + MINHASH_B[i]) % HASH_P for e in elems)
        for i in range(num_hashes)
    ]
    return sig, sorted(set(elems))


def _kernel_frames(texts, flags, num_hashes=8):
    inner = minhash_kernel_udf(num_hashes).func
    return inner(pd.Series(texts), pd.Series(flags))


def test_kernel_matches_pure_python_reference():
    import random

    random.seed(20260816)
    texts = []
    for _ in range(50):
        n = random.randint(0, 200)
        texts.append(
            "".join(random.choice("abc defg\thi\njk çé\U0001F389 ") for _ in range(n))
        )
    texts += [
        "",  # empty doc
        "one",  # 1 word — no shingles
        "two words",  # 2 words — no shingles
        "exactly three words",  # single shingle
        "w " * 50,  # one repeated word: 1 distinct shingle, 48 positions
        "x" * 5000 + " y z w",  # pathological long word
        "  leading and trailing   whitespace  ",
    ]
    got = _kernel_frames(texts, [True] * len(texts))
    for i, t in enumerate(texts):
        sig, elems = _ref_minhash(t, 8)
        assert [int(x) for x in got["sig"].iloc[i]] == sig, i
        assert [int(x) for x in got["elems"].iloc[i]] == elems, i
        # range invariants the downstream arithmetic depends on
        assert all(0 <= int(x) < HASH_P for x in got["sig"].iloc[i])
        assert all(0 <= int(x) < (1 << 63) for x in got["elems"].iloc[i])


def test_kernel_respects_use_xx_gating():
    texts = ["some shared document body here " * 3] * 3
    got = _kernel_frames(texts, [True, False, True])
    ref_sig, ref_elems = _ref_minhash(texts[0], 8)
    for i in (0, 2):
        assert [int(x) for x in got["sig"].iloc[i]] == ref_sig
        assert [int(x) for x in got["elems"].iloc[i]] == ref_elems
    assert len(got["sig"].iloc[1]) == 0 and len(got["elems"].iloc[1]) == 0
    # all-False batches short-circuit
    got = _kernel_frames(texts, [False] * 3)
    assert all(len(v) == 0 for v in got["elems"])


def _ref_md5_minhash(toks, num_hashes):
    """Independent pure-Python big-int reference of the md5-exact parity
    kernel: per token ARRAY (the kernel's input — tokenization happens
    SQL-side), h60-mod-P word hashes, the shingle mix, affine minima, and
    the sorted distinct element set."""
    import hashlib

    hws = [
        int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16) % HASH_P
        for w in toks
    ]
    if len(hws) < 3:
        return [], []
    elems = [
        (hws[i] * SHINGLE_K1) ^ (hws[i + 1] * SHINGLE_K2) ^ (hws[i + 2] * SHINGLE_K3)
        for i in range(len(hws) - 2)
    ]
    sig = [
        min(((e % HASH_P) * MINHASH_A[i] + MINHASH_B[i]) % HASH_P for e in elems)
        for i in range(num_hashes)
    ]
    return sig, sorted(set(elems))


def test_md5_kernel_matches_pure_python_reference():
    """The r13 md5-exact parity kernel (md5_minhash_kernel_udf) on
    adversarial token arrays: unicode, empty-string tokens (the tokens()
    leading-whitespace artifact), sub-3-word docs, None rows, repeated
    words, values above 2^53 (float-corruption guard)."""
    from datafusion_dynamic_filter_spark.functions import md5_minhash_kernel_udf

    tok_lists = [
        [],  # no tokens
        ["one"],
        ["two", "words"],
        ["exactly", "three", "words"],
        ["", "a", "b", "c"],  # leading empty-string token artifact
        ["w"] * 50,
        ["çé", "\U0001F389", "mixed", "unicode", "tokens"],
        None,  # NULL token array row
        ["x" * 5000, "y", "z", "w"],
    ]
    inner = md5_minhash_kernel_udf(8).func
    got = inner(pd.Series(tok_lists, dtype=object))
    for i, toks in enumerate(tok_lists):
        sig, elems = _ref_md5_minhash(toks or [], 8)
        assert [int(x) for x in got["sig"].iloc[i]] == sig, i
        assert [int(x) for x in got["elems"].iloc[i]] == elems, i
        assert all(0 <= int(x) < HASH_P for x in got["sig"].iloc[i])
        assert all(0 <= int(x) < (1 << 63) for x in got["elems"].iloc[i])


def test_kernel_rejects_bad_num_hashes():
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_kernel_udf(0)
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_kernel_udf(len(MINHASH_A) + 1)


# -- md5 parity branch byte-identity ---------------------------------------


def test_signature_relation_below_threshold_is_on_md5_branch(spark):
    """End-to-end: _minhash_sig at sf0.01 (500 docs <= threshold) equals
    an independent twin built with the pre-switch md5-only word hash —
    signatures AND sorted element sets."""
    sig = _minhash_sig(spark, SF001, num_hashes=8).orderBy("doc_id")
    t = spark.read.parquet(SF001 + "/documents.parquet")
    from datafusion_dynamic_filter_spark.functions import minhash_agg_columns

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


# -- branch interchangeability & prefix prune -------------------------------


def _pair_sets(spark):
    pairs = _minhash_verified_pairs(
        spark, SF01, num_hashes=32, bands=16, threshold=0.8, size_prune=True
    )
    return {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}


def test_branches_statistically_interchangeable(spark, monkeypatch):
    """Verified pair sets at t=0.8 on sf0.1: md5 branch vs forced-kernel
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


def test_prefix_prune_is_pure_on_kernel_branch(spark, monkeypatch):
    """Forced-KERNEL twin of test_prefix_prune_is_pure (r12 verdict #1):
    the kernel's elems lexsort must use SIGNED long order — the total
    order of the md5 branch's array_sort and of the signed array_min /
    e < x arithmetic in _prefix_positional_prune.  An unsigned-keyed sort
    would give the prefix slice and the positional bound different total
    orders on the kernel branch, silently over-pruning qualifying pairs
    exactly where the docstring advertises prefix_verify=True (above the
    switch threshold); this combination was untested before r13 because
    the md5-branch purity test runs below the threshold."""
    monkeypatch.setattr(dedup, "_MINHASH_XX_MIN_DOCS", 0)
    a = (
        _minhash_verified_pairs(
            spark, SF001, num_hashes=32, bands=16, threshold=0.8,
            size_prune=True,
        )
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    b = (
        _minhash_verified_pairs(
            spark, SF001, num_hashes=32, bands=16, threshold=0.8,
            size_prune=True, prefix_verify=True,
        )
        .orderBy("doc_a", "doc_b")
        .toPandas()
    )
    assert len(a) > 0  # non-vacuous: the corpus must yield verified pairs
    pd.testing.assert_frame_equal(a, b)
