"""Gates for dedup_substring_spans' adaptive anchor-hash switch (r10) and
its Arrow-vectorized span-hash kernel (r11).

The ~sf100 tier measured the per-position md5 anchor test as the
operator's dominant cost (280 s of 413 s — 2.2B md5 calls over the
corpus text).  md5 is only needed where the DuckDB oracle must agree on
anchor POSITIONS exactly (the driver SFs); above _SPAN_XX_MIN_DOCS the
operator runs functions.span_hash_kernel_udf — numpy strided anchoring
and window hashing (r11; r10's interim xxhash64 SQL branch still paid
Catalyst's interpreted per-position HOF lambdas).  Claims pinned here:

1. below the threshold the operator takes the md5 branch and is
   byte-identical to the pre-switch form (the oracle parity suite
   re-checks this end-to-end every run; the expression-level test below
   pins the adaptive SQL form itself);
2. the kernel computes EXACTLY its specification: per doc, the distinct
   mixed polynomial hashes of every span whose gram-prefix hash is
   0 mod modulus — checked against an independent pure-Python
   big-int reference on adversarial inputs (unicode, empty docs,
   embedded duplicate passages, doc-boundary adjacency);
3. the md5 and kernel anchor paths are statistically interchangeable:
   both anchor 1/modulus of positions uniformly and both are
   content-defined, so span density and per-doc dup_frac must agree
   closely — measured at commit time on sf0.1 (4,983 vs 4,979 docs
   emitted, span density ratio 0.9671, mean dup_frac 0.0939 vs 0.0934,
   per-doc mean absolute difference 0.0017).
"""

import statistics

import pandas as pd
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.functions import (
    _POLY_M,
    fan_out,
    span_hash_kernel_udf,
)
from datafusion_dynamic_filter_spark.operators.dedup import (
    _SPAN_XX_MIN_DOCS,
    SPAN_GRAM,
    SPAN_LEN,
    SPAN_MODULUS,
    anchored_spans_sql,
)

SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def test_threshold_separates_driver_sfs_from_scaling_tiers():
    """Every driver SF (sf0.001 ~ 60, sf0.01 ~ 500, sf0.1 ~ 5,000 docs)
    sits at or below the switch; every scaling tier (sf1 = 50k docs up)
    sits above it — so the oracle's parity scope is exactly the md5
    branch and the measured tiers are uniformly on the kernel branch."""
    assert 5_000 <= _SPAN_XX_MIN_DOCS < 50_000


def test_every_parity_gated_sf_is_below_the_switch():
    """The ACTUAL document counts of every SF directory the oracle-parity
    gates run against (driver: sf0.01; pytest: sf0.001 or
    SPARK_GRAFT_TEST_SF_DIR; the byte-identity tests here: sf0.1) must sit
    at or below _SPAN_XX_MIN_DOCS — read from parquet metadata, not
    assumed (r10 advice): a new larger driver SF would otherwise silently
    flip dedup_substring_spans onto the kernel branch and break
    md5-oracle parity with no test noticing."""
    import os

    import pyarrow.parquet as pq

    gated = {
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
    }
    for sf_dir in sorted(gated):
        path = os.path.join(sf_dir, "documents.parquet")
        n = pq.ParquetFile(path).metadata.num_rows
        assert n <= _SPAN_XX_MIN_DOCS, (
            f"{sf_dir} has {n} documents > _SPAN_XX_MIN_DOCS="
            f"{_SPAN_XX_MIN_DOCS}: its oracle parity would run on the "
            "kernel anchor branch, which md5-based DuckDB SQL cannot mirror"
        )


def test_adaptive_expression_matches_md5_below_threshold(spark):
    docs = (
        spark.read.parquet(SF01 + "/documents.parquet")
        .select("doc_id", F.lower(F.trim("text")).alias("txt"))
        .where(F.length("txt") >= 40)
        .withColumn("use_xx", F.lit(False))
    )
    diff = (
        docs.select(
            "doc_id",
            F.expr(anchored_spans_sql(anchor="adaptive")).alias("a"),
            F.expr(anchored_spans_sql(anchor="md5")).alias("m"),
        )
        .filter(F.col("a") != F.col("m"))
        .count()
    )
    assert diff == 0
    # and with the switch live the xx64 branch really is different input
    docs_xx = docs.withColumn("use_xx", F.lit(True))
    same = (
        docs_xx.select(
            F.expr(anchored_spans_sql(anchor="adaptive")).alias("a"),
            F.expr(anchored_spans_sql(anchor="xx64")).alias("x"),
        )
        .filter(F.col("a") != F.col("x"))
        .count()
    )
    assert same == 0


def _dup_fracs(spark, anchor):
    docs = (
        fan_out(spark.read.parquet(SF1 + "/documents.parquet"))
        .select("doc_id", F.lower(F.trim("text")).alias("txt"))
        .where(F.length("txt") >= 40)
    )
    if anchor == "kernel":
        kern = span_hash_kernel_udf(SPAN_LEN, SPAN_GRAM, SPAN_MODULUS)
        spans = docs.select(
            "doc_id",
            F.explode(kern("txt", F.lit(True))).alias("h"),
        )
    else:
        spans = docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.expr(anchored_spans_sql(anchor=anchor)))
            ).alias("sp"),
        ).select("doc_id", F.xxhash64("sp").alias("h"))
    spans = spans.persist()
    reps = spans.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    per_doc = (
        spans.join(reps, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            (
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("dup_frac"),
        )
    )
    out = {r.doc_id: (r.n_spans, r.dup_frac) for r in per_doc.collect()}
    spans.unpersist()
    return out


def test_anchor_paths_statistically_equivalent(spark):
    """md5 (parity branch) vs the numpy kernel (scale branch): the two
    live branches of the shipped operator."""
    md5 = _dup_fracs(spark, "md5")
    xx = _dup_fracs(spark, "kernel")
    common = set(md5) & set(xx)
    # both paths emit (nearly) the same document set: a doc drops out
    # only when NO position anchors under one hash — rare at 1/8 density
    assert len(common) >= 0.99 * max(len(md5), len(xx))
    density = sum(xx[d][0] for d in common) / sum(md5[d][0] for d in common)
    assert 0.9 <= density <= 1.1, density
    m_md5 = statistics.mean(md5[d][1] for d in common)
    m_xx = statistics.mean(xx[d][1] for d in common)
    assert abs(m_md5 - m_xx) < 0.01, (m_md5, m_xx)
    mad = statistics.mean(abs(xx[d][1] - md5[d][1]) for d in common)
    assert mad < 0.02, mad


# --- r11 kernel: exact agreement with an independent reference -----------

_M64 = (1 << 64) - 1


def _mix_int(z: int) -> int:
    """splitmix64 finalizer in pure Python big-ints — written from the
    published constants, independent of the kernel's numpy arithmetic."""
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & _M64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _ref_spans(text: str, span_len=SPAN_LEN, gram=SPAN_GRAM,
               modulus=SPAN_MODULUS) -> list[int]:
    """Per-position big-int reference of the kernel's specification:
    distinct mixed polynomial hashes of every span whose gram-prefix
    hash is 0 mod modulus, as SIGNED 64-bit values, sorted."""
    b = text.encode("utf-8")
    out = set()
    for p in range(len(b) - span_len + 1):
        gh = 0
        for j in range(gram):
            gh = (gh + b[p + j] * pow(_POLY_M, gram - 1 - j, 1 << 64)) & _M64
        if _mix_int(gh) % modulus != 0:
            continue
        sh = 0
        for j in range(span_len):
            sh = (sh + b[p + j] * pow(_POLY_M, span_len - 1 - j, 1 << 64)) & _M64
        v = _mix_int(sh)
        out.add(v - (1 << 64) if v >= (1 << 63) else v)
    return sorted(out)


def _kernel_lists(texts, flags):
    inner = span_hash_kernel_udf(SPAN_LEN, SPAN_GRAM, SPAN_MODULUS).func
    return inner(pd.Series(texts), pd.Series(flags))


def test_kernel_matches_pure_python_reference():
    import random

    random.seed(20260816)
    texts = []
    for _ in range(60):
        n = random.randint(0, 250)
        texts.append(
            "".join(random.choice("abcdefgh çé\U0001F389 \n\t") for _ in range(n))
        )
    # embedded duplicate passages at different offsets (the operator's
    # whole point: content-defined anchors land at the same in-passage
    # offsets in every copy)
    passage = "shared licence boilerplate that is copied verbatim " * 3
    texts.append("xx" + passage + "yy")
    texts.append("a completely different document prefix " + passage)
    texts.append("")  # empty doc
    texts.append("short")  # below span_len
    got = _kernel_lists(texts, [True] * len(texts))
    for i, t in enumerate(texts):
        assert sorted(int(x) for x in got.iloc[i]) == _ref_spans(t), i
    # the embedded copies share spans through the kernel hashes
    s1 = {int(x) for x in got.iloc[-4]}
    s2 = {int(x) for x in got.iloc[-3]}
    assert s1 and s1 <= s2


def test_kernel_respects_use_xx_and_doc_boundaries():
    # two docs that, concatenated, would contain anchoring windows across
    # the boundary: the kernel masks them (windows never span documents)
    a = "A" * 39  # no full window alone
    b = "B" * 39
    got = _kernel_lists([a, b], [True, True])
    assert len(got.iloc[0]) == 0 and len(got.iloc[1]) == 0
    # per-row use_xx gating: False rows cost nothing and emit nothing
    texts = ["the same long document body " * 5] * 3
    got = _kernel_lists(texts, [True, False, True])
    assert list(got.iloc[0]) == list(got.iloc[2]) == _ref_spans(texts[0])
    assert len(got.iloc[1]) == 0
    # all-False batches short-circuit to empties
    got = _kernel_lists(texts, [False, False, False])
    assert all(len(v) == 0 for v in got)


def test_kernel_anchor_density_is_one_over_modulus():
    """On random text the mixed gram hash must anchor ~1/modulus of
    positions — the uniformity claim behind 'statistically equivalent to
    md5 anchoring' (md5's density comes from the same argument)."""
    import random

    random.seed(3)
    text = "".join(random.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(200_000))
    spans = _ref_spans_count(text)
    n_pos = len(text.encode()) - SPAN_LEN + 1
    density = spans / n_pos
    assert abs(density - 1 / SPAN_MODULUS) < 0.01, density


def _ref_spans_count(text: str) -> int:
    """Anchor COUNT (not distinct hashes) via the kernel itself — distinct
    collapse is negligible on random text."""
    got = _kernel_lists([text], [True])
    return len(got.iloc[0])


def test_kernel_rejects_invalid_geometry():
    """gram is the span window's PREFIX: gram > span_len would mis-shape
    the kernel's per-position arrays inside an executor; the constructor
    rejects it (and non-positive modulus) at plan-build time instead."""
    import pytest

    with pytest.raises(ValueError, match="gram <= span_len"):
        span_hash_kernel_udf(8, 40, 8)
    with pytest.raises(ValueError, match="gram"):
        span_hash_kernel_udf(40, 0, 8)
    with pytest.raises(ValueError, match="modulus"):
        span_hash_kernel_udf(40, 8, 0)
