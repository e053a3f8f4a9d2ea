"""Planted-duplicate quality gate for dedup_substring_spans.

The property under test is the one that motivates content-defined
(winnowing-style) anchoring: a passage copied between two documents at
ARBITRARY, non-congruent offsets must still be detected.  A strided
window sampler only matches copies whose positions agree mod the stride —
the planted corpus here shifts the copy by a prime offset precisely to
break any stride-based scheme.
"""

import random
import string

import pytest

from datafusion_dynamic_filter_spark import registry

registry.load_all()

PASSAGE = (
    "this exact licence paragraph is syndicated verbatim across many pages "
    "of the corpus and must be caught by span dedup."
)  # 118 chars >> span_len=40; P(no anchor) = (7/8)^~78 ≈ 3e-5


def _noise(rng, n):
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    rng = random.Random(7)
    rows = [
        # copies of PASSAGE at offsets 13 and 50: 13 != 50 (mod 20), so the
        # old stride-20 sampler would never window-align them.
        (0, _noise(rng, 13) + PASSAGE + _noise(rng, 80)),
        (1, _noise(rng, 50) + PASSAGE + _noise(rng, 40)),
        # unique documents — random 26-letter noise cannot collide on a
        # 40-char window.
        (2, _noise(rng, 200)),
        (3, _noise(rng, 150)),
        # too short for any span: must not appear in the output at all.
        (4, "tiny doc"),
    ]
    d = tmp_path_factory.mktemp("planted")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_planted_copy_detected_across_alignments(spark, planted_dir):
    out = {
        r.doc_id: r
        for r in registry.QUERIES["dedup_substring_spans"](
            spark, planted_dir
        ).collect()
    }
    # both carriers of the planted passage flag duplicated spans
    assert out[0].n_dup_spans >= 1, "copy at offset 13 missed"
    assert out[1].n_dup_spans >= 1, "copy at offset 50 missed"
    # unique documents are clean
    assert out[2].n_dup_spans == 0
    assert out[3].n_dup_spans == 0
    # sub-span_len document emits no spans, hence no row
    assert 4 not in out
    # dup_frac is a valid fraction and consistent with the counts
    for r in out.values():
        assert 0.0 <= r.dup_frac <= 1.0
        assert r.n_dup_spans <= r.n_spans


def test_anchors_are_content_defined(spark, planted_dir):
    """The duplicated spans found in doc 0 and doc 1 are the SAME span
    values (anchors land at identical in-passage offsets in both copies)."""
    from pyspark.sql import functions as F

    from datafusion_dynamic_filter_spark.operators.dedup import (
        SPAN_LEN,
        anchored_spans_sql,
    )

    # re-derive the span relation from the operator's OWN shared span
    # expression (not a copy-pasted literal), keeping the text
    docs = (
        spark.read.parquet(planted_dir + "/documents.parquet")
        .select("doc_id", F.lower(F.trim("text")).alias("txt"))
        .where(F.length("txt") >= SPAN_LEN)
    )
    spans = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(anchored_spans_sql()))).alias("sp"),
    )
    s0 = {r.sp for r in spans.filter("doc_id = 0").collect()}
    s1 = {r.sp for r in spans.filter("doc_id = 1").collect()}
    shared = s0 & s1
    assert shared, "no shared anchored span between the two copies"
    for sp in shared:
        assert sp in PASSAGE.lower() or sp in PASSAGE
