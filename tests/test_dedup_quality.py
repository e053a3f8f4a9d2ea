"""Quality gate for the headline near-dup operator: dedup_lsh_verified's
LSH candidate generation must not lose pairs that the exact all-pairs
formulation finds at the same threshold in the same (shingle) space.
16 bands x 2 rows gives P(candidate | J>=0.8) >= 0.99998 per pair, so at
small SF recall should be exactly 1."""

import os

from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark import registry
from datafusion_dynamic_filter_spark.functions import token_jaccard, tokens, word_shingles

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def _all_pairs_shingle_jaccard(spark, sf_dir, threshold=0.8):
    """Exact all-pairs ground truth (quadratic — small-SF yardstick ONLY;
    the headline operator exists precisely because this does not scale)."""
    t = registry.tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        F.array_distinct(word_shingles(tokens("text"), 3)).alias("sh"),
    ).withColumn("n", F.size("sh"))
    a, b = docs.alias("a"), docs.alias("b")
    size_ok = (F.col("a.n") * 10 >= F.col("b.n") * 8) & (
        F.col("b.n") * 10 >= F.col("a.n") * 8
    )
    return (
        a.join(b, (F.col("a.doc_id") < F.col("b.doc_id")) & size_ok)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(token_jaccard(F.col("a.sh"), F.col("b.sh")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def test_lsh_verified_recall_vs_all_pairs(spark):
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["dedup_lsh_verified"](spark, SF_DIR).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _all_pairs_shingle_jaccard(spark, SF_DIR).collect()
    }
    missed = set(exact) - set(lsh)
    recall = 1 - len(missed) / max(len(exact), 1)
    assert recall >= 0.999, f"LSH lost {len(missed)}/{len(exact)} pairs: {sorted(missed)[:5]}"
    # no false positives: every verified pair is a true >= 0.8 pair
    assert set(lsh) <= set(exact), sorted(set(lsh) - set(exact))[:5]
    for k in exact.keys() & lsh.keys():
        assert abs(exact[k] - lsh[k]) < 1e-9, (k, exact[k], lsh[k])
