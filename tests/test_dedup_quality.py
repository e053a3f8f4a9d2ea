"""Quality gate for the headline near-dup operator: dedup_lsh_verified's
LSH candidate generation must not lose pairs that the exact all-pairs
formulation (dedup_ngram_jaccard, lang-blocked) finds at the same
threshold.  16 bands x 2 rows gives P(candidate | J>=0.8) >= 0.99998 per
pair, so at small SF recall should be exactly 1."""

import os

from datafusion_dynamic_filter_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def test_lsh_verified_recall_vs_all_pairs(spark):
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["dedup_lsh_verified"](spark, SF_DIR).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in registry.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    missed = set(exact) - set(lsh)
    recall = 1 - len(missed) / max(len(exact), 1)
    assert recall >= 0.999, f"LSH lost {len(missed)}/{len(exact)} pairs: {sorted(missed)[:5]}"
    # verified jaccard values agree where both found the pair
    for k in set(exact) & set(lsh):
        assert abs(exact[k] - lsh[k]) < 1e-9, (k, exact[k], lsh[k])
