"""Planted-near-dup gate for multimodal_phash_dedup.

The r5 parity row for this operator was vacuous (0 rows on both engines at
sf0.01) because the stub decode hashed the WHOLE payload — only byte-exact
payloads ever paired.  The r6 decode is locality-sensitive (shingle-hash
pixel histogram), and this test pins the property that makes the gate
meaningful: a payload with a SMALL edit must still pair with its original,
while unrelated payloads must not.
"""

import random

import pytest

from datafusion_dynamic_filter_spark import registry

registry.load_all()

_WORDS = [f"w{i:03d}" for i in range(400)]


def _doc(rng, n=80):
    return " ".join(rng.choice(_WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    rng = random.Random(11)
    base = _doc(rng)
    toks = base.split()
    toks[40] = "mutated"  # one-token edit: most shingles (hence pixels) shared
    near = " ".join(toks)
    rows = [
        (0, base),
        (1, near),
        (2, _doc(rng)),  # unrelated
        (3, _doc(rng)),  # unrelated
        (4, "too short for a signature"),  # < PHASH_MIN_FEATURES shingles
    ]
    d = tmp_path_factory.mktemp("phash")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_planted_near_dup_pairs_and_unrelated_do_not(spark, planted_dir):
    rows = registry.QUERIES["multimodal_phash_dedup"](spark, planted_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert (0, 1) in pairs, f"one-token edit not detected: {pairs}"
    assert pairs[(0, 1)] <= 3
    # unrelated docs never pair with anything
    for (a, b) in pairs:
        assert {a, b} == {0, 1}, f"false positive pair: {(a, b)}"
