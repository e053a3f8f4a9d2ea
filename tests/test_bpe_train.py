"""Greedy-merge kernel gate for bpe_train_merges.

Pins the two subtle semantics hand-derivable on a planted corpus:
- overlapping pair COUNTS ("z z z z" counts (z,z) three times) but greedy
  non-overlapping APPLICATION (it merges into "zz zz", two tokens);
- deterministic winner tie-break (freq DESC, then pair_a, pair_b ASC).
"""

import pytest

from datafusion_dynamic_filter_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    rows = [
        (0, "b c b c b c", 11),
        (1, "z z z z", 7),
    ]
    d = tmp_path_factory.mktemp("bpe")
    spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_encode_counts_hand_derived(spark, planted_dir):
    # Same merges as below, but the encoder ALSO applies round 4's winner:
    # doc0: [b c b c b c] -> [bc bc bc] -> [bcbc bc] -> [bcbcbc]  (6 -> 1)
    # doc1: [z z z z] -> greedy non-overlap -> [zz zz]            (4 -> 2)
    rows = registry.QUERIES["bpe_encode_token_counts"](spark, planted_dir).collect()
    got = [(r.doc_id, r.n_tokens_raw, r.n_tokens_bpe, r.compression) for r in rows]
    assert got == [(0, 6, 1, 6.0), (1, 4, 2, 2.0)], got


def test_greedy_rounds_hand_derived(spark, planted_dir):
    rows = registry.QUERIES["bpe_train_merges"](spark, planted_dir).collect()
    got = [(r.round, r.pair_a, r.pair_b, r.freq) for r in rows]
    assert got == [
        # (b,c)=3 ties (z,z)=3 -> 'b' < 'z' wins; merge -> [bc bc bc]
        (1, "b", "c", 3),
        # overlapping count: z z z z has THREE (z,z) adjacencies; greedy
        # apply merges positions 1-2 and 3-4 only -> [zz zz]
        (2, "z", "z", 3),
        # (bc,bc)=2 beats (zz,zz)=1; greedy on [bc bc bc] -> [bcbc bc]
        (3, "bc", "bc", 2),
        # all pairs now freq 1; 'bcbc' < 'zz' tie-break
        (4, "bcbc", "bc", 1),
    ], got
