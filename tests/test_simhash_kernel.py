"""Gates for the r13 md5-exact SimHash signature kernel
(functions.md5_simhash_kernel_udf).

The exploded JVM pipeline it replaced (one md5 per token occurrence,
token-level doc_id exchange into the 60-vote-column aggregation —
simhash_agg_columns + simhash_from_votes, kept exported as the twin)
is rebuilt here and the kernel must match it BYTE-FOR-BYTE end-to-end
at sf0.01, because the DuckDB oracles of every consumer
(dedup_simhash, dedup_simhash_partners, dedup_graph_degree_histogram,
dedup_connected_components) reproduce exactly that arithmetic.  A
pure-Python big-int reference pins the kernel itself on adversarial
token lists."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from datafusion_dynamic_filter_spark.functions import (
    SIMHASH_BITS,
    distinct_tokens,
    h60,
    md5_simhash_kernel_udf,
    simhash_agg_columns,
    simhash_from_votes,
)

SF001 = "/root/testdata/sf0.01"

# NOTE: the `spark` fixture comes from conftest (session-scoped shared
# engine).  Never create-and-stop a local session here: getOrCreate
# returns the shared one, and stop() kills it for every later test
# module in the run.


def _ref_simhash(toks):
    """Independent pure-Python big-int reference: full h60 per token,
    per-bit ±1 vote sums, bit set iff votes > 0."""
    hs = [
        int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16) for w in toks
    ]
    sig = 0
    for j in range(SIMHASH_BITS):
        votes = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if votes > 0:
            sig |= 1 << j
    return sig


def test_kernel_matches_pure_python_reference():
    tok_lists = [
        [],  # no tokens -> NULL
        ["one"],
        ["", "a", "b"],  # empty-string token artifact
        ["çé", "\U0001F389", "unicode"],
        ["w"] * 200,  # vote sums beyond int8 range
        ["x" * 5000, "y"],
        None,  # NULL array -> NULL
        ["repeat", "repeat2", "repeat3", "zed"],
    ]
    inner = md5_simhash_kernel_udf().func
    got = inner(pd.Series(tok_lists, dtype=object))
    for i, toks in enumerate(tok_lists):
        if toks is None or len(toks) == 0:
            assert pd.isna(got.iloc[i]), i
        else:
            assert int(got.iloc[i]) == _ref_simhash(toks), i
            assert 0 <= int(got.iloc[i]) < (1 << SIMHASH_BITS)


def test_kernel_matches_exploded_jvm_twin(spark):
    """End-to-end at sf0.01 (500 docs): kernel signatures equal the
    exploded simhash_agg_columns/simhash_from_votes pipeline's — the
    form every consumer's DuckDB oracle reproduces."""
    docs = (
        spark.read.parquet(SF001 + "/documents.parquet")
        .select("doc_id", distinct_tokens("text").alias("tok"))
    )
    kern = md5_simhash_kernel_udf().asNondeterministic()
    got = (
        docs.select("doc_id", kern("tok").alias("sig"))
        .where(F.col("sig").isNotNull())
        .orderBy("doc_id")
    )
    twin = (
        docs.select("doc_id", F.explode("tok").alias("t"))
        .select("doc_id", h60("t").alias("h"))
        .groupBy("doc_id")
        .agg(*simhash_agg_columns("h"))
        .select("doc_id", simhash_from_votes().alias("sig"))
        .orderBy("doc_id")
    )
    a = got.toPandas()
    b = twin.toPandas()
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_kernel_long_document_memory_bounded():
    """r14 (r13 verdict #1): the kernel's peak allocation must stay
    O(words) — ~tens of bytes per word occurrence — not O(words x 60).
    A 2M-word document under the old bit-matrix form allocated ~1.4 GB
    of temporaries (uint64 broadcast + int32 copy); the per-bit pass
    form stays under ~150 MB including the hw array and pandas input.
    numpy allocations are tracked by tracemalloc (PyTraceMalloc_Track),
    so the peak is measurable in-process.  Correctness of the same
    batch is pinned against the pure-Python reference on a sample."""
    import tracemalloc

    n_words = 2_000_000
    # ~58k distinct words so the md5 memo stays small while the word
    # STREAM is long (the hazard scales with occurrences, not vocab).
    toks = [f"w{i % 58_333}" for i in range(n_words)]
    inner = md5_simhash_kernel_udf().func
    tracemalloc.start()
    got = inner(pd.Series([toks, ["a", "b", "c"]], dtype=object))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 250 * 1024 * 1024, f"peak {peak/1e6:.0f} MB"
    assert int(got.iloc[1]) == _ref_simhash(["a", "b", "c"])
    # spot-check the long doc against the reference on its DISTINCT
    # hash multiset via a cheaper equivalent: same votes per bit
    assert int(got.iloc[0]) == _ref_simhash(toks)
