"""Sketch-relation persist lifecycle: mid-pipeline persists (MinHash
signatures, SimHash edges, CC edge lists) must be released when the next
top-level query build begins — in a long-lived session (driver gate, bench,
user REPL) never-released caches otherwise accumulate until storage memory
is all dead sketches (measured 2.8-4.6x slowdowns of later queries in r2).
"""

import os

from datafusion_dynamic_filter_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

registry.load_all()


def test_sketch_persist_tracked_and_released(spark, testdata):
    registry.release_persisted()
    df = registry.QUERIES["dedup_minhash_lsh"](spark, SF_DIR)
    df.collect()
    assert len(registry._PERSISTED) > 0, "sketch persist should be tracked"
    tracked = list(registry._PERSISTED)

    # The next top-level query build releases the previous query's sketches.
    registry.QUERIES["q1_pricing_summary"](spark, SF_DIR)
    assert registry._PERSISTED == []
    for t in tracked:
        assert not t.storageLevel.useMemory and not t.storageLevel.useDisk


def test_nested_query_builds_do_not_release_mid_build(spark, testdata):
    # dedup_connected_components composes dedup_simhash: the inner
    # registered-query call must not release the outer build's persists.
    registry.release_persisted()
    df = registry.QUERIES["dedup_connected_components"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    # Both the simhash sig and the CC edge relation were tracked.
    assert len(registry._PERSISTED) >= 2
    registry.release_persisted()
    assert registry._PERSISTED == []


def test_release_is_idempotent_and_unpersist_safe(spark, testdata):
    registry.release_persisted()
    registry.release_persisted()
    df = registry.QUERIES["dedup_simhash"](spark, SF_DIR)
    registry.release_persisted()
    # Unpersisted mid-build relation just recomputes — results unchanged.
    assert df.count() >= 0
