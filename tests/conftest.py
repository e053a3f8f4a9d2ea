import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dynamic_filter_spark import Engine  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def engine():
    eng = Engine(
        app_name="ddf-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield eng
    eng.spark.stop()


@pytest.fixture(scope="session")
def spark(engine):
    return engine.spark


@pytest.fixture(scope="session")
def users(engine):
    """Reference fixture F1 (tests/preparable_context_basic_test.rs:31-51)."""
    return engine.register_memtable(
        "users",
        [(1, "alice", 100), (2, "bob", 200), (3, "charlie", 300),
         (4, "diana", 400), (5, "eve", 500)],
        "id int, name string, amount int",
    )


@pytest.fixture(scope="session")
def testdata(engine):
    return engine.load_testdata(SF_DIR)
