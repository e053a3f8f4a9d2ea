#!/usr/bin/env python
"""Runnable tour of the prepared-statement engine — the PySpark twin of the
reference's shipped example (examples/prepared_statements.rs): a users
parquet table, one statement executed with different parameters, multi-
parameter ranges, string parameters, and a parameterized aggregation.

Run from the repo root:

    python examples/prepared_statements.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_dynamic_filter_spark import Engine  # noqa: E402

USERS = [
    (1, "alice", "alice@example.com", 25),
    (2, "bob", "bob@example.com", 30),
    (3, "charlie", "charlie@example.com", 35),
    (4, "diana", "diana@example.com", 28),
    (5, "eve", "eve@example.com", 42),
]


def main() -> None:
    eng = Engine(
        app_name="prepared-statements-example",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    eng.spark.sparkContext.setLogLevel("ERROR")

    # users as a parquet listing table, like the reference example
    # (examples/prepared_statements.rs:75-100).
    path = os.path.join(tempfile.mkdtemp(prefix="ddf_example_"), "users.parquet")
    eng.spark.createDataFrame(
        USERS, "user_id int, username string, email string, age int"
    ).write.parquet(path)
    eng.register_parquet("users", path)

    # 1. One statement, many executions with different parameters
    #    (examples/prepared_statements.rs:103-122).
    stmt = eng.prepare(
        "SELECT user_id, username, email FROM users WHERE user_id = $1"
    )
    stmt.execute({"$1": 2}).show()
    stmt.execute({"$1": 5}).show()

    # 2. Multiple parameters in one predicate
    #    (examples/prepared_statements.rs:124-140).
    rng = eng.prepare(
        "SELECT user_id, username, age FROM users "
        "WHERE user_id >= $1 AND age <= $2"
    )
    rng.execute({"$1": 2, "$2": 35}).show()

    # 3. String parameter (examples/prepared_statements.rs:142-159).
    by_name = eng.prepare(
        "SELECT user_id, username, email FROM users WHERE username = $1"
    )
    by_name.execute({"$1": "charlie"}).show()

    # 4. Parameterized aggregation (examples/prepared_statements.rs:161-176).
    agg = eng.prepare(
        "SELECT COUNT(*) AS user_count FROM users WHERE age >= $1"
    )
    agg.execute({"$1": 30}).show()

    # Beyond the reference example: N keys in ONE batched execution
    # (params-as-data broadcast semi-join, the IN-list regime).
    print("batch of three keys in one job:")
    stmt.execute_batch([[1], [3], [5]]).orderBy("user_id").show()

    # ... and a GROUP BY template batched the same way: one semi-join +
    # one aggregation for the whole parameter set (never a per-key union).
    grouped = eng.prepare(
        "SELECT age, COUNT(*) AS n, MIN(username) AS first_user "
        "FROM users WHERE age = $1 GROUP BY age"
    )
    print("grouped batch (ages 25, 30, 42) in one job:")
    grouped.execute_batch([[25], [30], [42]]).orderBy("age").show()


if __name__ == "__main__":
    main()
