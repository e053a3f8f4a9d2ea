"""Concurrent-planning codegen-mode isolation (r3 review item #5).

The point-lookup jit policy disables wholestage codegen via a session-global
conf for the duration of one physical planning call.  ``_plan_lock``
serializes planning across PreparedStatements, so a statement planning
concurrently on another thread must still get ITS intended codegen mode:
wholestage spans present for ``jit=True``, absent for the nojit policy.
"""

import threading

import pytest

# Parquet-backed scan: a MemTable point lookup would be pre-evaluated by
# ConvertToLocalRelation into a bare LocalTableScan with no codegen span in
# EITHER mode, making the assertion vacuous.
SQL = "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = $1"


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.usefixtures("testdata")
def test_concurrent_planning_keeps_codegen_modes(engine):
    stmt_jit = engine.prepare(SQL, jit=True)
    stmt_nojit = engine.prepare(SQL)  # point lookup -> auto nojit
    assert stmt_nojit._nojit() and not stmt_jit._nojit()

    ROUNDS = 25
    barrier = threading.Barrier(2)
    errors: list[str] = []

    def worker(stmt, want_codegen: bool, label: str):
        for i in range(ROUNDS):
            barrier.wait()
            # Fresh key per round so the plan cache never short-circuits
            # planning; disjoint key ranges per worker.
            key = (1000 if want_codegen else 2000) + i
            try:
                df = stmt.execute({"$1": key})
                plan = _plan_str(df)
                # Compact plan strings mark wholestage spans as "*(n) Op".
                has = "*(" in plan
                if has != want_codegen:
                    errors.append(
                        f"{label} round {i}: WholeStageCodegen "
                        f"{'missing' if want_codegen else 'present'}"
                    )
            except Exception as e:  # pragma: no cover - surfaced via errors
                errors.append(f"{label} round {i}: {e!r}")

    t1 = threading.Thread(target=worker, args=(stmt_jit, True, "jit"))
    t2 = threading.Thread(target=worker, args=(stmt_nojit, False, "nojit"))
    t1.start()
    t2.start()
    t1.join(120)
    t2.join(120)
    assert not errors, errors[:5]


@pytest.mark.usefixtures("testdata")
def test_wholestage_conf_restored_after_planning(engine):
    spark = engine.spark
    before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    stmt = engine.prepare(SQL)
    stmt.execute({"$1": 1}).collect()
    assert spark.conf.get("spark.sql.codegen.wholeStage", "true") == before
