"""Plan introspection — the Spark analog of the reference's pushdown
verification and metrics surface (src/physical.rs:266-268 metrics;
SURVEY.md §4 O2 'verify pushdown happened').

The reference *negotiates* pushdown explicitly (Pre/Post phases,
src/physical.rs:270-336); Spark negotiates internally, so the engine's
contract is observability: these helpers let tests and operators ASSERT that
a bound predicate actually reached the scan, that a join was broadcast, and
that codegen covers the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """String form of the executed (physical) plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters reported by every scan in the plan."""
    plan = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """Raise unless some scan's PushedFilters mentions ``fragment``."""
    filters = pushed_filters(df)
    if not any(fragment.replace(" ", "") in f.replace(" ", "") for f in filters):
        raise AssertionError(
            f"filter fragment {fragment!r} not pushed to any scan; "
            f"pushed = {filters}"
        )


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema column names of the first scan (column-pruning check)."""
    plan = explain_formatted(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]


def broadcast_join_count(df: DataFrame) -> int:
    return executed_plan(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (scale smell test:
    every one of these is a full network repartition at 100 TB)."""
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", executed_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))


def runtime_exchange_reuse_count(df: DataFrame) -> int:
    """Number of reused exchanges/query-stages in the EXECUTED adaptive
    plan.  Unlike the other helpers this one runs the query: under AQE the
    reuse decision is made at runtime, and ``executedPlan`` on an unexecuted
    DataFrame shows the pre-adaptive plan (an r8 audit first read 0 there
    and nearly shipped redundant persists for subtrees Spark already
    deduplicates — see test_multi_consumer_shuffles_are_exchange_reused)."""
    df.collect()
    plan = executed_plan(df)
    return plan.count("ReusedExchange") + plan.count("ReusedQueryStage")


def scan_metrics(df: DataFrame) -> dict:
    """Runtime scan metrics from an EXECUTED plan (collect first) — the
    Spark analog of the reference's per-operator ExecutionPlanMetricsSet
    (src/physical.rs:27,55,266-268).  Sums over every scan node: files and
    parquet row groups actually read (pruning evidence) and rows produced.

    CAVEAT: probe after the plan's FIRST execution.  Driver-side file
    metrics (number/size of files read) are set once when the scan
    materializes its file listing; re-executing the same DataFrame resets
    all metrics and only task-side ones (output rows) repopulate, so a
    re-collected plan reports files_read=0."""
    totals = {"files_read": 0, "bytes_read": 0, "scan_output_rows": 0}
    wanted = {
        "number of files read": "files_read",
        "size of files read": "bytes_read",
        "number of output rows": "scan_output_rows",
    }

    def visit(node):
        name = node.nodeName()
        if "Scan" in name or "InMemoryTableScan" in name:
            metrics = node.metrics()
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                label = kv._2().name().get() if kv._2().name().isDefined() else kv._1()
                key = wanted.get(str(label))
                if key:
                    totals[key] += kv._2().value()
        children = node.children()
        cit = children.iterator()
        while cit.hasNext():
            visit(cit.next())
        # adaptive / query-stage nodes hide their subtree in innerChildren:
        # AdaptiveSparkPlan exposes it via executedPlan(), every
        # *QueryStage (Result/Shuffle/Broadcast/TableCache) via plan()
        if name.startswith("AdaptiveSparkPlan"):
            visit(node.executedPlan())
        elif name.endswith("QueryStage"):
            visit(node.plan())

    try:
        visit(df._jdf.queryExecution().executedPlan())
    except Exception:
        pass  # metrics are best-effort observability, never a failure path
    return totals
