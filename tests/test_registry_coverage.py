"""Registry hygiene gates (round-2 verdict items):

- every module under operators/ must contribute registered queries (a dead
  module silently drops its oracle corpus from the driver surface);
- query builders must not run driver-side Spark actions (collect/first/
  toPandas/count) during plan construction — the one allowed action is the
  semantic point of prepared_repeat_execution in relational.py.
"""

import os
import pathlib
import re

from datafusion_dynamic_filter_spark import registry

registry.load_all()

PKG = pathlib.Path(__file__).resolve().parents[1] / "datafusion_dynamic_filter_spark"
OPERATOR_MODULES = sorted(
    p.stem for p in (PKG / "operators").glob("*.py") if p.stem != "__init__"
)

# module -> one query it is expected to register (existence proves import ran)
_ACTION_RE = re.compile(r"\.(collect|first|toPandas|count|head|take)\(\)")
_ALLOWED_ACTION_LINES = {
    # The semantic point of prepared_repeat_execution: two executions of
    # one statement, the first consumed inside the builder by design.
    ("relational.py", 'stmt.execute({"$1": 1}).collect()'),
    # cc_resolve's convergence probe: one scalar job per round over the
    # just-checkpointed n-row label table (limit(1) short-circuits), the
    # GraphX/Pregel loop-control norm.  A data-dependent fixpoint loop
    # cannot terminate without observing a scalar; no rows reach the
    # driver.  Allowlisted by exact line so any OTHER action added to
    # pipeline.py still trips the gate.
    (
        "pipeline.py",
        'changed = new.filter(F.col("component") != F.col("prev_component")).limit(1).count()',
    ),
}


def test_every_operator_module_registers_queries():
    import importlib

    for mod_name in OPERATOR_MODULES:
        mod = importlib.import_module(
            f"datafusion_dynamic_filter_spark.operators.{mod_name}"
        )
        registered = [
            name
            for name, fn in registry.QUERIES.items()
            if getattr(fn, "__module__", "") == mod.__name__
        ]
        assert registered, (
            f"operators/{mod_name}.py registers no queries — dead module "
            "(round-1 verdict: functions_coverage was silently unregistered)"
        )


def test_no_driver_side_actions_in_builders():
    offenders = []
    for path in sorted((PKG / "operators").glob("*.py")):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            if _ACTION_RE.search(line):
                key = (path.name, line.strip())
                if key not in _ALLOWED_ACTION_LINES:
                    offenders.append(f"{path.name}:{lineno}: {line.strip()}")
    assert not offenders, (
        "Spark actions inside operator builders (driver-side job during plan "
        "construction): " + "; ".join(offenders)
    )


# Every F.broadcast() in the package must name a relation that is BOUNDED
# independent of corpus size (dims, centroids, planes, query batches,
# user-supplied params, 1-row scalars).  An unbounded relation behind a
# broadcast hint bypasses autoBroadcastJoinThreshold and OOMs at scale —
# the r6 verdict's scale-killer (candidate pair sets grew with the data).
# Unbounded relations get NO hint: AQE/the static planner broadcast them
# at runtime exactly when the measured/estimated size is small.
_BROADCAST_RE = re.compile(r"F\.broadcast\(")
_ALLOWED_BROADCAST_LINES = {
    # TPC-H star dims: nation is 25 rows and region 5 rows at EVERY scale
    # factor (fixed-cardinality dimensions) — the canonical always-broadcast
    # relations.
    ("operators/tpch.py", "n1 = F.broadcast("),
    ("operators/tpch.py", "n2 = F.broadcast("),
    ("operators/tpch.py", 'reg = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))'),
    (
        "operators/tpch.py",
        '.join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))',
    ),
    # k-means: the k-row centroid relation (k=4 x 64 doubles, KB-sized at
    # every corpus scale — cluster state, not data).
    ("operators/similarity.py", "emb.crossJoin(F.broadcast(cent_row))"),
    # adaptive-band LSH (r8): the 1-row corpus-count relation that the
    # in-plan band width b_eff derives from — bounded by construction.
    ("operators/similarity.py", ".crossJoin(F.broadcast(nrel))"),
    # power iteration: the 1-row direction-vector relation (d doubles).
    ("operators/similarity.py", "y = emb.crossJoin(F.broadcast(xdf)).select("),
    # PMI: the 1-row (t_bi, t_uni) corpus-totals relation.
    ("operators/text.py", ".crossJoin(F.broadcast(tot))"),
    # skew profiler: the 1-row (total, n_keys) relation.
    ("operators/relational.py", "counts.crossJoin(F.broadcast(tot))"),
    # decile audit: the 1-row nine-boundary percentile relation.
    ("operators/curation.py", "bucketed = s.crossJoin(F.broadcast(bounds)).select("),
    # market basket: the 1-row distinct-order-count relation.
    ("operators/relational.py", ".crossJoin(F.broadcast(tot))"),
    # RFM: the 1-row (horizon, two medians) bounds relation.
    ("operators/relational.py", "scored = rfm.crossJoin(F.broadcast(bounds)).select("),
    # CUSUM: the 1-row (mu, sigma) global reference relation.
    ("operators/events.py", 'ev = t["events"].crossJoin(F.broadcast(stats)).select('),
    # prepared JOIN templates: the point-filtered side of the bound join —
    # the dynamic-filter analogue; a point/param filter makes it small.
    ("simple_parser.py", "df = F.broadcast(df)"),
    ("simple_parser.py", "jdf = F.broadcast(jdf)"),
    # user-supplied IN-list params: bounded by the param count.
    ("simple_parser.py", 'df = df.join(F.broadcast(params_df), cond, "left_semi")'),
    # ANN query batches / their bucket keys / their vectors: bounded by
    # the probe batch, not the corpus.
    ("operators/similarity.py", "F.broadcast(queries)"),
    ("operators/similarity.py", "F.broadcast(qblk)"),
    # adaptive-IVF probe ring: query batch x (s_eff + 1 <= 13) probes,
    # ids + ints only (vectors join back after candidate generation).
    ("operators/similarity.py", "F.broadcast(qprobe)"),
    ("operators/similarity.py", '.join(F.broadcast(qv), "q_id")'),
    ("operators/similarity.py", "cand = F.broadcast(queries).join("),
    ("operators/similarity.py", "F.broadcast(probes)"),
    # k-row centroid relations (IVF cells / semantic-dedup clusters).
    ("operators/similarity.py", "emb.crossJoin(F.broadcast(centv))"),
    ("operators/similarity.py", 'joined = emb.join(F.broadcast(cent), "label")'),
    ("operators/dedup.py", "scored = emb.crossJoin(F.broadcast(cent)).select("),
    # 1-row corpus-stats relation (count + label count) feeding the
    # declarative n_sub formula in dedup_semdedup.
    ("operators/dedup.py", ".crossJoin(F.broadcast(stats))"),
    # 1-row document-count relation feeding the substring-span
    # anchor-hash switch (r10, _SPAN_XX_MIN_DOCS).
    ("operators/dedup.py", "docs.crossJoin(F.broadcast(nrel))"),
    # (the r12 MinHash-switch count-flag crossJoin was removed in r13 —
    # that branch gate now reads parquet footer metadata at plan build
    # time, see dedup._documents_row_count)
    # fixed 4-row histogram bin relation.
    (
        "operators/events.py",
        "e.join(F.broadcast(bins), (e.value >= bins.lo) & (e.value < bins.hi))",
    ),
    # eval-suite n-grams: bounded by the benchmark suite, not the corpus.
    ("operators/curation.py", '.join(F.broadcast(eval_grams), "g")'),
    # TPC-H dims (25-row nation, 5-row region).
    (
        "operators/relational.py",
        '.join(F.broadcast(t["nation"]), t["customer"].c_nationkey == t["nation"].n_nationkey)',
    ),
    (
        "operators/relational.py",
        '.join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)',
    ),
    # 1-row relations: the BPE round winner and a COUNT(*) scalar.
    ("operators/text.py", 'docs.crossJoin(F.broadcast(w.select("a", "b")))'),
    ("operators/text.py", ".crossJoin(F.broadcast(n))"),
    # BM25: |query-terms|-row document-frequency relation and the 1-row
    # corpus-stats (count + total length) relation.
    ("operators/text.py", 'tf.join(F.broadcast(dfreq), "term")'),
    ("operators/text.py", ".crossJoin(F.broadcast(stats))"),
}


def test_no_unbounded_broadcast_hints():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            if _BROADCAST_RE.search(line):
                if (rel, line.strip()) not in _ALLOWED_BROADCAST_LINES:
                    offenders.append(f"{rel}:{lineno}: {line.strip()}")
    assert not offenders, (
        "F.broadcast() of a relation not in the bounded-relation allowlist "
        "(hints bypass autoBroadcastJoinThreshold; unbounded relations must "
        "be left to AQE): " + "; ".join(offenders)
    )


def test_oracle_coverage_ratio():
    """Nearly all registered queries must carry a DuckDB oracle; the few
    genuinely non-SQL-expressible ones are named here explicitly."""
    no_oracle = sorted(set(registry.QUERIES) - set(registry.ORACLES))
    # Rows-only is acceptable ONLY for genuinely non-SQL-expressible ops
    # (custom stateful streaming); every name added here needs a reason.
    allowed = {name for name in no_oracle if name.startswith("streaming_")}
    unexpected = [n for n in no_oracle if n not in allowed]
    assert not unexpected, (
        f"queries without oracles (round-1 verdict: sketch ops must gain "
        f"DuckDB-computable oracles): {unexpected}"
    )


def test_operator_index_is_fresh():
    """OPERATORS.md (the human-readable registry projection) must list every
    registered query — regenerate with scripts/gen_operator_index.py after
    adding an operator."""
    idx = (PKG.parent / "OPERATORS.md").read_text()
    missing = [n for n in registry.QUERIES if f"`{n}`" not in idx]
    assert not missing, f"stale OPERATORS.md, missing: {missing}"


def test_oracle_hash_ledger_current():
    """ORACLE_HASHES.json (the mechanical staleness ledger behind the
    driver-rotation ordering — see scripts/update_oracle_hashes.py) must
    match the live registry: an oracle edit that ships without
    regenerating the ledger would leave pre-change greens counting as
    evidence for the new contract, the exact drift the r8 advice flagged
    in the hand-maintained _SEMANTICS_CHANGED_ROUND map."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "update_oracle_hashes",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "update_oracle_hashes.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    import json

    with open(mod.LEDGER) as f:
        committed = json.load(f)
    current, _ = mod.build_ledger()
    assert current == committed, (
        "ORACLE_HASHES.json out of date; run scripts/update_oracle_hashes.py"
    )


def test_rotation_uses_oracle_ledger_rounds():
    """A green correctness row older than the query's ledger round must be
    discarded by the rotation (the mechanical layer of the staleness
    guard), exactly as hand-map rounds are."""
    import __spark_entry__ as e

    oracle_rounds = e._oracle_changed_round()
    assert oracle_rounds, "ledger missing or unreadable"
    last = e._last_green_round()
    for name, changed in oracle_rounds.items():
        got = last.get(name)
        assert got is None or got >= changed, (
            f"{name}: green from r{got} predates oracle change r{changed}"
        )
