#!/usr/bin/env python
"""Maintain ORACLE_HASHES.json — the mechanical staleness ledger for the
driver-rotation ordering (r8 advice on __spark_entry__).

_SEMANTICS_CHANGED_ROUND was a hand-maintained map ("bump the value
whenever an operator's result contract changes"); forgetting a bump
reproduces the exact stale-green failure it exists to prevent, and nothing
tied the map to operator edits.  This ledger closes that hole for every
ORACLE-BEARING query: a query's result contract IS its oracle SQL, so the
ledger records, per query, a hash of the (whitespace-normalized) oracle
and the round at which that hash last changed.  The rotation in
__spark_entry__._last_green_round discards any green driver row older than
the ledger round, and tests/test_registry_coverage.py fails whenever the
ledger is out of date with the registry — so an oracle edit CANNOT ship
without bumping its own staleness round.  The hand map remains only for
semantics changes invisible to the oracle (rows-only queries, or a Spark
-side rework whose oracle is unchanged but whose old greens should still
be discarded).

Round attribution: "the current round" is inferred as
max(CORRECTNESS_r*.json) + 1 — the round whose driver check has not run
yet.  Entries whose hash is unchanged keep their recorded round; brand-new
entries (first time the ledger sees the query) seed from the hand map
(their pre-ledger history is not mechanically knowable).

Usage: python scripts/update_oracle_hashes.py          # rewrite the ledger
       python scripts/update_oracle_hashes.py --check  # exit 1 if stale
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "ORACLE_HASHES.json")


def current_round() -> int:
    rounds = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            rounds.append(int(m.group(1)))
    return (max(rounds) + 1) if rounds else 1


def oracle_hash(sql: str) -> str:
    """Whitespace-normalized content hash: reformatting an oracle must not
    spuriously invalidate its greens; changing any token must."""
    return hashlib.sha256(" ".join(sql.split()).encode()).hexdigest()[:16]


def build_ledger() -> tuple[dict, list[str]]:
    sys.path.insert(0, REPO)
    from __spark_entry__ import _SEMANTICS_CHANGED_ROUND
    from datafusion_dynamic_filter_spark import registry

    registry.load_all()
    old = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            old = json.load(f)
    rnd = current_round()
    out: dict[str, dict] = {}
    bumped: list[str] = []
    for name, sql in sorted(registry.ORACLES.items()):
        h = oracle_hash(sql)
        prev = old.get(name)
        if prev is not None and prev.get("hash") == h:
            out[name] = prev
        elif prev is None:
            out[name] = {"hash": h, "round": _SEMANTICS_CHANGED_ROUND.get(name, 0)}
        else:
            out[name] = {"hash": h, "round": rnd}
            bumped.append(name)
    return out, bumped


def main() -> int:
    check = "--check" in sys.argv
    out, bumped = build_ledger()
    old = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as f:
            old = json.load(f)
    if check:
        if out != old:
            changed = sorted(
                set(out) ^ set(old)
                | {k for k in set(out) & set(old) if out[k] != old[k]}
            )
            print(
                "ORACLE_HASHES.json is out of date with the registry "
                f"(changed: {changed}); run scripts/update_oracle_hashes.py"
            )
            return 1
        return 0
    with open(LEDGER, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {LEDGER}: {len(out)} oracles, {len(bumped)} bumped: {bumped}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
