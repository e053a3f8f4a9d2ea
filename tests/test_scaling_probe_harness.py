"""Unit gates for the scaling-probe harness's salvage bookkeeping (r9
advice): a tier that dies mid-run contributes only the probes its sidecar
captured, and the artifact must say so — per-entry ``salvaged_<tier>``
flags plus the actually-measured top-tier probe list — so a consumer
reading probe rows alone cannot mistake a partial tier for a complete
one.  Pure-python: drives _write_artifact against a temp directory."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import scaling_probe  # noqa: E402


def _tier(names, sec=1.0, rows=10, salvaged=()):
    out = {n: {"sec": sec, "rows": rows} for n in names}
    for n in salvaged:
        out[n]["salvaged"] = True
    return out


def test_artifact_marks_salvaged_probes_and_measured_list(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling_probe, "REPO", str(tmp_path))
    lo, hi = "/lo", "/hi"
    xhi, x2hi, x3hi = "/x1", "/x10", "/x100"
    # the top tier "died" after two probes; one sf1 probe was salvaged too
    x3_names = scaling_probe.SF100_PROBES[:2]
    results = {
        lo: _tier(scaling_probe.PROBES),
        hi: _tier(scaling_probe.PROBES, sec=2.0),
        xhi: _tier(
            scaling_probe.SF1_PROBES, sec=4.0,
            salvaged=[scaling_probe.SF1_PROBES[0]],
        ),
        x2hi: _tier(scaling_probe.SF10_PROBES, sec=8.0),
        x3hi: _tier(x3_names, sec=16.0, salvaged=x3_names),
    }
    scaling_probe._write_artifact(
        results, ["x3hi"], ["lo", "hi", "xhi", "x2hi"], lo, hi, xhi, x2hi, x3hi
    )
    art = json.load(open(tmp_path / "SCALING.json"))
    # planned vs measured top-tier lists diverge and both are recorded
    assert art["x3hi_probes"] == scaling_probe.SF100_PROBES
    assert art["x3hi_measured"] == sorted(x3_names)
    assert art["failed_tiers"] == ["x3hi"]
    # per-entry flags: exactly the salvaged probes carry them
    flagged_sf1 = [n for n, p in art["probes"].items() if p.get("salvaged_sf1")]
    assert flagged_sf1 == [scaling_probe.SF1_PROBES[0]]
    flagged_sf100 = [
        n for n, p in art["probes"].items() if p.get("salvaged_sf100")
    ]
    assert sorted(flagged_sf100) == sorted(x3_names)
    # a complete tier carries no flags
    assert not any(p.get("salvaged_sf10") for p in art["probes"].values())
    # exponents still computed for salvaged rows (they are real numbers)
    row = art["probes"][x3_names[0]]
    assert row["sec_sf100"] == 16.0 and row["time_exponent_4dec"] is not None


def test_refresh_reconstruction_preserves_salvaged_failed_tiers(
    tmp_path, monkeypatch
):
    """r10 review: refresh_probe's artifact rewrite reconstructed only
    tiers_complete, so a FAILED tier's salvaged probe rows (real min-of-N
    measurements) were silently erased by any later refresh.  The
    round-trip must preserve them, salvage flags included."""
    import refresh_probe

    monkeypatch.setattr(scaling_probe, "REPO", str(tmp_path))
    lo, hi, x3hi = "/lo", "/hi", "/x100"
    x3_names = scaling_probe.SF100_PROBES[:2]
    results = {
        lo: _tier(scaling_probe.PROBES),
        hi: _tier(scaling_probe.PROBES, sec=2.0),
        x3hi: _tier(x3_names, sec=16.0, salvaged=x3_names),
    }
    scaling_probe._write_artifact(
        results, ["x3hi"], ["lo", "hi"], lo, hi, None, None, x3hi
    )
    prior = json.load(open(tmp_path / "SCALING.json"))
    dirs = {r: prior[r] for r in ("lo", "hi", "x3hi") if prior.get(r)}
    rebuilt = refresh_probe.reconstruct(prior, dirs)
    # the failed tier's salvaged rows survive, flags intact
    assert set(rebuilt[x3hi]) == set(x3_names)
    assert all(rebuilt[x3hi][n]["salvaged"] for n in x3_names)
    assert rebuilt[x3hi][x3_names[0]]["sec"] == 16.0
    # and writing the reconstruction back reproduces the same artifact rows
    scaling_probe._write_artifact(
        rebuilt, ["x3hi"], ["lo", "hi"], lo, hi, None, None, x3hi
    )
    again = json.load(open(tmp_path / "SCALING.json"))
    assert again["x3hi_measured"] == sorted(x3_names)
    assert again["probes"][x3_names[0]]["salvaged_sf100"] is True
    assert again["probes"][x3_names[0]]["sec_sf100"] == 16.0


def test_artifact_writer_is_atomic_and_complete(tmp_path, monkeypatch):
    monkeypatch.setattr(scaling_probe, "REPO", str(tmp_path))
    lo, hi = "/lo", "/hi"
    results = {lo: _tier(scaling_probe.PROBES), hi: _tier(scaling_probe.PROBES)}
    scaling_probe._write_artifact(
        results, [], ["lo", "hi"], lo, hi, None, None, None
    )
    art = json.load(open(tmp_path / "SCALING.json"))
    assert set(art["probes"]) == set(scaling_probe.PROBES)
    assert art["tiers_complete"] == ["lo", "hi"]
    assert art["x3hi_measured"] == []
    assert not os.path.exists(tmp_path / "SCALING.json.tmp")
