"""Decade-over-decade gate logic in scale_probe.py (round-8 verdict ask #1).

The per-replica gate compares each decade against the sf0.1 base only, so a
plan sub-linear in its first decade and super-linear in its second could
pass both sweeps. These tests pin the cross-decade comparison: ratio
computation vs the persisted 10x record, the (REPLICAS/10) x DECADE_TOL
gate, the MIN_SCALED_SEC floor, the SCALE_ALLOW exemption, and — the part
that keeps the gate honest — the refusal to compare records taken under
different environments (N_RUNS / heap / commit), since that ratio would
measure the environment, not the plan.
"""

from __future__ import annotations

import json

import scale_probe as sp

FP = {
    "n_runs": 2,
    "driver_mem": "48g",
    "sf": "/root/testdata/sf0.1",
    "all_queries": True,
    "commit": "a" * 40,
}


def _seed_10x(tmp_path, scaled, fingerprint=FP):
    (tmp_path / "all_x10.json").write_text(
        json.dumps({"fingerprint": fingerprint, "replicas": 10, "scaled": scaled})
    )


def _hi_decade(monkeypatch, tmp_path):
    monkeypatch.setattr(sp, "REPLICAS", 100)
    monkeypatch.setattr(sp, "ALL_QUERIES", True)
    monkeypatch.setattr(sp, "_CACHE_DIR", str(tmp_path))


def test_none_below_hi_decade(monkeypatch, tmp_path):
    monkeypatch.setattr(sp, "REPLICAS", 10)
    monkeypatch.setattr(sp, "_CACHE_DIR", str(tmp_path))
    assert sp._decade_gate({"q": 5.0}, FP) is None


def test_flags_top_decade_acceleration_only(monkeypatch, tmp_path):
    _hi_decade(monkeypatch, tmp_path)
    _seed_10x(tmp_path, {"q_lin": 5.0, "q_accel": 5.1, "q_tiny": 0.001})
    out = sp._decade_gate(
        # q_lin: 8.4x for 10x data — fine. q_accel: the round-8 outlier
        # shape (168.6/5.1 = 33x) — must trip the 15x gate. q_tiny: huge
        # ratio but the scaled run is under the measurement floor.
        {"q_lin": 42.0, "q_accel": 168.6, "q_tiny": 0.5},
        FP,
    )
    assert out["status"] == "ok"
    assert out["gate"] == 15.0
    assert out["superlinear_decade"] == ["q_accel"]
    assert out["n_compared"] == 3


def test_scale_allow_exempt(monkeypatch, tmp_path):
    _hi_decade(monkeypatch, tmp_path)
    allowed = next(iter(sp.SCALE_ALLOW))
    _seed_10x(tmp_path, {allowed: 2.0})
    out = sp._decade_gate({allowed: 200.0}, FP)
    assert out["superlinear_decade"] == []


def test_refuses_missing_10x_record(monkeypatch, tmp_path):
    _hi_decade(monkeypatch, tmp_path)
    out = sp._decade_gate({"q": 5.0}, FP)
    assert out["status"] != "ok" and "no 10x record" in out["status"]


def test_refuses_env_mismatch(monkeypatch, tmp_path):
    _hi_decade(monkeypatch, tmp_path)
    for field, other in [
        ("n_runs", 1),
        ("driver_mem", "8g"),
        ("commit", "b" * 40),
    ]:
        _seed_10x(tmp_path, {"q": 5.0}, {**FP, field: other})
        out = sp._decade_gate({"q": 6.0}, FP)
        assert out["status"] != "ok" and "env mismatch" in out["status"], field
        assert field in out["status"], out["status"]


def test_fingerprint_carries_the_comparability_fields():
    fp = sp._decade_fingerprint("/some/sf")
    assert set(fp) == {"n_runs", "driver_mem", "sf", "all_queries", "commit"}
    assert len(fp["commit"]) == 40
