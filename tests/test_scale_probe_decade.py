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
        # shape (168.6/5.1 = 33x) — must trip the 15x gate. q_tiny: a huge
        # ratio of two sub-floor times — denominator-floored, listed not
        # ratio'd (round-9 ask #4).
        {"q_lin": 42.0, "q_accel": 168.6, "q_tiny": 0.5},
        FP,
    )
    assert out["status"] == "ok"
    assert out["gate"] == 15.0
    assert out["superlinear_decade"] == ["q_accel"]
    assert out["n_compared"] == 2
    assert out["below_floor"] == ["q_tiny"]
    assert out["n_below_floor"] == 1
    assert "q_tiny" not in out["ratios"]


def test_denominator_floor_cannot_flap_the_gate(monkeypatch, tmp_path):
    """The round-9 dedup_exact_documents shape: 10x scaled time well under
    the floor, hi-decade time above MIN_SCALED_SEC, ratio arithmetic alone
    reading near the gate — must be recorded below_floor, never superlinear.
    A genuine accelerator whose denominator CLEARS the floor still trips."""
    _hi_decade(monkeypatch, tmp_path)
    _seed_10x(tmp_path, {"q_noise": 0.1, "q_real": 0.6})
    out = sp._decade_gate({"q_noise": 1.4, "q_real": 60.0}, FP)
    assert out["status"] == "ok"
    assert out["below_floor"] == ["q_noise"]
    assert out["superlinear_decade"] == ["q_real"]


def test_refuses_partial_10x_record(monkeypatch, tmp_path):
    """Round-9 advice: a 10x sweep recorded with per-query errors must not
    be gated against — names whose 10x run crashed would escape the decade
    comparison while the surface reads green."""
    _hi_decade(monkeypatch, tmp_path)
    (tmp_path / "all_x10.json").write_text(
        json.dumps(
            {
                "fingerprint": FP,
                "replicas": 10,
                "scaled": {"q": 5.0},
                "partial": True,
                "errors": {"q_crashed": "scaled: OOM"},
            }
        )
    )
    out = sp._decade_gate({"q": 6.0}, FP)
    assert out["status"] != "ok" and "partial" in out["status"]


def test_refuses_uncompared_names(monkeypatch, tmp_path):
    """A name timed at the hi decade but absent from the 10x record has no
    decade evidence at all — fail closed instead of silently dropping it."""
    _hi_decade(monkeypatch, tmp_path)
    _seed_10x(tmp_path, {"q_known": 5.0})
    out = sp._decade_gate({"q_known": 6.0, "q_new": 3.0}, FP)
    assert out["status"] != "ok"
    assert out["uncompared"] == ["q_new"]


def test_partial_run_never_replaces_clean_baseline(monkeypatch, tmp_path):
    monkeypatch.setattr(sp, "REPLICAS", 10)
    monkeypatch.setattr(sp, "ALL_QUERIES", True)
    monkeypatch.setattr(sp, "_CACHE_DIR", str(tmp_path))
    sp._persist_decade_record(FP, {"q": 0.5}, {"q": 5.0}, {})
    # an errored rerun under the SAME fingerprint keeps the clean baseline
    sp._persist_decade_record(FP, {"q": 0.5}, {"q": 99.0}, {"q2": "boom"})
    rec = json.loads((tmp_path / "all_x10.json").read_text())
    assert not rec.get("partial") and rec["scaled"] == {"q": 5.0}
    # but with NO clean baseline (new fingerprint), the partial run persists
    # marked partial, so the gate refuses it rather than gating on air
    fp2 = {**FP, "commit": "c" * 40}
    sp._persist_decade_record(fp2, {"q": 0.5}, {"q": 99.0}, {"q2": "boom"})
    rec = json.loads((tmp_path / "all_x10.json").read_text())
    assert rec["partial"] and rec["fingerprint"] == fp2


def _git(tmp, *args):
    import subprocess

    subprocess.run(
        ["git", *args],
        cwd=tmp,
        check=True,
        capture_output=True,
        env={
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
            "PATH": "/usr/bin:/bin",
            "HOME": str(tmp),
        },
    )


def test_fingerprint_survives_docs_commit_between_decades(monkeypatch, tmp_path):
    """Round-9 verdict ask #3: the decade fingerprint pins the newest ENGINE
    commit, so an artifact/docs commit between a 10x record and its 100x
    twin no longer invalidates the comparison — while an engine (.py)
    commit still stales it."""
    import verify_round as vr

    repo = tmp_path / "r"
    repo.mkdir()
    _git(repo, "init", "-q")
    (repo / "engine.py").write_text("x = 1\n")
    _git(repo, "add", "."), _git(repo, "commit", "-qm", "engine")
    monkeypatch.setattr(vr, "REPO", str(repo))
    fp_at_10x = sp._decade_fingerprint("/sf")["commit"]
    # docs + artifact commits between the decades: fingerprint unchanged
    (repo / "README.md").write_text("docs\n")
    (repo / "VERIFY_r10.json").write_text("{}")
    _git(repo, "add", "."), _git(repo, "commit", "-qm", "docs+artifact")
    assert sp._decade_fingerprint("/sf")["commit"] == fp_at_10x
    # an engine commit still stales the pair
    (repo / "engine.py").write_text("x = 2\n")
    _git(repo, "add", "."), _git(repo, "commit", "-qm", "engine change")
    assert sp._decade_fingerprint("/sf")["commit"] != fp_at_10x


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
    assert set(fp) == {
        "n_runs",
        "driver_mem",
        "sf",
        "all_queries",
        "scale_set",
        "commit",
    }
    assert len(fp["commit"]) == 40
