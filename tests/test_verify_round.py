"""Parser tests for verify_round.py — the per-round surface recorder.

The recorder's value is that VERIFY_r{N}.json can be trusted without
re-reading raw logs, so its summary regexes must actually match each
surface's output format (the same trust argument as the plan-probe parser
tests): a regex that silently stops matching would record ok=false noise —
or worse, a permissive one would record ok=true over a failure.
"""

from __future__ import annotations

import verify_round as vr


def test_pytest_summary_parses():
    m = vr._SUMMARY_RES["pytest"].search("1461 passed, 240 skipped in 1254s")
    assert m and m.group(1) == "1461" and m.group(2) == "240"
    m2 = vr._SUMMARY_RES["pytest"].search("5 passed in 1.2s")
    assert m2 and m2.group(2) is None


def test_oracle_summary_parses():
    m = vr._SUMMARY_RES["oracle_parity"].search("238 queries, 0 failures")
    assert m and m.group(1) == "238" and m.group(2) == "0"


def test_plan_sweep_summary_parses():
    line = (
        "sweep: 53 queries flagged (64 flags), 0 UNEXPLAINED, "
        "0 stale ALLOW entries"
    )
    m = vr._SUMMARY_RES["plan_sweep"].search(line)
    assert m and [m.group(i) for i in range(1, 5)] == ["53", "64", "0", "0"]


def test_bench_summary_parses():
    assert vr._SUMMARY_RES["bench"].search('{"metric":"headline_queries_total_wall_clock"')


def test_scale_probe_summary_parses():
    assert vr._SUMMARY_RES["scale_probe"].search('{"metric": "scale_probe", "replicas": 10')
    # must NOT match the bench line (both start with {"metric")
    assert not vr._SUMMARY_RES["scale_probe"].search(
        '{"metric": "headline_queries_total_wall_clock"'
    )


def test_every_surface_has_command_env_and_regex():
    assert set(vr.SURFACES) == set(vr._SUMMARY_RES)
    assert set(vr.ENV_EXTRA) <= set(vr.SURFACES)


def test_artifact_re_ignores_round_artifacts_only():
    # artifacts the runner/driver write mid-run must not mark the tree dirty
    for path in (
        "VERIFY_r08.json",
        "BENCH_r08.json",
        "BENCH_DETAIL_r08.json",
        "CORRECTNESS_r08.json",
        "derby.log",
        "spark-warehouse/t/part-0.parquet",
        "feature_datalake_sl_mandic_spark/__pycache__/x.pyc",
    ):
        assert vr._ARTIFACT_RE.search(path), path
    # source files MUST mark it dirty
    for path in (
        "feature_datalake_sl_mandic_spark/operators/joins.py",
        "bench.py",
        "tests/test_plans.py",
        "COVERAGE.md",
    ):
        assert not vr._ARTIFACT_RE.search(path), path


def test_git_state_reports_head_and_clean_flag():
    head, dirty = vr._git_state()
    assert len(head) == 40 and all(c in "0123456789abcdef" for c in head)
    assert isinstance(dirty, bool)


def test_check_final_flags_stale_and_failed_surfaces():
    engine_head = vr._engine_head()
    head, _ = vr._git_state()
    record = {
        "good": {"ok": True, "commit": engine_head, "source_dirty": False},
        # a LATER commit containing the engine head is also fine (artifact /
        # recorder-only commits after the record must not invalidate it)
        "good_at_head": {"ok": True, "commit": head, "source_dirty": False},
        "stale": {"ok": True, "commit": "0" * 40, "source_dirty": False},
        "dirty": {"ok": True, "commit": engine_head, "source_dirty": True},
        "failed": {"ok": False, "commit": engine_head, "source_dirty": False},
        "legacy": {"ok": True},  # pre-r8 record without staleness fields
    }
    bad = vr.check_final(record)
    names = {line.split(":")[0] for line in bad}
    assert "good" not in names and "good_at_head" not in names
    assert {"stale", "dirty", "failed", "legacy"} <= names


def test_check_final_flags_env_drift(monkeypatch):
    """Round-8 ask #5: a surface recorded under one ENV_EXTRA must go stale
    when the recorder's CURRENT env for that surface differs — ENV_EXTRA
    lives in the (pathspec-excluded) recorder yet changes what a surface
    measures."""
    engine_head = vr._engine_head()
    ok = {"ok": True, "commit": engine_head, "source_dirty": False}
    record = {
        "bench": {**ok, "env": vr._effective_env("bench")},
        "scale_probe_all_x100": {
            **ok,
            # seeded mismatch: recorded at a different heap than the
            # recorder's current ENV_EXTRA prescribes
            "env": {
                **vr._effective_env("scale_probe_all_x100"),
                "SPARK_DRIVER_MEM": "8g",
                "driver_mem_effective": "8g",
            },
        },
        "degen_oracle": dict(ok),  # recorded without env (pre-r9)
    }
    bad = vr.check_final(record)
    names = {line.split(":")[0] for line in bad}
    assert "bench" not in names
    assert "scale_probe_all_x100" in names
    assert any(
        line.startswith("scale_probe_all_x100:") and "env" in line
        for line in bad
    )
    assert "degen_oracle" in names


def test_effective_env_carries_heap():
    env = vr._effective_env("scale_probe_all_x100")
    assert env["SPARK_DRIVER_MEM"] == "48g"
    assert env["driver_mem_effective"] == "48g"
    # a surface with no ENV_EXTRA still records the effective default heap
    assert "driver_mem_effective" in vr._effective_env("bench")


def test_all_sweep_decade_envs_match():
    """scale_probe.py's decade gate only compares same-env decades; the
    recorder must therefore prescribe identical estimator + heap for the
    10x/100x pairs (N_RUNS comes from SPARK_GRAFT_SCALE_RUNS, absent from
    both = the mode default for both)."""
    lo = vr.ENV_EXTRA["scale_probe_all"]
    hi = vr.ENV_EXTRA["scale_probe_all_x100"]
    assert lo.get("SPARK_GRAFT_SCALE_RUNS") == hi.get("SPARK_GRAFT_SCALE_RUNS")
    assert lo.get("SPARK_DRIVER_MEM") == hi.get("SPARK_DRIVER_MEM")
    lo_h = vr.ENV_EXTRA.get("scale_probe", {})
    hi_h = vr.ENV_EXTRA["scale_probe_x100"]
    assert lo_h.get("SPARK_GRAFT_SCALE_RUNS") == hi_h.get("SPARK_GRAFT_SCALE_RUNS")
    assert lo_h.get("SPARK_DRIVER_MEM") == hi_h.get("SPARK_DRIVER_MEM")


def test_engine_head_is_a_commit_reachable_from_head():
    import subprocess

    engine_head = vr._engine_head()
    assert len(engine_head) == 40
    assert (
        subprocess.run(
            ["git", "merge-base", "--is-ancestor", engine_head, "HEAD"],
            cwd=vr.REPO,
        ).returncode
        == 0
    )


def test_artifact_re_covers_decade_and_skew_snapshots():
    assert vr._ARTIFACT_RE.search("SCALE_DECADE_r10.json")
    assert vr._ARTIFACT_RE.search("SKEW_PROBE_r10.json")


def test_effective_env_ignores_checker_shell(monkeypatch):
    """Round-9 advice: --final must not compare records against the
    checker's shell — an exported SPARK_DRIVER_MEM used to spuriously stale
    every default-heap surface (and silently re-label records made under a
    non-default heap)."""
    monkeypatch.setenv("SPARK_DRIVER_MEM", "64g")
    assert vr._effective_env("bench")["driver_mem_effective"] == "8g"
    assert vr._effective_env("scale_probe_all")["driver_mem_effective"] == "48g"


def test_measurement_env_stripped_from_surface_subprocess():
    """run_surface strips shell-exported measurement vars before applying
    ENV_EXTRA, so a surface always measures the recorder's prescription."""
    for var in ("SPARK_DRIVER_MEM", "SPARK_GRAFT_SCALE_REPLICAS", "SPARK_GRAFT_SF_DIR"):
        assert var in vr._MEASUREMENT_ENV
    # ENV_EXTRA keys must still reach the subprocess (prescription wins)
    assert vr.ENV_EXTRA["scale_probe_all"]["SPARK_DRIVER_MEM"] == "48g"


def test_snapshot_decade_record_merges_cache(tmp_path, monkeypatch):
    """Round-9 verdict ask #2: the full per-query decade maps become a
    committed per-round artifact instead of dying in the untracked,
    self-overwriting cache."""
    import json
    import os

    monkeypatch.setattr(vr, "REPO", str(tmp_path))
    cache = tmp_path / ".bench_data" / "scale_probe_cache"
    os.makedirs(cache)
    rec10 = {"fingerprint": {"commit": "a" * 40}, "replicas": 10,
             "base": {"q": 0.5}, "scaled": {"q": 4.0}}
    rec100 = {"fingerprint": {"commit": "a" * 40}, "replicas": 100,
              "base": {"q": 0.5}, "scaled": {"q": 40.0}}
    (cache / "all_x10.json").write_text(json.dumps(rec10))
    vr.snapshot_decade_record(10, "scale_probe_all")
    (cache / "all_x100.json").write_text(json.dumps(rec100))
    vr.snapshot_decade_record(10, "scale_probe_all_x100")
    vr.snapshot_decade_record(10, "pytest")  # non-scale surface: no-op
    snap = json.loads((tmp_path / "SCALE_DECADE_r10.json").read_text())
    assert snap["all_x10"] == rec10 and snap["all_x100"] == rec100
    assert set(snap) == {"all_x10", "all_x100"}
