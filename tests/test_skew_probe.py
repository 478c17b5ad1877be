"""Unit tests for skew_probe.py — the hot-key skew gate (r9 verdict ask #1).

The probe's value is the two mechanical gates (growth-under-skew and the
max/median straggler bound); these tests pin the gate arithmetic and the
registry wiring without paying for a Spark session. The live end-to-end run
is the ``scale_probe_skew`` verify surface.
"""

from __future__ import annotations

import skew_probe as kp
from feature_datalake_sl_mandic_spark import registry


def test_skew_names_are_registered():
    specs = registry.load_all()
    missing = [n for n in kp.SKEW_NAMES if n not in specs]
    assert not missing, missing


def test_skew_allow_entries_name_probed_queries():
    """An ALLOW entry for an unprobed query could never be validated or go
    stale — every entry must be in the probed set."""
    for name in kp.SKEW_ALLOW:
        assert name in kp.SKEW_NAMES, name


def test_straggler_floors():
    """The ratio only fires above an absolute max-task floor, and its
    denominator is floored so single-digit-ms medians can't inflate it."""
    assert kp.STRAGGLER_MIN_TASK_SEC >= 0.5
    assert kp.STRAGGLER_MIN_MEDIAN_SEC > 0
    # a 2 s max over a 5 ms median reads as 2/0.05 = 40x, not 400x
    ratio = 2.0 / max(0.005, kp.STRAGGLER_MIN_MEDIAN_SEC)
    assert ratio == 2.0 / kp.STRAGGLER_MIN_MEDIAN_SEC


def test_tolerance_separates_healthy_from_hot():
    """Healthy AQE-coalesced stages on this box read max/median <= ~4; an
    unsalted window over a 40%-hot key reads 20-300x. The gate must sit
    between the populations with margin on both sides."""
    assert 4.0 < kp.STRAGGLER_TOL < 20.0


def test_uncapped_ngram_pair_excluded_by_design():
    """Their oracles define all pairs per shared shingle — quadratic under a
    boilerplate cluster BY DEFINITION; the capped variants are the probed
    skew path (mirrors their SCALE_ALLOW treatment)."""
    assert "dedup_ngram_jaccard" not in kp.SKEW_NAMES
    assert "dedup_ngram_containment" not in kp.SKEW_NAMES
    assert "dedup_ngram_jaccard_capped" in kp.SKEW_NAMES
    assert "dedup_ngram_containment_capped" in kp.SKEW_NAMES


def test_sessionize_pair_both_probed():
    assert "events_sessionize" in kp.SKEW_NAMES
    assert "events_sessionize_chunked" in kp.SKEW_NAMES


def test_skew_allow_empty_while_nothing_flags():
    """r10 record: worst straggler 2.99x vs tol 8 — no plan flags, so the
    ALLOW list must be empty (an entry for a non-flagging query is exactly
    the staleness the gate exists to catch; the plan-shape documentation
    lives in plans/probe.py's `skew window` rule)."""
    assert kp.SKEW_ALLOW == {}
