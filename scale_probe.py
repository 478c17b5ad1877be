"""Scale-ramp probe: do the heavy plans stay linear past the bench fixture?

`BENCH_DETAIL_r{N}.json` records sf0.001 -> sf0.1 (100x) scale ratios; this
probe extends the evidence another decade. It inflates the sf0.1 lake
REPLICAS-fold (default 10x — sf1-equivalent on the corpus tables) the way
TPC-H scales: each replica is a disjoint key universe (every BIGINT key
shifted by ``replica * STRIDE``) sharing the fixed dims (region, nation).
Replica documents get every token tagged with the replica id, so vocabulary
and shingle space grow with the corpus and near-dup structure scales
linearly (exact copies would instead grow intra-bucket pair counts
quadratically in REPLICAS — a property of copied data, not of the plans).
``n_chars`` is recomputed so metadata stays consistent with the tagged text.
Embedding/event/relational rows replicate verbatim under their shifted keys;
the query sets stay fixed (``vec_id < N_QUERIES`` and the PQ codebook rows
live only in replica 0), which is the right shape: queries constant, corpus
growing.

For each probed query the probe times base sf0.1 and the inflated lake in
the same session (min over N_RUNS, bench's estimator) and reports
``ratio = scaled/base`` and ``per_replica = ratio/REPLICAS``: at-most-linear
scaling means ratio <= REPLICAS (per_replica <= 1); sub-linear values mean
fixed overhead still dominates. The bench's co-tenant sentinel runs
alongside so an inflated ratio can be attributed to machine load. Queries
defined over a FIXED id subset (``text_sparse_cosine_pairs``: doc_id <
1000; the retrieval-eval fixed query/pair sets) stay near-flat by
construction — their work does not grow with the lake, so a ~1.0 ratio
there is the expected reading, not missing coverage.

By default the probe covers the bench's HEAVY/HEAVY_WIDE sets plus
representative headline queries (and the CDF ingest core — round-8 verdict
ask #7); ``SPARK_GRAFT_SCALE_ALL=1`` sweeps the ENTIRE registry instead
(every registered plan timed base-vs-scaled, each query crash-isolated),
turning the linearity claim from "the known-heavy plans" into "every plan
we ship".

Decade-over-decade gate (round-8 verdict ask #1): the per-replica ratio
compares each decade against the sf0.1 BASE only, so a plan that is
sub-linear in its first decade (fixed overhead dominating) and super-linear
in its second could pass both sweeps. Every run now persists its per-query
timings (plus an environment fingerprint: N_RUNS, driver heap, lake, git
commit) under ``.bench_data/scale_probe_cache/``; a run at REPLICAS > 10
loads the matching 10x record and gates ``scaled_hi/scaled_10x`` per query
at ``(REPLICAS/10) * DECADE_TOL``. The fingerprint must match exactly —
a ratio of timings taken under different N_RUNS/heap/commit measures the
environment, not the plan (the round-8 lesson: the all-registry sweeps ran
at different N_RUNS and heaps, making the 10x/100x comparison soft).

Queries are timed with a per-QUERY cache release (not per-pass): round 8's
single-run 100x sweep read dedup_ngram_containment at 168.6 s while the
same plan, isolated on the same lake, takes ~43 s (min of 2) — the 33x
"growth" was localCheckpoint blocks from 200+ earlier queries crowding the
shared heap, a sweep-environment artifact, not the plan. Releasing between
queries makes each sample independent of sweep position.

Prints ONE JSON line (``{"metric": "scale_probe", ...}``); wired into
``verify_round.py`` as the ``scale_probe`` / ``scale_probe_x100`` /
``scale_probe_all`` / ``scale_probe_all_x100`` surfaces.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
ALL_QUERIES = os.environ.get("SPARK_GRAFT_SCALE_ALL", "0") == "1"
# Alternative probe sets (round-10 verdict ask #2): "broadcast" selects
# every plan carrying a `broadcast of` ALLOW entry in the plan sweep plus
# the most expensive non-HEAVY plans, run at the DEFAULT 8g heap — the heap
# the 48g all-registry sweeps were shown to mask broadcast OOMs at
# (COVERAGE.md round-10: the ngram pair builders passed every 48g surface
# and died only on the 8g/100x heavy probe).
SCALE_SET = os.environ.get("SPARK_GRAFT_SCALE_SET", "")
# Full-registry sweeps take ~2 base + ~2 scaled registry passes; two runs
# keep the wall clock near an hour while still absorbing first-run codegen
# warm-up in the min. The curated heavy set affords a third sample.
N_RUNS = int(
    os.environ.get(
        "SPARK_GRAFT_SCALE_RUNS", "2" if (ALL_QUERIES or SCALE_SET) else "3"
    )
)

# Linearity gate: flag a query as superlinear only when BOTH hold. The
# tolerance absorbs run-to-run noise on an idle box (bench dispersion shows
# >=15% min-to-median spread is routine); the floor excludes queries whose
# scaled run is still sub-second — at that size per-task fixed costs (task
# launch, codegen dispatch, more files in the scaled lake) are the same
# order as the measurement, so a high ratio there says nothing about the
# plan's asymptotics. The floor IS a blind spot at 10x (a quadratic plan
# with a tiny base can hide under it — round-7 advice); the full-registry
# sweep at 100x closes it: quadratic growth at 100x is 10,000x base time,
# which clears the floor from any realistic base, so the x100 ALL surface
# is the one that proves sub-second plans too.
SUPERLINEAR_TOL = 1.15
MIN_SCALED_SEC = 1.0

# Decade-over-decade gate (round-8 ask #1): at REPLICAS R > 10, a query's
# scaled time may grow at most (R/10) x DECADE_TOL over its same-env 10x
# record. The tolerance is wider than SUPERLINEAR_TOL because it compounds
# TWO independent min-of-N_RUNS estimates (observed per-decade run-to-run
# spread ~25-30% on this box); a genuinely quadratic plan reads ~10x the
# gate at the 10x->100x step (ratio ~100 vs gate 15), and the round-8
# outlier class (33x) still trips it with 2x margin.
DECADE_TOL = 1.5
DECADE_BASE_REPLICAS = 10
# Denominator floor for the decade ratio (round-9 verdict ask #4): a 10x
# scaled time below this is fixed-overhead-dominated, so scaled_hi/scaled_10x
# measures noise, not growth (r9: dedup_exact_documents read 13.19 on a
# ~0.01 s/replica pair — clearly sub-linear in absolute terms, flapping the
# 15x gate on ratio arithmetic alone). Such names are recorded in
# ``below_floor`` instead of carrying a ratio; their asymptotics are still
# covered by the per-replica gate on ABSOLUTE time at both decades. The
# numerator side has the symmetric MIN_SCALED_SEC guard. Never widen
# DECADE_TOL for a noisy denominator.
DECADE_DENOM_FLOOR_SEC = 0.5
_CACHE_DIR = os.path.join(REPO, ".bench_data", "scale_probe_cache")

# Superlinear ALLOW list (the plans/probe.py pattern: every entry carries
# the argument for why the flag is the SEMANTICS, not a plan defect). These
# queries' oracles DEFINE the work as all pairs within a blocking key of
# FIXED cardinality, so replica inflation grows block occupancy linearly
# and the defined pair set quadratically — ANY engine computing these
# semantics does Theta(sum |block|^2) work; the Spark plan is still the
# minimal one shuffle on the block key. A flagged query with no entry here
# fails the sweep; an entry names the registered scale path whose candidate
# generation keeps bucket occupancy controlled as the corpus grows.
SCALE_ALLOW: dict[str, str] = {
    "dedup_embedding_cosine": (
        "oracle joins all pairs per LABEL (fixed fixture cardinality); the "
        "pair set itself is quadratic in per-label occupancy. Scale path: "
        "ann_lsh_bucketed / semdedup_scaled_k_pairs (registered, gated) / "
        "dedup_minhash_lsh."
    ),
    "dedup_levenshtein_blocked": (
        "oracle joins all pairs per (lang, len_bucket) block — fixed "
        "cardinality, so the DEFINED candidate set is quadratic in block "
        "occupancy. Scale path: dedup_minhash_lsh / "
        "dedup_ngram_jaccard_capped (content-derived blocking keys whose "
        "count grows with the corpus, with the shingle-DF cap bounding any "
        "one key's fan-out — round-8 ask #2)."
    ),
    "semdedup_cluster_cosine": (
        "within-cluster exact cosine with k PINNED for oracle determinism; "
        "the paper's production setting scales k with n (k ~ n/target "
        "cluster size), keeping |cluster| bounded and the pair work linear "
        "— at pinned k, inflation grows |cluster| linearly and pairs "
        "quadratically by construction. The production setting IS now "
        "registered and gated with no allow entry: semdedup_scaled_k_pairs "
        "(coarse clusters hash-split to ceil(n_c/32) sub-buckets, k ~ n/32)."
    ),
}
STRIDE = 1 << 33  # far above any fixture key; products/joins stay exact BIGINT

# Keys shifted per replica so each replica is a disjoint, FK-consistent
# sub-universe (the TPC-H scaling model). region/nation are shared dims.
_SHIFT_COLS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# Corpus tables fan out inside the scan task (shingles, tokens, vector HOFs),
# so give them cores-wide file counts; relational tables stay modest.
_WIDE_FILES = {"documents", "embeddings", "events"}

# Hot-key skew injection (round-9 verdict ask #1): the replica lake is
# uniform, so linear growth on it does not prove a plan survives a hot key —
# and every real 100 TB corpus has one (a viral user, a default/sentinel
# customer id, boilerplate text). With skew=True the generator remaps a
# fixed fraction of each skewable dimension onto ONE existing key (hash of a
# row-unique column decides membership, so the remap is deterministic and
# replica-independent): after it, user_id=0 owns ~40% of events, customer 0
# ~40% of orders, supplier/part 0 ~30% of lineitem each, and ~35% of
# documents share a boilerplate PREFIX (the skew shape for text: shared
# shingles whose document frequency grows with the corpus — exactly what
# the registered DF cap bounds; the uncapped ngram oracles DEFINE quadratic
# pair sets over shared shingles, so their skew answer IS the capped
# variant, same as their SCALE_ALLOW scale path). Fractions stay constant
# across replica counts, so base-vs-scaled growth on the skewed lake
# measures scaling UNDER skew, and task-time dispersion on the scaled lake
# measures whether the hot key collapses parallelism.
SKEW_HOT_FRAC = {"events": 0.40, "orders": 0.40, "lineitem": 0.30}
SKEW_DOC_FRAC = 0.35
SKEW_BOILERPLATE = (
    "terms of service apply this page is provided as is without any "
    "warranty of any kind see the license for details "
)

# Skew SHAPE (round-10 verdict ask #6, stretch): "hot" is the adversarial
# single-key extreme above; "zipf" remaps SKEW_ZIPF_FRAC of each skewable
# dimension onto a Zipf(s~1) head of SKEW_ZIPF_KEYS ranks — the top rank
# owns ~frac * ln(2)/ln(K+1) of the TOTAL corpus (~9-10% at 0.6/100), rank
# r owns ~1/r of that, and the untouched remainder keeps the original
# long-tail keys. One hot key is what makes the worst straggler; a heavy
# TAIL of moderately-hot keys is what production corpora look like and
# what AQE coalescing and the bucketed/banded plans actually see — the two
# shapes stress different mechanisms. Document boilerplate stays the
# shared-prefix shape in both (its skew dimension is content, not a key).
SKEW_SHAPE = os.environ.get("SPARK_GRAFT_SKEW_SHAPE", "hot")
SKEW_ZIPF_FRAC = 0.6
SKEW_ZIPF_KEYS = 100


def _apply_skew(t: str, d):
    """Remap hot fractions onto key 0 (shape "hot") or a Zipf head (shape
    "zipf"); prepend boilerplate to documents (both shapes — see above)."""
    from pyspark.sql import functions as F

    def pct(unique_cols, seed):
        """Deterministic uniform in [0, 1): hash of a row-unique column set,
        so the remap is replica-independent and reproducible."""
        return (
            F.pmod(
                F.xxhash64(*[F.col(c) for c in unique_cols], F.lit(seed)),
                F.lit(1_000_000),
            )
            + F.lit(0.5)
        ) / F.lit(1_000_000.0)

    def skewed_key(orig, unique_cols, hot_frac, seed):
        if SKEW_SHAPE == "zipf":
            u = pct(unique_cols, seed)
            # inverse-CDF sample of Zipf(s=1) over ranks 1..K:
            # P(rank <= r) = ln(r+1)/ln(K+1)  =>  rank = floor((K+1)^u)
            rank = F.least(
                F.greatest(
                    F.floor(F.pow(F.lit(float(SKEW_ZIPF_KEYS + 1)), u)), F.lit(1)
                ),
                F.lit(SKEW_ZIPF_KEYS),
            )
            return (
                F.when(pct(unique_cols, seed + 100) < SKEW_ZIPF_FRAC, rank)
                .otherwise(F.col(orig))
                .cast("bigint")
            )
        return (
            F.when(pct(unique_cols, seed) < hot_frac, F.lit(0))
            .otherwise(F.col(orig))
            .cast("bigint")
        )

    if t == "events":
        d = d.withColumn(
            "user_id",
            skewed_key("user_id", ["event_id"], SKEW_HOT_FRAC["events"], 1),
        )
    elif t == "orders":
        d = d.withColumn(
            "o_custkey",
            skewed_key("o_custkey", ["o_orderkey"], SKEW_HOT_FRAC["orders"], 2),
        )
    elif t == "lineitem":
        uc = ["l_orderkey", "l_linenumber"]
        frac = SKEW_HOT_FRAC["lineitem"]
        d = d.withColumn(
            "l_suppkey", skewed_key("l_suppkey", uc, frac, 3)
        ).withColumn("l_partkey", skewed_key("l_partkey", uc, frac, 4))
    elif t == "documents":
        d = d.withColumn(
            "text",
            F.when(
                pct(["doc_id"], 5) < SKEW_DOC_FRAC,
                F.concat(F.lit(SKEW_BOILERPLATE), F.col("text")),
            ).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    return d


# The "most expensive non-HEAVY plans" half of the broadcast measurement
# set (round-10 verdict ask #2): the top plans by scaled_sec in the r10
# full-registry 100x record (SCALE_DECADE_r10.json all_x100) that are not
# already 8g-probed via the heavy set and not SCALE_ALLOW quadratics. These
# ran only at 48g before; an 8g/100x pass proves default-heap viability.
_BROADCAST_EXPENSIVE_EXTRA = [
    "pyds_training_shards_roundtrip",
    "graph_bfs_distances",
    "graph_cosupply_triangles",
    "graph_components_star",
    "eval_dedup_lsh_recall",
    "graph_min_cost_paths",
    "graph_link_prediction_jaccard",
    "graph_pagerank_cosupply",
    "eval_lsh_band_tuning",
    "profile_orders_columns",
    "dedup_incremental_minhash",
    "corpus_cdc_chunking",
    "dedup_duplicate_ngram_spans",
    "dedup_ngram_containment",
    "dedup_ngram_jaccard",
    "groupmap_user_value_trend",
]


def broadcast_probe_names() -> list[str]:
    """The broadcast-audit measurement set (round-10 verdict ask #2),
    DERIVED from the plan sweep's ALLOW map so the static rule and the
    measurement cannot drift apart: every query with a ``broadcast of``
    ALLOW entry, plus the pinned most-expensive-non-HEAVY extras. At
    REPLICAS >= 100 the SCALE_ALLOW quadratic oracles drop out exactly as
    in ALL mode (their pair sets are quadratic BY DEFINITION; their
    broadcast sides are measured by the 10x record at the same 8g heap)."""
    from feature_datalake_sl_mandic_spark.plans import probe as plan_probe

    flagged = sorted(
        n
        for n, entries in plan_probe.ALLOW.items()
        if any(f.startswith("broadcast of") for f in entries)
    )
    names = flagged + [n for n in _BROADCAST_EXPENSIVE_EXTRA if n not in flagged]
    if REPLICAS >= 100:
        names = [n for n in names if n not in SCALE_ALLOW]
    return names


def probe_names() -> list[str]:
    """HEAVY + HEAVY_WIDE + representative headline queries, minus plans
    that ignore sf_dir (multimodal payloads are deterministic in-plan).
    With SPARK_GRAFT_SCALE_ALL=1: every registered query (sf_dir-ignoring
    plans stay in — they pass trivially at ratio ~1 and cost their base
    time, which keeps the claim simple: ALL of them). With
    SPARK_GRAFT_SCALE_SET=broadcast: the broadcast measurement set."""
    import bench

    if SCALE_SET == "broadcast":
        return broadcast_probe_names()
    if ALL_QUERIES:
        from feature_datalake_sl_mandic_spark import registry

        names = sorted(registry.load_all())
        if REPLICAS >= 100:
            # quadratic-BY-DEFINITION oracles (SCALE_ALLOW) cost ~REPLICAS^2
            # x base on the inflated lake — at 100x that is ~10,000x, hours
            # per query for semantics already measured and allowlisted at
            # 10x. Skipping them here is recorded in the output line
            # (skipped_allowed_quadratic), so the x100 claim stays honest:
            # "every GATED plan, two decades".
            names = [n for n in names if n not in SCALE_ALLOW]
        return names
    names = list(bench.HEAVY) + list(bench.HEAVY_WIDE) + [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "window_rank_orders",
        "knn_cosine_topk",
        "events_sessionize",
        "dedup_exact_documents",
        # the CDF ingest core (round-8 ask #7): correctness and crash-replay
        # are pytest-covered; this carries the same two-decade inflated-lake
        # timing evidence as the other heavy paths (real txlog write path,
        # 100x customer table at REPLICAS=100)
        "cdf_incremental_ingest",
    ]
    return [n for n in names if n != "multimodal_phash_banded_pairs"]


def _time_queries(spark, specs, names, sf_dir, n_runs):
    """Min-of-n wall clock per query (bench's estimator), with each query
    crash-isolated: a failure on the inflated lake (an id-density or
    capacity assumption the base fixtures never stress) is recorded per
    query instead of aborting the sweep. Returns (times, errors,
    sentinel_runs)."""
    import bench
    from feature_datalake_sl_mandic_spark.session import release_cached

    samples: dict[str, list[float]] = {n: [] for n in names}
    errors: dict[str, str] = {}
    sentinel_runs: list[float] = []
    for _run in range(n_runs):
        for n in names:
            if n in errors:
                continue
            t0 = time.perf_counter()
            try:
                specs[n].fn(spark, sf_dir).count()  # force full execution
            except Exception as e:  # noqa: BLE001
                errors[n] = f"{type(e).__name__}: {e}"[:300]
                continue
            samples[n].append(round(time.perf_counter() - t0, 4))
            # Release per QUERY, not per pass: on a 100x lake a full-registry
            # pass accumulates localCheckpoint blocks from 200+ queries in
            # the one shared local-mode heap, and a query's reading comes to
            # depend on its sweep position (r8: containment read 168.6 s
            # mid-sweep vs ~43 s isolated — same plan, same lake). The
            # release runs OUTSIDE the timed region.
            release_cached(spark)
        sentinel_runs.append(bench._sentinel_once(spark))
        release_cached(spark)
    times = {n: min(ts) for n, ts in samples.items() if ts}
    return times, errors, sentinel_runs


def prepare_scaled_dir(spark, sf_dir: str, replicas: int, skew: bool = False) -> str:
    """Materialize (once, manifest-cached) the replicas-fold lake.

    ``skew=True`` additionally injects the hot-key distribution described at
    SKEW_HOT_FRAC (one dominant key per skewable dimension, a boilerplate
    document cluster) into its own cached directory — the skew probe's lake.

    ``replicas=1`` builds the probe's BASE lake: identical rows to the
    source, written under the SAME file-count policy as the scaled lake so
    the two timed runs see identical scan-stage parallelism — if the base
    came from bench's layout (8 files on wide tables) while the scaled lake
    had 32, a scan-bound plan's ratio would be deflated up to 4x by the
    parallelism difference alone, and the superlinearity gate would measure
    the layout, not the plan. The cache manifest includes every
    generation-affecting parameter, so editing the shift/tagging/layout
    logic invalidates stale lakes instead of silently reusing them."""
    from pyspark.sql import functions as F

    from feature_datalake_sl_mandic_spark import catalog

    src_manifest: dict[str, int] = {}
    for t in catalog.TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            src_manifest[t] = os.path.getsize(p)
    skew_tag = ""
    if skew:
        # shape-suffixed so the hot and zipf lakes cache side by side
        skew_tag = "skew" + ("" if SKEW_SHAPE == "hot" else SKEW_SHAPE)
    target = os.path.join(
        REPO,
        ".bench_data",
        f"{os.path.basename(sf_dir.rstrip('/'))}x{replicas}{skew_tag}",
    )
    marker = os.path.join(target, ".ready.json")
    import hashlib
    import inspect

    want = {
        "src": sf_dir,
        "replicas": replicas,
        "skew": skew,
        "sizes": src_manifest,
        "gen": {
            "stride": STRIDE,
            "shift_cols": _SHIFT_COLS,
            "wide_files": sorted(_WIDE_FILES),
            "skew_gen": {
                "shape": SKEW_SHAPE,
                "hot_frac": SKEW_HOT_FRAC,
                "doc_frac": SKEW_DOC_FRAC,
                "zipf": {"frac": SKEW_ZIPF_FRAC, "keys": SKEW_ZIPF_KEYS},
                "src_md5": hashlib.md5(
                    inspect.getsource(_apply_skew).encode()
                ).hexdigest(),
            }
            if skew
            else None,
            # hash of THIS function's source: any edit to the tagging
            # expression, file-count policy, or shift logic mechanically
            # invalidates cached lakes — no hand-maintained version string
            # to forget to bump
            "src_md5": hashlib.md5(
                inspect.getsource(prepare_scaled_dir).encode()
            ).hexdigest(),
        },
    }
    try:
        with open(marker) as f:
            if json.load(f) == want:
                return target
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    shutil.rmtree(target, ignore_errors=True)
    os.makedirs(target, exist_ok=True)
    for t in src_manifest:
        df = catalog.load_table(spark, sf_dir, t)
        shift = _SHIFT_COLS.get(t)
        if shift is None or replicas <= 1:
            out_df = _apply_skew(t, df) if skew else df
        else:
            # One explode, not an N-way union: the plan stays O(1) in the
            # replica count (a 100-way union is 100 scan branches per table).
            d = df.withColumn(
                "_r", F.explode(F.array(*[F.lit(r) for r in range(replicas)]))
            )
            for c in shift:
                d = d.withColumn(c, (F.col(c) + F.col("_r") * STRIDE).cast("bigint"))
            if t == "documents":
                d = d.withColumn(
                    "text",
                    F.when(F.col("_r") == 0, F.col("text")).otherwise(
                        F.regexp_replace(
                            F.col("text"),
                            F.lit(r"(\S+)"),
                            F.concat(F.lit("r"), F.col("_r"), F.lit("w$1")),
                        )
                    ),
                ).withColumn("n_chars", F.length("text").cast("bigint"))
            if t == "part":
                # p_name is CONTENT, same as document text: a real 100x
                # catalog has ~100x distinct names, not 100 verbatim copies
                # of each. Untagged replication grew the (adj, noun, brand)
                # ER block occupancy linearly and the DEFINED candidate set
                # quadratically (1.35e9 pairs at 100x — a property of the
                # copied data, not the plan); token tagging grows block
                # COUNT instead, keeping occupancy constant. Substring
                # filters elsewhere (LIKE '%gear%') still match the tagged
                # tokens, so scan selectivities keep their shape.
                d = d.withColumn(
                    "p_name",
                    F.when(F.col("_r") == 0, F.col("p_name")).otherwise(
                        F.regexp_replace(
                            F.col("p_name"),
                            F.lit(r"(\S+)"),
                            F.concat(F.lit("r"), F.col("_r"), F.lit("w$1")),
                        )
                    ),
                )
            out_df = d.drop("_r")
            if skew:
                # skew AFTER the replica shift: the hot key absorbs rows from
                # every replica, so its share of the TOTAL corpus stays at
                # the configured fraction at any replica count
                out_df = _apply_skew(t, out_df)
        n_files = 32 if t in _WIDE_FILES else (8 if t in _SHIFT_COLS else 1)
        out_df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(target, f"{t}.parquet")
        )
    with open(marker, "w") as f:
        json.dump(want, f)
    return target


def _git_head() -> str:
    """Newest ENGINE commit (round-9 verdict ask #3): the fingerprint used
    to pin decades to a commit must survive artifact/docs/recorder commits
    between a 10x record and its 100x twin — a README commit cannot change
    what a plan measures, but pinning bare HEAD forced the builder to
    sequence the entire two-decade record around zero intervening commits.
    Reuses verify_round's _ENGINE_PATHSPEC (the one source of truth for
    "what counts as the engine"); an actual engine commit still stales."""
    import verify_round

    return verify_round._engine_head()


def _mode() -> str:
    """Which probe set this process runs — also the decade-record namespace
    (each mode gates 100x against ITS OWN same-env 10x record)."""
    if SCALE_SET:
        return SCALE_SET
    return "all" if ALL_QUERIES else "heavy"


def _decade_fingerprint(sf_dir: str) -> dict:
    """Everything (besides the replica count) that must be IDENTICAL between
    two decades for their timing ratio to measure the plan: estimator
    (N_RUNS), heap, source lake, query set mode, and the engine commit."""
    return {
        "n_runs": N_RUNS,
        "driver_mem": os.environ.get("SPARK_DRIVER_MEM", "8g"),
        "sf": sf_dir,
        "all_queries": ALL_QUERIES,
        "scale_set": SCALE_SET,
        "commit": _git_head(),
    }


def _decade_record_path(replicas: int, mode: str | None = None) -> str:
    return os.path.join(_CACHE_DIR, f"{mode or _mode()}_x{replicas}.json")


def _persist_decade_record(
    fingerprint: dict, base: dict, scaled: dict, errors: dict, mode: str | None = None
) -> None:
    """Persist this run's per-query timings as the decade baseline record.

    An error-ridden sweep must not silently replace a previously-good
    baseline (round-9 advice): a clean run persists as-is; a run with
    per-query errors persists with ``partial=true`` (so _decade_gate refuses
    to gate against it, the same fail-closed treatment as an env mismatch) —
    and never overwrites an existing CLEAN same-fingerprint record at all.
    """
    os.makedirs(_CACHE_DIR, exist_ok=True)
    record = {
        "fingerprint": fingerprint,
        "replicas": REPLICAS,
        "base": base,
        "scaled": scaled,
    }
    if errors:
        record["partial"] = True
        record["errors"] = errors
    rec_path = _decade_record_path(REPLICAS, mode)
    if errors:
        try:
            with open(rec_path) as f:
                old = json.load(f)
            if not old.get("partial") and old.get("fingerprint") == fingerprint:
                return  # keep the clean baseline
        except (FileNotFoundError, json.JSONDecodeError):
            pass
    with open(rec_path, "w") as f:
        json.dump(record, f, indent=1)


def _decade_gate(scaled: dict, fingerprint: dict, mode: str | None = None) -> dict | None:
    """Cross-decade growth check vs the same-env 10x record (round-8 ask
    #1). Returns None below the hi decade; at REPLICAS > 10 a missing or
    env-mismatched 10x record is a FAILED gate (status != "ok") — a decade
    claim that silently skipped its comparison would rot exactly the way
    the per-replica-only gate did."""
    if REPLICAS <= DECADE_BASE_REPLICAS:
        return None
    gate = round(REPLICAS / DECADE_BASE_REPLICAS * DECADE_TOL, 2)
    out: dict = {
        "base_replicas": DECADE_BASE_REPLICAS,
        "gate": gate,
        "tol": DECADE_TOL,
        "status": "ok",
        "ratios": {},
        "superlinear_decade": [],
    }
    try:
        with open(_decade_record_path(DECADE_BASE_REPLICAS, mode)) as f:
            rec = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        out["status"] = (
            f"no {DECADE_BASE_REPLICAS}x record — run the "
            f"{DECADE_BASE_REPLICAS}x probe first under this env"
        )
        return out
    if rec.get("partial"):
        # a 10x sweep that hit per-query errors persists only as partial
        # (round-9 advice): gating against it would let the errored names
        # escape the decade comparison while the surface reads green
        out["status"] = (
            f"{DECADE_BASE_REPLICAS}x record is partial (recorded with "
            f"errors: {sorted(rec.get('errors', {}))[:5]}) — re-run the "
            f"{DECADE_BASE_REPLICAS}x probe clean first"
        )
        return out
    got = dict(rec.get("fingerprint", {}))
    if got != fingerprint:
        diff = sorted(
            k
            for k in set(got) | set(fingerprint)
            if got.get(k) != fingerprint.get(k)
        )
        out["status"] = (
            f"{DECADE_BASE_REPLICAS}x record env mismatch on {diff} — "
            "rerun it under this env (same N_RUNS/heap/commit)"
        )
        return out
    base10 = rec.get("scaled", {})
    # names timed at this decade but absent from the 10x record cannot be
    # decade-checked at all; silently dropping them (the pre-r10 behavior)
    # let a plan whose 10x run failed escape the gate (round-9 advice) —
    # fail closed instead
    out["uncompared"] = sorted(n for n in scaled if n not in base10)
    if out["uncompared"]:
        out["status"] = (
            f"{len(out['uncompared'])} names have no {DECADE_BASE_REPLICAS}x "
            f"timing to compare against ({out['uncompared'][:5]}...) — "
            f"re-run the {DECADE_BASE_REPLICAS}x probe over the same set"
        )
        return out
    # ratio only where the denominator clears the floor; sub-floor names are
    # listed, not ratio'd (round-9 verdict ask #4 — see DECADE_DENOM_FLOOR_SEC)
    ratios = {
        n: round(sec / base10[n], 2)
        for n, sec in scaled.items()
        if base10[n] >= DECADE_DENOM_FLOOR_SEC
    }
    out["below_floor"] = sorted(
        n for n in scaled if base10[n] < DECADE_DENOM_FLOOR_SEC
    )
    out["superlinear_decade"] = sorted(
        n
        for n, r in ratios.items()
        if r > gate and scaled[n] >= MIN_SCALED_SEC and n not in SCALE_ALLOW
    )
    out["n_compared"] = len(ratios)
    out["n_below_floor"] = len(out["below_floor"])
    # keep the printed line readable: top growers only; the full map lives
    # in the cache record (snapshotted per round to SCALE_DECADE_r{N}.json
    # by verify_round.py — round-9 verdict ask #2)
    out["ratios"] = dict(sorted(ratios.items(), key=lambda kv: -kv[1])[:20])
    return out


def main() -> int:
    import bench
    from feature_datalake_sl_mandic_spark import registry
    from feature_datalake_sl_mandic_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")
    t0 = time.perf_counter()
    base_dir = prepare_scaled_dir(spark, sf_dir, 1)  # same layout policy
    scaled_dir = prepare_scaled_dir(spark, sf_dir, REPLICAS)
    prep_sec = round(time.perf_counter() - t0, 1)

    specs = registry.load_all()
    names = probe_names()
    base, base_errs, sent_base = _time_queries(spark, specs, names, base_dir, N_RUNS)
    scaled, scaled_errs, sent_scaled = _time_queries(
        spark, specs, names, scaled_dir, N_RUNS
    )
    errors = {n: f"base: {m}" for n, m in base_errs.items()}
    errors.update({n: f"scaled: {m}" for n, m in scaled_errs.items()})
    fingerprint = _decade_fingerprint(sf_dir)
    _persist_decade_record(fingerprint, base, scaled, errors)
    decade = _decade_gate(scaled, fingerprint)
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
        }
    # the headline linearity number covers only GATED plans — folding the
    # SCALE_ALLOW quadratics in would let a gated plan creep toward the
    # threshold invisibly (the allowed entries always dominate the max)
    gated = {n: q for n, q in queries.items() if n not in SCALE_ALLOW}
    worst = (
        max(gated.values(), key=lambda q: q["per_replica"])
        if gated
        else {"per_replica": None}
    )
    worst_allowed = (
        max(
            (q["per_replica"] for n, q in queries.items() if n in SCALE_ALLOW),
            default=None,
        )
    )
    if ALL_QUERIES:
        skipped_quadratic = sorted(n for n in SCALE_ALLOW if n not in names)
    elif SCALE_SET == "broadcast":
        # only the quadratics the broadcast set would otherwise contain
        # (i.e. broadcast-ALLOW-listed ones excluded at the 100x decade)
        from feature_datalake_sl_mandic_spark.plans import probe as _pp

        skipped_quadratic = sorted(
            n
            for n in SCALE_ALLOW
            if n not in names
            and any(f.startswith("broadcast of") for f in _pp.ALLOW.get(n, {}))
        )
    else:
        skipped_quadratic = []
    out = {
        "metric": "scale_probe",
        "replicas": REPLICAS,
        "sf": sf_dir,
        "n_runs": N_RUNS,
        "all_queries": ALL_QUERIES,
        "scale_set": SCALE_SET,
        "skipped_allowed_quadratic": skipped_quadratic,
        "prep_sec": prep_sec,
        "queries": queries,
        "errors": errors,
        "max_per_replica": worst["per_replica"],
        "max_allowed_per_replica": worst_allowed,
        "superlinear": sorted(
            n
            for n, q in queries.items()
            if q["per_replica"] > SUPERLINEAR_TOL
            and q["scaled_sec"] >= MIN_SCALED_SEC
            and n not in SCALE_ALLOW
        ),
        "allowed_superlinear": {
            n: SCALE_ALLOW[n]
            for n, q in sorted(queries.items())
            if q["per_replica"] > SUPERLINEAR_TOL
            and q["scaled_sec"] >= MIN_SCALED_SEC
            and n in SCALE_ALLOW
        },
        # plans/probe.py discipline: an ALLOW entry whose (measured) query
        # no longer flags is stale — the quadratic semantics were rewritten
        # or renamed, and a rotting entry would suppress a future genuine
        # flag. Judged only when the query was measured AND its scaled run
        # is above the gate floor (a sub-second scaled run can't distinguish
        # quadratic from overhead, so it can't prove an entry stale either).
        "stale_scale_allow": sorted(
            n
            for n in SCALE_ALLOW
            if n in queries
            and queries[n]["scaled_sec"] >= MIN_SCALED_SEC
            and queries[n]["per_replica"] <= SUPERLINEAR_TOL
        ),
        "decade": decade,
        "sentinel": {
            "base_min": min(sent_base),
            "scaled_min": min(sent_scaled),
            "ref": bench.SENTINEL_REF_SEC,
        },
    }
    print(json.dumps(out))
    # the exit code IS the gate (SKILL.md: the surface "fails on superlinear
    # growth") — standalone runs must not exit green past a regression. At
    # the hi decade the decade comparison is part of the gate: a query that
    # grew more than (REPLICAS/10) x DECADE_TOL over its same-env 10x time
    # fails, and so does a run that could not make the comparison at all.
    bad = (
        out["superlinear"]
        or errors
        or out["stale_scale_allow"]
        or (decade is not None and decade["status"] != "ok")
        or (decade is not None and decade["superlinear_decade"])
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
