"""Round-3 wave-4 semantic tests.

The DuckDB hash gate proves each operator computes what its oracle says;
these tests pin the SEMANTIC claims the oracles can't express: estimator
error bounds (HLL, KMV), distributional invariants (JSD range, correlation
range, seasonal-index mean), sampling-law behavior (weighted reservoir
favors heavy items), DP noise bounds, and the rerank/linkage contracts.
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMALL

SF_MID = "/root/testdata/sf0.01"


class TestSketchAccuracy:
    def test_hll_estimate_within_bound(self, spark):
        """64 registers -> relative error ~1.04/sqrt(64) = 13%; allow 3x."""
        from feature_datalake_sl_mandic_spark.operators import sketches as S

        rows = S.sketch_hll_manual_users(spark, SF_MID).collect()
        assert rows
        for r in rows:
            assert r.rel_error <= 0.40, (r.event_type, r.rel_error)

    def test_kmv_union_and_intersection_bounds(self, spark):
        from feature_datalake_sl_mandic_spark.operators import sketches as S

        rows = S.sketch_kmv_set_algebra_users(spark, SF_MID).collect()
        assert rows
        for r in rows:
            # union >= each side is not visible here, but union >= exact
            # intersection always holds, and estimates stay in sane bands.
            assert r.union_est > 0
            assert 0.0 <= r.jaccard_est <= 1.0
            assert abs(r.union_est - r.union_exact) / r.union_exact <= 0.5
            # intersection estimate can be coarser (k=32): sanity only
            assert r.inter_est >= 0

    def test_kmv_uncapped_sketches_are_exact(self, spark):
        """When both per-type distinct-user counts are below k, the merged
        sketch IS the true union and the op must report it exactly."""
        from pyspark.sql import functions as F

        from feature_datalake_sl_mandic_spark.catalog import load_table
        from feature_datalake_sl_mandic_spark.operators import sketches as S

        ev = load_table(spark, SF_SMALL, "events")
        sizes = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        rows = S.sketch_kmv_set_algebra_users(spark, SF_SMALL).collect()
        checked = 0
        for r in rows:
            if sizes[r.type_a] < S.KMV_K and sizes[r.type_b] < S.KMV_K:
                assert r.union_est == float(r.union_exact)
                assert r.inter_est == float(r.inter_exact)
                checked += 1
        assert checked, "fixture should have uncapped pairs at sf0.001"


class TestWeightedReservoir:
    def test_exact_k_per_stratum_and_deterministic(self, spark):
        from feature_datalake_sl_mandic_spark.operators import text as T

        a = T.sample_weighted_reservoir(spark, SF_MID).collect()
        b = T.sample_weighted_reservoir(spark, SF_MID).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        per_lang: dict[str, list[int]] = {}
        for r in a:
            per_lang.setdefault(r.lang, []).append(r.rank)
        for lang, ranks in per_lang.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
            assert len(ranks) <= T.RESERVOIR_K

    def test_weighting_favors_long_docs(self, spark):
        """E-S with w = n_tokens must overselect long docs vs the corpus
        mean token count."""
        from pyspark.sql import functions as F

        from feature_datalake_sl_mandic_spark.catalog import load_table
        from feature_datalake_sl_mandic_spark.operators import text as T

        picked = T.sample_weighted_reservoir(spark, SF_MID)
        mean_picked = picked.agg(F.avg("n_tokens")).first()[0]
        docs = load_table(spark, SF_MID, "documents")
        mean_all = docs.agg(F.avg(F.size(F.split("text", " ")))).first()[0]
        assert mean_picked > mean_all


class TestDivergenceAndCorrelation:
    def test_jsd_within_theoretic_range(self, spark):
        from feature_datalake_sl_mandic_spark.operators import text as T

        rows = T.corpus_js_divergence_sources(spark, SF_MID).collect()
        assert rows
        ln2 = math.log(2.0)
        for r in rows:
            assert -1e-9 <= r.jsd <= ln2 + 1e-9, (r.source_a, r.source_b, r.jsd)

    def test_xcorr_in_unit_interval_and_symmetric_lag0(self, spark):
        from feature_datalake_sl_mandic_spark.operators import timeseries as TS

        rows = TS.ts_cross_correlation_lags(spark, SF_MID).collect()
        assert rows
        lag0 = {}
        for r in rows:
            assert -1.0 - 1e-9 <= r.xcorr <= 1.0 + 1e-9
            if r.lag == 0:
                lag0[(r.type_a, r.type_b)] = r.xcorr
        # corr(a_t, b_t) == corr(b_t, a_t)
        for (a, b), v in lag0.items():
            if (b, a) in lag0:
                assert abs(v - lag0[(b, a)]) <= 1e-3

    def test_seasonal_index_weighted_mean_is_one(self, spark):
        """sum(dow_mean * n_days) / sum(n_days) == type mean, so the
        n-weighted mean of the index is 1 per type."""
        from feature_datalake_sl_mandic_spark.operators import timeseries as TS

        rows = TS.ts_seasonal_dow_index(spark, SF_MID).collect()
        per_type: dict[str, list] = {}
        for r in rows:
            per_type.setdefault(r.event_type, []).append(r)
        for t, rs in per_type.items():
            num = sum(r.seasonal_index * r.n_days for r in rs)
            den = sum(r.n_days for r in rs)
            assert abs(num / den - 1.0) <= 5e-3, t


class TestDpNoise:
    def test_noise_bounded_and_applied(self, spark):
        """|Laplace noise| <= b * ln(RES) with the half-step uniform; and the
        release must not equal the exact counts everywhere."""
        from pyspark.sql import functions as F

        from feature_datalake_sl_mandic_spark.catalog import load_table
        from feature_datalake_sl_mandic_spark.operators import validation as V

        rel = V.privacy_dp_noisy_counts(spark, SF_MID)
        ev = load_table(spark, SF_MID, "events")
        exact = ev.groupBy(
            "event_type", F.to_date("ts").cast("string").alias("day")
        ).agg(F.count(F.lit(1)).alias("true_n"))
        j = rel.join(exact, ["event_type", "day"]).collect()
        assert j
        bound = (1.0 / V.DP_EPSILON) * math.log(V._DP_U_RES)
        diffs = [abs(r.noisy_count - r.true_n) for r in j]
        assert max(diffs) <= bound + 1e-6
        assert max(diffs) > 0.0


class TestIntegrityAndLinkage:
    def test_fixture_star_schema_is_referentially_clean(self, spark):
        from feature_datalake_sl_mandic_spark.operators import validation as V

        rows = V.validate_referential_integrity(spark, SF_MID).collect()
        assert len(rows) == len(V._FK_EDGES)
        for r in rows:
            assert r.n_orphans == 0 and r.n_null_fk == 0, r.fk_edge
            assert r.n_child_rows > 0

    def test_er_scores_meet_threshold_and_blocks_hold(self, spark):
        from feature_datalake_sl_mandic_spark.operators import linkage as L

        rows = L.er_parts_scored_matches(spark, SF_MID).collect()
        assert rows
        for r in rows:
            assert r.match_score >= L.MATCH_THRESHOLD
            assert r.partkey_a < r.partkey_b
            # score must equal the weighted agreement pattern it carries
            expect = round(
                r.brand_agree * L.W_BRAND
                + r.type_agree * L.W_TYPE
                + r.size_agree * L.W_SIZE
                + r.price_agree * L.W_PRICE,
                1,
            )
            assert abs(r.match_score - expect) < 1e-9


class TestRerankContract:
    def test_rerank_is_exact_topk_of_shortlist(self, spark):
        """Stage 2 output must equal brute-force exact kNN restricted to the
        stage-1 shortlist — and whenever the shortlist contains the true
        exact top-k, the rerank output IS the exact top-k."""
        from feature_datalake_sl_mandic_spark.operators import similarity as S

        rer = S.ann_two_stage_rerank(spark, SF_MID).collect()
        exact = {
            (r.query_id, r.rank): r.neighbor_id
            for r in S.knn_cosine_topk(spark, SF_MID).collect()
        }
        # per query: reranked neighbors subset of exact corpus, ranks 1..k
        per_q: dict[int, list] = {}
        for r in rer:
            per_q.setdefault(r.query_id, []).append(r)
        assert len(per_q) == S.N_QUERIES
        for q, rs in per_q.items():
            assert sorted(x.rank for x in rs) == list(range(1, S.TOP_K + 1))
            # cosine must be non-increasing in rank
            by_rank = sorted(rs, key=lambda x: x.rank)
            for a, b in zip(by_rank, by_rank[1:]):
                assert a.cosine >= b.cosine
        # shortlist of 30 out of ~150 neighbors recovers most of exact top-5
        hits = sum(
            1
            for r in rer
            if exact.get((r.query_id, r.rank)) == r.neighbor_id
        )
        assert hits / len(rer) >= 0.6


class TestDedupScorecard:
    def test_lsh_scorecard_consistent(self, spark):
        from feature_datalake_sl_mandic_spark.operators import dedup as D

        row = D.eval_dedup_lsh_recall(spark, SF_MID).first()
        assert row.n_common <= min(row.n_truth, row.n_lsh)
        assert 0.0 <= row.recall_ <= 1.0 and 0.0 <= row.precision_ <= 1.0
        # LSH verifies exact Jaccard on capped shingles; on the fixture the
        # caps don't bite, so precision is exactly 1.
        assert row.precision_ == 1.0


class TestPqLloydRefinement:
    def test_refinement_lifts_recall(self, spark):
        """One Lloyd sweep must not hurt recall@5 vs the seed codebooks and
        must lift it materially on the sf0.01 fixture (0.32 -> 0.38
        measured; floors leave slack for fixture regeneration)."""
        from feature_datalake_sl_mandic_spark.operators import similarity as S

        exact = {
            (r.query_id, r.neighbor_id)
            for r in S.knn_cosine_topk(spark, SF_MID).collect()
        }
        base = {
            (r.query_id, r.neighbor_id)
            for r in S.ann_ivf_pq(spark, SF_MID).collect()
        }
        refined = {
            (r.query_id, r.neighbor_id)
            for r in S.ann_pq_lloyd_refined(spark, SF_MID).collect()
        }
        r_base = len(base & exact) / len(exact)
        r_ref = len(refined & exact) / len(exact)
        assert r_ref >= r_base
        assert r_ref >= 0.3

    def test_output_contract(self, spark):
        from feature_datalake_sl_mandic_spark.operators import similarity as S

        rows = S.ann_pq_lloyd_refined(spark, SF_SMALL).collect()
        per_q: dict[int, list] = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rank)
        for q, ranks in per_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), q


class TestIncrementalMinhash:
    def test_incremental_is_exact_restriction_of_full(self, spark):
        """The incremental band join must produce EXACTLY the full result
        restricted to pairs whose right side is in the new batch — no
        index x index pair, nothing from the batch lost."""
        from feature_datalake_sl_mandic_spark.operators import dedup as D

        full = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_minhash_lsh(spark, SF_MID).collect()
        }
        incr = {
            (r.doc_a, r.doc_b)
            for r in D.dedup_incremental_minhash(spark, SF_MID).collect()
        }
        want = {
            (a, b) for a, b in full if b >= D.INCR_MINHASH_BATCH_MIN
        }
        assert incr == want
        assert all(b >= D.INCR_MINHASH_BATCH_MIN for _, b in incr)


class TestDdSketch:
    def test_relative_error_within_guarantee(self, spark):
        """DDSketch promises relative error <= alpha against the true
        quantile; allow 2x slack for the rank-vs-interpolation convention
        difference at fixture sizes."""
        from feature_datalake_sl_mandic_spark.operators import sketches as S

        rows = S.sketch_ddsketch_order_quantiles(spark, SF_MID).collect()
        assert len(rows) >= 6  # statuses x quantiles
        for r in rows:
            assert r.rel_error <= 2 * S.DD_ALPHA + 1e-9, (
                r.o_orderstatus,
                r.q,
                r.rel_error,
            )
