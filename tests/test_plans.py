"""Plan-quality tests: the physical plan, not just the answer, is under test.

Each asserts a scale-critical property: predicate pushdown into the parquet
scan, column pruning, broadcast join selection for dims, codegen coverage,
and no pathological shuffle counts.
"""

from __future__ import annotations

from feature_datalake_sl_mandic_spark import plans
from feature_datalake_sl_mandic_spark.operators.aggregates import agg_conditional_pivot
from feature_datalake_sl_mandic_spark.operators.relational import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_volume,
    topk_orders,
)
from tests.conftest import SF_SMALL


def test_q1_filter_pushed_and_columns_pruned(spark):
    df = q1_pricing_summary(spark, SF_SMALL)
    assert plans.pushed_filters(df), "shipdate filter must reach the parquet scan"
    schemas = plans.read_schemas(df)
    # lineitem has 11 columns; the scan must read only the 7 the query needs
    assert schemas and all("l_orderkey" not in s for s in schemas)
    assert all("l_partkey" not in s for s in schemas)
    assert plans.has_whole_stage_codegen(df)


def test_q3_broadcasts_customer(spark):
    df = q3_shipping_priority(spark, SF_SMALL)
    assert plans.count_broadcast_joins(df) >= 1
    assert plans.pushed_filters(df)  # date + segment filters pushed


def test_q5_broadcasts_all_dims(spark):
    df = q5_local_supplier_volume(spark, SF_SMALL)
    # customer, supplier, nation, region all broadcast; only orders⋈lineitem
    # may shuffle
    assert plans.count_broadcast_joins(df) >= 4


def test_topk_uses_take_ordered(spark):
    df = topk_orders(spark, SF_SMALL)
    assert "TakeOrderedAndProject" in plans.formatted_plan(df)


def test_star_agg_single_fact_pass(spark):
    df = agg_conditional_pivot(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # orders must be scanned exactly once (conditional agg, not 4 sub-queries)
    assert plan.count("orders.parquet") <= 1 or plan.count("Scan parquet") <= 3
    assert plans.count_broadcast_joins(df) >= 2


def test_q6_full_pushdown_and_pruning(spark):
    from feature_datalake_sl_mandic_spark.operators.relational import q6_forecast_revenue

    df = q6_forecast_revenue(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # all four predicates reach the scan
    for frag in ("l_shipdate,1996-01-01", "l_discount,0.05", "l_quantity,24"):
        assert frag in plan, frag
    # 4 of lineitem's 11 columns read
    [schema] = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert "l_orderkey" not in schema and "l_comment" not in schema


def test_q9_broadcasts_dims_and_pushes_like(spark):
    from feature_datalake_sl_mandic_spark.operators.relational import (
        q9_product_profit_by_nation_year,
    )

    df = q9_product_profit_by_nation_year(spark, SF_SMALL)
    # part (LIKE-filtered), supplier, nation broadcast; only orders⋈lineitem shuffles
    assert plans.count_broadcast_joins(df) >= 3
    assert any("p_name" in f for f in plans.pushed_filters(df)), (
        "part name LIKE filter must reach the part scan"
    )


def test_q2_single_lineitem_scan_and_window_min(spark):
    from feature_datalake_sl_mandic_spark.operators.relational import (
        q2_min_cost_supplier,
    )

    df = q2_min_cost_supplier(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # the correlated min is decorrelated into ONE window over ONE cost
    # aggregation — lineitem must not be scanned twice
    assert plan.count("lineitem.parquet") <= 1
    assert plans.count_broadcast_joins(df) >= 2


def test_boilerplate_fact_never_shuffled(spark):
    from feature_datalake_sl_mandic_spark.operators.text import (
        corpus_boilerplate_tokens,
    )

    df = corpus_boilerplate_tokens(spark, SF_SMALL)
    plan = plans.formatted_plan(df)
    # the boilerplate vocabulary joins back via broadcast, not a shuffle of docs
    assert plans.count_broadcast_joins(df) >= 2


def test_mixture_resample_is_pure_projection(spark):
    from feature_datalake_sl_mandic_spark.operators.text import (
        corpus_mixture_resample,
    )

    df = corpus_mixture_resample(spark, SF_SMALL)
    # deterministic hash-bucket sampling: no aggregation, no join — the only
    # exchange allowed is the final global sort
    assert plans.count_shuffles(df) <= 2


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path_factory):
        """Both sides bucketed by the join key -> sort-merge join with zero
        Exchange operators; the same join unbucketed shuffles both sides."""
        from feature_datalake_sl_mandic_spark.sources.parquet import write_bucketed

        # warehouse dir is a static conf -> managed tables land in the
        # session default; DROP TABLE below removes the files.
        od = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        write_bucketed(od, "b_orders", "o_orderkey", 8)
        write_bucketed(li, "b_lineitem", "l_orderkey", 8)
        try:
            bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
            joined = bo.join(
                bl, bo.o_orderkey == bl.l_orderkey
            ).groupBy("o_orderkey").count()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan, plan
            # sanity: result matches the unbucketed join
            plain = od.join(li, od.o_orderkey == li.l_orderkey).groupBy("o_orderkey").count()
            assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")


class TestRound3GlobalWindowRemoval:
    """Round-3 rewrites: the former global-window top-k sites must stay free
    of Window operators, and the checkpointed heavy plans must keep their
    reduced shuffle counts."""

    def test_bm25_plan_has_no_window(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import text_bm25_search

        plan = plans.formatted_plan(text_bm25_search(spark, SF_SMALL))
        assert "Window" not in plan

    def test_cms_plan_has_no_window(self, spark):
        from feature_datalake_sl_mandic_spark.operators.sketches import (
            cms_heavy_hitters_events,
        )

        plan = plans.formatted_plan(cms_heavy_hitters_events(spark, SF_SMALL))
        assert "Window" not in plan

    def test_graph_edges_use_take_ordered(self, spark):
        from feature_datalake_sl_mandic_spark.operators.graph import _edges

        # _edges checkpoints its result, so assert on the pre-checkpoint
        # builder shape through a triangle query: no Window anywhere.
        from feature_datalake_sl_mandic_spark.operators.graph import (
            graph_cosupply_triangles,
        )

        assert "Window" not in plans.formatted_plan(
            graph_cosupply_triangles(spark, SF_SMALL)
        )
        assert _edges(spark, SF_SMALL).count() > 0

    def test_minhash_shuffles_stay_cut(self, spark):
        from feature_datalake_sl_mandic_spark.operators.dedup import dedup_minhash_lsh

        # 36 before round 3; localCheckpoint of shingles+candidates cut it
        # to 10. Allow slack for optimizer drift, but a regression to the
        # re-derivation regime (3x the shingle subtree) must fail.
        assert plans.count_shuffles(dedup_minhash_lsh(spark, SF_SMALL)) <= 16

    def test_sparse_cosine_shuffles_stay_cut(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import (
            text_sparse_cosine_pairs,
        )

        # 44 before round 3 (tokenization re-derived ~4x); now 14.
        assert plans.count_shuffles(text_sparse_cosine_pairs(spark, SF_SMALL)) <= 20


class TestRound3WaveFourPlans:
    """Plan-shape contracts for the wave-4 operators: blocking joins stay
    equi-joins (no cartesian), share-of-total stays window-free, and the
    checkpointed shared subtrees keep their reduced shuffle counts."""

    def test_er_blocking_is_equi_join_not_cartesian(self, spark):
        from feature_datalake_sl_mandic_spark.operators.linkage import (
            er_parts_scored_matches,
        )

        plan = plans.formatted_plan(er_parts_scored_matches(spark, SF_SMALL))
        assert "Cartesian" not in plan and "NestedLoop" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan

    def test_histogram_share_of_total_window_free(self, spark):
        from feature_datalake_sl_mandic_spark.operators.aggregates import (
            agg_histogram_order_value,
        )

        assert "Window" not in plans.formatted_plan(
            agg_histogram_order_value(spark, SF_SMALL)
        )

    def test_doc_hash_arrays_cap_stays_in_row(self, spark):
        """The array-form DF cap (round 6) must keep per-doc work in-row:
        the only Generate is the hot-set count's explode of already-hashed
        ints, the only shuffle is that count's partial aggregation, and no
        Window touches the shingle relation."""
        from feature_datalake_sl_mandic_spark.operators.dedup import (
            MINHASH_MAX_DF,
            doc_hash_arrays,
        )
        from feature_datalake_sl_mandic_spark.catalog import load_table

        dc = load_table(spark, SF_SMALL, "documents")
        import re

        df = doc_hash_arrays(dc, MINHASH_MAX_DF)
        plan = plans.formatted_plan(df)
        # one Generate NODE (each node appears once in the tree and once in
        # the numbered detail section)
        assert len(re.findall(r"\(\d+\) Generate", plan)) == 1
        assert "Window" not in plan
        # three Exchange nodes, ALL on the bounded hot-set side (the
        # distinct-hash count, its single-row collect_set rollup, and the
        # broadcast of that row) — count() sees each twice in the
        # formatted plan. The per-doc array relation itself never shuffles.
        assert plans.count_shuffles(df) <= 6
        assert plan.count("BroadcastExchange") == 2  # one broadcast node
        # the cap semantics survive the fold: capped output is a subset of
        # each doc's uncapped array and a non-empty relation at sf0.001
        assert df.count() > 0

    def test_jsd_tokenizes_once(self, spark):
        """After the checkpoint, the pair join's plan must not re-derive the
        tokenize->count relation per subtree (shuffle count stays low)."""
        from feature_datalake_sl_mandic_spark.operators.text import (
            corpus_js_divergence_sources,
        )

        assert plans.count_shuffles(
            corpus_js_divergence_sources(spark, SF_SMALL)
        ) <= 10

    def test_weighted_reservoir_pushes_scan_to_three_columns(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import (
            sample_weighted_reservoir,
        )

        rs = plans.read_schemas(sample_weighted_reservoir(spark, SF_SMALL))
        assert rs and all(s.count(":") <= 3 for s in rs)

    def test_two_stage_rerank_broadcasts_shortlist_side(self, spark):
        from feature_datalake_sl_mandic_spark.operators.similarity import (
            ann_two_stage_rerank,
        )

        df = ann_two_stage_rerank(spark, SF_SMALL)
        assert plans.count_broadcast_joins(df) >= 2  # query side + shortlist


class TestRound4PlanCuts:
    """Pin the round-4 shuffle-count cuts so a refactor can't silently
    regress them (counts are formatted-plan 'Exchange' occurrences — about
    2x the physical exchange count; bounds leave one exchange of slack)."""

    def test_referential_integrity_shares_one_aggregation(self, spark):
        from feature_datalake_sl_mandic_spark.operators.validation import (
            validate_referential_integrity,
        )

        assert plans.count_shuffles(
            validate_referential_integrity(spark, SF_SMALL)
        ) <= 12  # was 36 before the tall-union rewrite

    def test_kmv_single_pair_aggregation(self, spark):
        from feature_datalake_sl_mandic_spark.operators.sketches import (
            sketch_kmv_set_algebra_users,
        )

        assert plans.count_shuffles(
            sketch_kmv_set_algebra_users(spark, SF_SMALL)
        ) <= 18  # was 38 before the array-fold rewrite

    def test_matryoshka_single_corpus_scan(self, spark):
        from feature_datalake_sl_mandic_spark.operators.retrieval import (
            eval_matryoshka_recall,
        )

        df = eval_matryoshka_recall(spark, SF_SMALL)
        assert plans.count_shuffles(df) <= 18  # was 28 with four scans
        # one corpus scan serves all four dim budgets; the remaining scans
        # belong to the exact-kNN ground-truth subtree (formatted plans list
        # each node twice — tree + detail section)
        assert plans.formatted_plan(df).count("Scan parquet") <= 8

    def test_kmeans_checkpointed_init_assignment(self, spark):
        from feature_datalake_sl_mandic_spark.operators.clustering import (
            kmeans_lloyd_embeddings,
        )

        assert plans.count_shuffles(kmeans_lloyd_embeddings(spark, SF_SMALL)) <= 14


class TestRound6BandedCurationPlans:
    """Round-6 rewrites (verdict asks #2-3): the curation cap/split plans
    must never rank document rows in a window partitioned on the raw
    low-cardinality key — every row_number windowspecdefinition has to
    carry the md5 ``band`` column. (Prefix-sum windows partitioned on
    lang/source alone are fine: they run over the bounded <=|keys|x256
    per-band count relation, not over documents.)"""

    @staticmethod
    def _row_number_specs(plan: str) -> list[str]:
        return [
            ln
            for ln in plan.splitlines()
            if "row_number() windowspecdefinition" in ln
        ]

    def _assert_banded(self, df):
        specs = self._row_number_specs(plans.formatted_plan(df))
        assert specs, "expected a boundary-band row_number in the plan"
        for ln in specs:
            assert "band#" in ln, f"unbanded document-level rank window: {ln}"

    def test_split_exact_stratified_ranks_only_inside_bands(self, spark):
        from feature_datalake_sl_mandic_spark.operators.curation import (
            split_exact_stratified,
        )

        self._assert_banded(split_exact_stratified(spark, SF_SMALL))

    def test_corpus_domain_caps_ranks_only_inside_bands(self, spark):
        from feature_datalake_sl_mandic_spark.operators.curation import (
            corpus_domain_caps,
        )

        self._assert_banded(corpus_domain_caps(spark, SF_SMALL))

    def test_curation_end_to_end_cap_stage_is_banded(self, spark):
        from feature_datalake_sl_mandic_spark.operators.curation import (
            corpus_curation_end_to_end,
        )

        # The dedup stages rank on 16-byte content hashes (high-cardinality,
        # skew-free) — only the cap stage's rank must carry the band. All
        # row_number windows here partition on either a hash column or
        # (source, band); none on bare source/lang.
        plan = plans.formatted_plan(corpus_curation_end_to_end(spark, SF_SMALL))
        for ln in self._row_number_specs(plan):
            assert (
                "band#" in ln or "_w0#" in ln or "fp#" in ln or "md5(" in ln
            ), f"cap-stage rank window lost its band: {ln}"

    def test_temperature_resample_has_no_document_window(self, spark):
        from feature_datalake_sl_mandic_spark.operators.curation import (
            corpus_temperature_resample,
        )

        # n_kept = least(n_target, n_docs): pure arithmetic over the
        # |langs|-row statistics relation — no Window operator anywhere.
        plan = plans.formatted_plan(corpus_temperature_resample(spark, SF_SMALL))
        assert "Window" not in plan

    def test_gini_has_no_row_level_rank_window(self, spark):
        from feature_datalake_sl_mandic_spark.operators.profile import (
            stats_gini_order_values,
        )

        # ranks collapse to tie arithmetic over distinct (seg, v): the plan
        # must carry no row_number at all, and its running-sum windows key
        # on (seg, pband) / band totals, never on bare seg over fact rows.
        plan = plans.formatted_plan(stats_gini_order_values(spark, SF_SMALL))
        assert "row_number" not in plan


class TestRound6SingleScanFolds:
    """Late-round-6 single-scan rewrites: each plan must scan its fact
    table once (plan-probe finding: repeated same-table scans re-execute
    the scan subtree per consumer — at 100 TB the extra scans dominate).
    Formatted plans list each scan in both tree and detail sections, so a
    substring count of 2 means ONE physical scan."""

    @staticmethod
    def _scan_count(df, table: str) -> int:
        plan = plans.formatted_plan(df)
        import re

        return len(
            re.findall(
                rf"Location: InMemoryFileIndex[^\[]*\[[^\]]*?{table}\.parquet",
                plan,
            )
        )

    def test_q21_scans_lineitem_once(self, spark):
        from feature_datalake_sl_mandic_spark.operators.relational import (
            q21_sole_late_supplier,
        )

        df = q21_sole_late_supplier(spark, SF_SMALL)
        assert self._scan_count(df, "lineitem") == 1
        assert self._scan_count(df, "orders") == 1

    def test_q17_scans_each_table_once(self, spark):
        from feature_datalake_sl_mandic_spark.operators.relational import (
            q17_small_quantity_revenue,
        )

        df = q17_small_quantity_revenue(spark, SF_SMALL)
        assert self._scan_count(df, "lineitem") == 1
        assert self._scan_count(df, "part") == 1

    def test_referential_integrity_scans_lineitem_once(self, spark):
        from feature_datalake_sl_mandic_spark.operators.validation import (
            validate_referential_integrity,
        )

        df = validate_referential_integrity(spark, SF_SMALL)
        # lineitem carries three FK edges; one exploded scan serves all
        assert self._scan_count(df, "lineitem") == 1
        assert self._scan_count(df, "nation") == 1

    def test_rouge_in_row_fold_no_gram_stage(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import (
            eval_rouge_redaction_impact,
        )

        df = eval_rouge_redaction_impact(spark, SF_SMALL)
        plan = plans.formatted_plan(df)
        # round-6 fold: the gram multiset never leaves the row — no explode
        # generate, no (doc, gram) join, one documents scan; the only
        # shuffles left are the bounded per-source rollup + output sort
        assert "Generate" not in plan
        assert "Join" not in plan
        assert self._scan_count(df, "documents") == 1

    def test_repetition_stats_in_row_fold(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import (
            quality_repetition_stats,
        )

        df = quality_repetition_stats(spark, SF_SMALL)
        plan = plans.formatted_plan(df)
        # sorted-run fold: no explode, no (doc, bigram) agg, no join-back;
        # the only exchange left is the output range sort
        assert "Generate" not in plan
        assert "Join" not in plan
        assert "Exchange hashpartitioning" not in plan
        assert self._scan_count(df, "documents") == 1

    def test_simhash_in_row_fold(self, spark):
        from feature_datalake_sl_mandic_spark.operators.dedup import (
            dedup_simhash,
        )

        df = dedup_simhash(spark, SF_SMALL)
        plan = plans.formatted_plan(df)
        # 32-slot array-accumulator fold: no explode, no groupBy(doc_id)
        assert "Generate" not in plan
        assert "Exchange hashpartitioning" not in plan
        assert self._scan_count(df, "documents") == 1

    def test_pca_iteration_is_one_bounded_task(self, spark):
        from feature_datalake_sl_mandic_spark.operators.clustering import (
            embedding_pca_power_iteration,
        )

        df = embedding_pca_power_iteration(spark, SF_SMALL)
        plan = plans.formatted_plan(df)
        # corpus pass + covariance agg + single-group solve: the ~10-job
        # relational squaring/iteration chain must not reappear
        assert self._scan_count(df, "embeddings") <= 2  # corpus + means pass
        assert plan.count("FlatMapGroupsInPandas") >= 1


class TestGroupedTopkBandedPlans:
    """Per-group top-k selections over fact/vocabulary-scale inputs must go
    through the banded two-phase ``grouped_topk`` (or an equivalent banded
    decomposition): at least one row_number window in the plan must carry
    the band column, proving the bare-low-cardinality-key single-window
    form hasn't crept back (its final bounded-candidate rank may still
    partition on the bare key — that's the cheap stage)."""

    def _assert_has_banded_stage(self, df):
        plan = plans.formatted_plan(df)
        specs = [
            ln
            for ln in plan.splitlines()
            if "row_number() windowspecdefinition" in ln
        ]
        assert specs, "expected a row_number somewhere in the plan"
        assert any(
            "band#" in ln for ln in specs
        ), f"no banded local-topk stage found:\n" + "\n".join(specs)

    def test_weighted_reservoir(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import (
            sample_weighted_reservoir,
        )

        self._assert_has_banded_stage(sample_weighted_reservoir(spark, SF_SMALL))

    def test_zipf_head_terms(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import corpus_zipf_fit

        self._assert_has_banded_stage(corpus_zipf_fit(spark, SF_SMALL))

    def test_kmv_sketch_build_uses_grouped_topk(self, spark):
        # the k-smallest-hashes selection sits behind an eager
        # localCheckpoint, so the returned DataFrame's plan starts at the
        # checkpointed RDD and can't show the banded stage — pin the call
        # at source level instead
        import inspect

        from feature_datalake_sl_mandic_spark.operators.sketches import (
            sketch_kmv_set_algebra_users,
        )

        src = inspect.getsource(sketch_kmv_set_algebra_users)
        assert "grouped_topk(" in src
        assert 'partitionBy("event_type").orderBy("hv")' not in src

    def test_kmeans_balanced_sample(self, spark):
        from feature_datalake_sl_mandic_spark.operators.clustering import (
            kmeans_balanced_sample,
        )

        self._assert_has_banded_stage(kmeans_balanced_sample(spark, SF_SMALL))

    def test_neyman_selection(self, spark):
        from feature_datalake_sl_mandic_spark.operators.events import (
            sample_stratified_neyman,
        )

        self._assert_has_banded_stage(sample_stratified_neyman(spark, SF_SMALL))

    def test_bigram_successor_ranks(self, spark):
        from feature_datalake_sl_mandic_spark.operators.text import (
            lm_bigram_kneser_ney,
            lm_bigram_next_tokens,
        )

        self._assert_has_banded_stage(lm_bigram_next_tokens(spark, SF_SMALL))
        self._assert_has_banded_stage(lm_bigram_kneser_ney(spark, SF_SMALL))
