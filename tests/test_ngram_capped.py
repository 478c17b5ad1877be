"""DF-capped ngram near-dup variants (round-8 verdict ask #2).

``dedup_ngram_jaccard`` / ``dedup_ngram_containment`` define the exact
oracle semantics over UNCAPPED shingles; the ``_capped`` twins are the
100 TB scale path, built on ``shingles_with_df_cap`` so no single shingle
contributes more than ~max_df^2 candidate pairs. Value correctness is the
DuckDB hash gate's job (the cap is mirrored in the oracle SQL); these tests
pin the RELATIONSHIP between the two forms:

- an unreachable cap degenerates the capped pipeline to the exact uncapped
  semantics (same pairs, same scores) — the cap is the only difference;
- the registered cap actually enforces its bound on the shingle relation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_huge_cap_degenerates_to_uncapped(spark):
    from feature_datalake_sl_mandic_spark.operators import dedup as D
    from feature_datalake_sl_mandic_spark.operators.relational import _t

    (dc,) = _t(spark, SF_SMALL, "documents")
    sh_uncapped = D._spark_shingles(dc).localCheckpoint()
    sh_huge_cap = D.shingles_with_df_cap(dc, 10**9).localCheckpoint()
    assert _rows(D._jaccard_pairs(sh_huge_cap)) == _rows(
        D._jaccard_pairs(sh_uncapped)
    )
    assert _rows(D._containment_pairs(sh_huge_cap)) == _rows(
        D._containment_pairs(sh_uncapped)
    )


def test_registered_cap_bounds_shingle_df(spark):
    from feature_datalake_sl_mandic_spark.operators import dedup as D
    from feature_datalake_sl_mandic_spark.operators.relational import _t

    (dc,) = _t(spark, SF_SMALL, "documents")
    capped = D.shingles_with_df_cap(dc, D.NGRAM_MAX_DF)
    over = (
        capped.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > D.NGRAM_MAX_DF)
        .count()
    )
    assert over == 0


def test_grouped_pipeline_matches_join_form(spark):
    """Round-11 optimization guard: the grouped inverted-index pipeline
    (capped_shingle_arrays + _grouped_pair_counts, one string shuffle) must
    produce EXACTLY the join-form pipeline's rows — for the registered cap
    and for an unreachable cap (empty hot set / array_except no-op path)."""
    from feature_datalake_sl_mandic_spark.operators import dedup as D
    from feature_datalake_sl_mandic_spark.operators.relational import _t

    (dc,) = _t(spark, SF_SMALL, "documents")
    for cap in (D.NGRAM_MAX_DF, 3, 10**9):
        sh = D.shingles_with_df_cap(dc, cap).localCheckpoint()
        pc = D._grouped_pair_counts(D.capped_shingle_arrays(dc, cap))
        jac_g = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        grouped_jac = (
            pc.where(jac_g >= D.JACCARD_THRESHOLD)
            .select("doc_a", "doc_b", F.round(jac_g, 6).alias("jaccard"))
        )
        assert _rows(grouped_jac) == _rows(D._jaccard_pairs(sh)), f"cap={cap}"
        ca, cb = F.col("n_inter") / F.col("n_a"), F.col("n_inter") / F.col("n_b")
        grouped_con = (
            pc.where(F.greatest(ca, cb) >= D.CONTAINMENT_THRESHOLD)
            .select(
                "doc_a", "doc_b", "n_inter",
                F.round(ca, 6).alias("containment_a"),
                F.round(cb, 6).alias("containment_b"),
            )
        )
        assert _rows(grouped_con) == _rows(D._containment_pairs(sh)), f"cap={cap}"


def test_capped_shingle_arrays_matches_exploded_cap(spark):
    """capped_shingle_arrays == shingles_with_df_cap grouped per doc (set
    AND size), so the in-row n the grouped pipeline carries equals the
    sizes-join n of the join form."""
    from feature_datalake_sl_mandic_spark.operators import dedup as D
    from feature_datalake_sl_mandic_spark.operators.relational import _t

    (dc,) = _t(spark, SF_SMALL, "documents")
    arrays = {
        r["doc_id"]: (r["n"], set(r["ss"]))
        for r in D.capped_shingle_arrays(dc, D.NGRAM_MAX_DF).collect()
    }
    exploded = {}
    for r in D.shingles_with_df_cap(dc, D.NGRAM_MAX_DF).collect():
        exploded.setdefault(r["doc_id"], set()).add(r["s"])
    assert {d: (len(s), s) for d, s in exploded.items()} == arrays


def test_capped_queries_emit_pairs(spark):
    from feature_datalake_sl_mandic_spark.operators import dedup as D

    jac = D.dedup_ngram_jaccard_capped(spark, SF_SMALL)
    con = D.dedup_ngram_containment_capped(spark, SF_SMALL)
    assert jac.count() > 0 and con.count() > 0
    assert jac.columns == ["doc_a", "doc_b", "jaccard"]
    assert con.columns == [
        "doc_a",
        "doc_b",
        "n_inter",
        "containment_a",
        "containment_b",
    ]
