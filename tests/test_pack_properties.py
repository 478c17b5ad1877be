"""Property tests for ``pack_shard_assignments`` (operators/text.py): the
two-level (lang, doc-range-bucket) prefix-sum packer must satisfy the packing
CONTRACT on arbitrary corpora, not just the fixture:

- every document is assigned to exactly one shard;
- the assignment equals the single-window reference formulation (running
  token sum per lang ordered by doc_id, floor-divided by the budget) — the
  two-level rewrite exists purely so no single task owns a whole language;
- shard ids per language are dense from 0 and non-decreasing in doc_id;
- every shard except possibly a language's LAST one ends because adding its
  successor document would cross a budget boundary (no premature splits).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PROP_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (doc_id, lang, n_tokens): ids unique; token counts span tiny..bigger-than-
# budget/4 so shards of 1..many docs occur; a couple of langs so the
# per-lang partitioning path is exercised.
_docs_st = st.lists(
    st.tuples(
        st.integers(0, 400),
        st.sampled_from(["aa", "bb"]),
        st.integers(1, 900),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _df(spark, rows):
    df = spark.createDataFrame(
        [(i, lg, " ".join(["w"] * n)) for i, lg, n in rows],
        "doc_id long, lang string, text string",
    )
    return df


def _reference(spark, rows):
    """Single-window formulation: per-lang running token sum over doc_id
    order; shard = floor((running - n) / budget)."""
    from feature_datalake_sl_mandic_spark.operators.text import SHARD_TOKEN_BUDGET

    df = _df(spark, rows)
    t = df.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.withColumn(
        "shard_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / SHARD_TOKEN_BUDGET),
    ).select("doc_id", "lang", "n_tokens", "shard_id")


class TestPackShardProperties:
    @given(rows=_docs_st)
    @settings(**PROP_SETTINGS)
    def test_matches_single_window_reference(self, spark, rows):
        from feature_datalake_sl_mandic_spark.operators.text import (
            pack_shard_assignments,
        )

        got = {
            (r.doc_id, r.lang): r.shard_id
            for r in pack_shard_assignments(_df(spark, rows)).collect()
        }
        want = {
            (r.doc_id, r.lang): r.shard_id
            for r in _reference(spark, rows).collect()
        }
        assert got == want

    @given(rows=_docs_st)
    @settings(**PROP_SETTINGS)
    def test_complete_dense_and_monotone(self, spark, rows):
        from feature_datalake_sl_mandic_spark.operators.text import (
            SHARD_TOKEN_BUDGET,
            pack_shard_assignments,
        )

        out = pack_shard_assignments(_df(spark, rows)).collect()
        assert len(out) == len(rows)  # every doc assigned exactly once
        per_lang: dict[str, list] = {}
        for r in sorted(out, key=lambda r: (r.lang, r.doc_id)):
            per_lang.setdefault(r.lang, []).append(r)
        for lang, rs in per_lang.items():
            sids = [r.shard_id for r in rs]
            assert sids[0] == 0, lang
            assert all(b - a in (0, 1) or b >= a for a, b in zip(sids, sids[1:]))
            assert sorted(set(sids)) == list(range(max(sids) + 1)), lang
            # boundary law: a new shard starts exactly when the running total
            # crosses a budget multiple
            running = 0
            for r in rs:
                assert r.shard_id == running // SHARD_TOKEN_BUDGET
                running += r.n_tokens
