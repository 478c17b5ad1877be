"""Round-3 semantic tests: the IVF nprobe recall dial.

The DuckDB hash gate proves each nprobe point computes what it claims; these
tests prove the claims COMPOSE into the advertised recall/throughput dial:
more probed cells -> monotonically better recall, and exhaustive probing
(nprobe = K_CELLS) recovers exact kNN identically."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


class TestIvfNprobeDial:
    def test_recall_monotone_and_floor(self, spark):
        from feature_datalake_sl_mandic_spark.operators import similarity as S

        exact = _pairs(S.knn_cosine_topk(spark, SF_SMALL))
        recall = {
            n: len(_pairs(S.ivf_topk(spark, SF_SMALL, nprobe=n)) & exact)
            / len(exact)
            for n in (1, 2, S.K_CELLS)
        }
        assert recall[1] <= recall[2] <= recall[S.K_CELLS]
        # Measured on the fixture: 0.30 / 0.72 / 1.00. The floors assert the
        # dial moves materially, with slack for fixture regeneration.
        assert recall[2] >= recall[1] + 0.2
        assert recall[2] >= 0.6

    def test_exhaustive_probe_equals_exact_knn(self, spark):
        from feature_datalake_sl_mandic_spark.operators import similarity as S

        exact = _pairs(S.knn_cosine_topk(spark, SF_SMALL))
        assert _pairs(S.ivf_topk(spark, SF_SMALL, nprobe=S.K_CELLS)) == exact

    def test_nprobe2_candidates_disjoint_cells(self, spark):
        """Each neighbor is found in exactly one (its own) cell — the reason
        the nprobe union needs no dedup."""
        from feature_datalake_sl_mandic_spark.operators import similarity as S

        rows = S.ivf_topk(spark, SF_SMALL, nprobe=2).collect()
        assert len({(r.query_id, r.neighbor_id) for r in rows}) == len(rows)
