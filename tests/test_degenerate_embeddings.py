"""Degenerate-embedding oracle parity for every cosine-space query.

The round-6 audit planted a single zero-norm vector in the embeddings table
and EVERY cosine-space query (13 of them) died with an ANSI divide-by-zero;
`knn_cosine_matmul`'s numpy path silently produced NaN cosines and
mismatched its oracle instead. The fixed contract: zero-norm vectors carry
no direction, so cosine-space queries exclude them at the base relation on
BOTH engines (`similarity._nonzero` / `_NONZERO_SQL`); quantized paths also
guard RECONSTRUCTED norms (SQ8 dequantization and PQ codebook assignment can
produce the zero vector from nonzero input), and the matryoshka sweep guards
per-budget PREFIX norms (a nonzero vector can have an all-zero leading
slice). These tests pin all of that with the driver's own DuckDB comparison
over a fixture containing a zero vector, a zero-prefix vector, and
duplicated constant vectors.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from feature_datalake_sl_mandic_spark import registry
from feature_datalake_sl_mandic_spark.oracle import compare

SPECS = registry.load_all()
DIM = 64

# Every embedding-reading query with an embeddings-only oracle. The
# distance-space ones (k-means, PCA, Mahalanobis, standardize, norms, drift)
# are included deliberately: they must KEEP the zero vector and still match.
COSINE_QUERIES = [
    "knn_cosine_topk",
    "knn_cosine_matmul",
    "ann_lsh_bucketed",
    "ann_ivf_cells",
    "ann_ivf_cells_nprobe2",
    "ann_scalar_quantized",
    "ann_ivf_pq",
    "ann_ivf_pq_packed",
    "ann_pq_lloyd_refined",
    "ann_two_stage_rerank",
    "mine_hard_negatives",
    "dedup_embedding_cosine",
    "semdedup_cluster_cosine",
    "eval_matryoshka_recall",
]
DISTANCE_QUERIES = [
    "kmeans_lloyd_embeddings",
    "kmeans_balanced_sample",
    "embedding_pca_power_iteration",
    "embedding_outliers_mahalanobis",
    "embedding_standardize_dims",
    "drift_embedding_centroid_shift",
]


@pytest.fixture(scope="module")
def degen_emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen_emb"))
    random.seed(7)
    rows = []
    for i in range(40):
        if i in (5, 17):
            # zero vectors: one ordinary corpus row AND one inside the PQ
            # seed range [10, 26) — a zeroed seed removes codebook entry
            # j = 7, which is what broke the packed LUT's positional
            # element_at (every entry after the hole shifted one slot)
            emb = [0.0] * DIM
        elif i == 7:
            emb = [0.0] * 16 + [1.0] * 48  # zero prefix, nonzero vector
        elif i in (9, 11):
            emb = [1.0] * DIM  # duplicated constants (cosine ties at 1.0)
        else:
            emb = [round(random.uniform(-1, 1), 3) for _ in range(DIM)]
        rows.append((i, emb, i % 3))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("query", COSINE_QUERIES + DISTANCE_QUERIES)
def test_degenerate_embeddings_match_oracle(spark, degen_emb_dir, query):
    spec = SPECS[query]
    spdf = spec.fn(spark, degen_emb_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(degen_emb_dir, 'embeddings.parquet')}/*.parquet')"
    )
    dkdf = con.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, query) if "WARNING" not in e]
    assert not errs, "\n".join(errs)


@pytest.fixture(scope="module")
def nan_inf_emb_dir(spark, tmp_path_factory):
    """NaN/Inf-poisoned lake (round 7): corrupt encoder output is the
    production case the zero-vector audit missed. A round-7 probe showed
    NO query crashed on this lake — 16 silently emitted NaN/Inf into
    hash-checked output, because Spark's NaN semantics make ``NaN > 0``
    TRUE (the zero-norm guard passed corrupt vectors) and NaN sorts ABOVE
    every real cosine (corrupt rows ranked FIRST in top-k). Poison sits in
    every sensitive range: an ordinary corpus row, the PQ seed range
    (a NaN seed would poison a codebook entry), and the query range
    (vec_id < N_QUERIES)."""
    d = str(tmp_path_factory.mktemp("nan_inf_emb"))
    random.seed(11)
    nan, inf = float("nan"), float("inf")
    rows = []
    for i in range(40):
        emb = [round(random.uniform(-1, 1), 3) for _ in range(DIM)]
        if i == 2:  # query range: NaN entry
            emb[3] = nan
        elif i == 6:  # corpus row: +Inf entry
            emb[5] = inf
        elif i == 12:  # PQ seed range [10, 26): -Inf entry
            emb[0] = -inf
        elif i == 15:  # PQ seed range: every entry NaN
            emb = [nan] * DIM
        elif i == 30:  # NaN and Inf together (sum is NaN)
            emb[1], emb[2] = nan, inf
        rows.append((i, emb, i % 3))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("query", COSINE_QUERIES + DISTANCE_QUERIES)
def test_nan_inf_embeddings_match_oracle(spark, nan_inf_emb_dir, query):
    """Both engines must agree on the poisoned lake AND the checked output
    must contain no NaN/Inf anywhere — the finite guard excludes corrupt
    vectors at every numeric base relation, mirrored in every oracle."""
    spec = SPECS[query]
    spdf = spec.fn(spark, nan_inf_emb_dir).toPandas()
    for col in spdf.columns:
        vals = spdf[col]
        if vals.dtype.kind == "f":
            import numpy as np

            assert np.isfinite(vals.dropna()).all(), (query, col)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{os.path.join(nan_inf_emb_dir, 'embeddings.parquet')}/*.parquet')"
    )
    dkdf = con.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, query) if "WARNING" not in e]
    assert not errs, "\n".join(errs)
