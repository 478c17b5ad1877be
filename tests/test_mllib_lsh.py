"""MLlib LSH cross-check (SURVEY.md §2.3 names these as candidate primitives).

The engine's production near-dup/ANN paths are the hand-built deterministic
ones (operators/dedup.py, operators/similarity.py — md5 hash families, fully
oracle-checked). These tests exercise the BUILT-IN MLlib alternatives on the
same fixture data and cross-validate them against the exact answers, proving
the pyspark.ml path is available and agrees:

- BucketedRandomProjectionLSH (L2) approxNearestNeighbors finds the true
  brute-force nearest neighbor on the embeddings fixture;
- MinHashLSH approxSimilarityJoin over shingle sets recovers the known
  near-duplicate pairs that the deterministic MinHash pipeline finds.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def embeddings(spark):
    from pyspark.ml.functions import array_to_vector
    import pyspark.sql.functions as F

    df = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    return df.select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    ).cache()


def test_brp_lsh_finds_true_nearest(spark, embeddings):
    import pyspark.sql.functions as F
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=6, seed=42
    )
    model = brp.fit(embeddings)
    query = embeddings.where(F.col("vec_id") == 0).first()

    # brute-force true nearest (excluding self) via exact L2
    from pyspark.ml.functions import vector_to_array

    arr = embeddings.select("vec_id", vector_to_array("features").alias("a"))
    qa = [r.a for r in arr.where(F.col("vec_id") == 0).collect()][0]
    dists = (
        arr.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "a", F.array(*[F.lit(x) for x in qa]), lambda p, q: (p - q) * (p - q)
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("d"),
        )
        .orderBy("d")
    )
    true_nn = dists.first().vec_id

    approx = model.approxNearestNeighbors(
        embeddings.where(F.col("vec_id") != 0), query.features, 5
    )
    got = {r.vec_id for r in approx.collect()}
    assert true_nn in got


def test_minhash_lsh_recovers_known_near_dups(spark):
    import pyspark.sql.functions as F
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    shingled = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(F.split("text", " ")) - 3, F.lit(0))
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split(F.col("text"), " "), i + 1, 3)
                ),
            )
        ).alias("shingles"),
    ).where(F.size("shingles") >= 3)
    cv = CountVectorizer(inputCol="shingles", outputCol="features", binary=True)
    cvm = cv.fit(shingled)
    vecs = cvm.transform(shingled)
    # MinHashLSH requires at least one non-zero entry
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=7)
    model = mh.fit(vecs)
    pairs = (
        model.approxSimilarityJoin(vecs, vecs, 0.5, distCol="jaccard_dist")
        .where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
    )
    got = {(r.a, r.b) for r in pairs.collect()}

    # exact Jaccard >= 0.5 ground truth via a self-join on shingles
    a = shingled.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sa"))
    b = shingled.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sb"))
    exact = (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_distinct(F.concat("sa", "sb")))
            ).alias("j"),
        )
        .where(F.col("j") >= 0.5)
    )
    want = {(r.a, r.b) for r in exact.collect()}
    assert want, "fixture should contain at least one true near-dup pair"
    # LSH is approximate-recall: it must find most true pairs and, at this
    # threshold, everything it reports must satisfy the distance bound.
    assert len(want & got) >= int(0.8 * len(want))
