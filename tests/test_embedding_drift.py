"""Embedding-centroid drift (aggregates.embedding_centroids /
embedding_drift_check): per-group mean-vector shift vs a checkpointed
baseline — the drift monitor for embedding columns, where PSI/KS on
marginal histograms can miss a translation in vector space."""

import pyspark.sql.functions as F

from schemasaurus_spark.operators.aggregates import (
    embedding_centroids,
    embedding_drift_check,
)


def _emb(spark, shift=0.0, group="web", n=60):
    rows = [(f"d{i}", group,
             [float((i % 7) - 3) + shift, float((i % 5) - 2), 1.0])
            for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id string, source string, embedding array<double>")


def test_centroids_long_form(spark):
    df = _emb(spark).unionByName(_emb(spark, group="books"))
    cents = embedding_centroids(df, "embedding", by="source").collect()
    assert len(cents) == 6  # 2 groups x dim 3
    by = {(r["group_key"], r["pos"]): r for r in cents}
    assert by[("web", 2)]["mean"] == 1.0
    assert by[("web", 0)]["n"] == 60


def test_no_drift_same_distribution(spark):
    base = embedding_centroids(_emb(spark), "embedding", by="source")
    res = embedding_drift_check(_emb(spark), base, "embedding", by="source")
    assert len(res) == 1 and res[0].passed
    assert res[0].cosine_dist == 0.0 and res[0].l2_shift == 0.0


def test_translation_fires_where_histograms_would_not(spark):
    """Shifting every vector by a constant moves the centroid; the check
    fires on cosine or L2 even though per-dimension histogram SHAPES are
    identical (just translated)."""
    base = embedding_centroids(_emb(spark), "embedding", by="source")
    cur = _emb(spark, shift=2.5)
    res = embedding_drift_check(cur, base, "embedding", by="source",
                                cosine_threshold=0.02, l2_threshold=1.0)
    assert len(res) == 1 and not res[0].passed
    assert res[0].l2_shift > 1.0


def test_novel_and_vanished_groups_fail(spark):
    base = embedding_centroids(_emb(spark, group="web"), "embedding",
                               by="source")
    cur = _emb(spark, group="books")
    res = embedding_drift_check(cur, base, "embedding", by="source")
    got = {r.group_key: r.passed for r in res}
    assert got == {"web": False, "books": False}


def test_null_embeddings_ignored_and_zero_norm(spark):
    df = _emb(spark).withColumn(
        "embedding",
        F.when(F.col("doc_id") == "d0", F.lit(None)
               .cast("array<double>")).otherwise(F.col("embedding")))
    base = embedding_centroids(df, "embedding", by="source")
    res = embedding_drift_check(df, base, "embedding", by="source")
    assert res[0].passed and res[0].n == 59
    # both-zero centroids: distance 0, passes
    z = spark.createDataFrame([("a", "g", [0.0, 0.0])],
                              "doc_id string, source string, "
                              "embedding array<double>")
    zb = embedding_centroids(z, "embedding", by="source")
    zres = embedding_drift_check(z, zb, "embedding", by="source")
    assert zres[0].passed and zres[0].cosine_dist == 0.0
