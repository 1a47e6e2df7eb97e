"""ANN operators: brute-force baseline vs IVF scale path."""

import pytest

from schemasaurus_spark.operators import similarity as sim

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]


def test_brute_force_topk_self_first(emb, qvec):
    rows = sim.cosine_topk(emb, qvec, k=5).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["score"] == 1.0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_ivf_recall_against_brute_force(emb, qvec):
    """IVF with generous probes must recover most of the exact top-k."""
    exact = {r["vec_id"] for r in sim.cosine_topk(emb, qvec, k=10).collect()}
    ivf = {r["vec_id"] for r in sim.ann_ivf_topk(
        emb, qvec, k=10, n_probe=8,
        centroids=sim.ivf_train_centroids(emb, n_centroids=16)).collect()}
    recall = len(exact & ivf) / 10
    assert recall >= 0.5, f"recall {recall}"


def test_ivf_probes_subset_of_table(emb, qvec):
    """The probed candidate set must be a strict subset (the point of IVF)."""
    cents = sim.ivf_train_centroids(emb, n_centroids=16)
    assigned = sim.ivf_assign(emb, cents)
    total = emb.count()
    largest = assigned.groupBy("cluster").count().agg({"count": "max"}).first()[0]
    assert largest < total  # more than one cluster in use


def test_ivf_training_deterministic(emb):
    import numpy as np

    a = sim.ivf_train_centroids(emb, n_centroids=8, seed=7)
    b = sim.ivf_train_centroids(emb, n_centroids=8, seed=7)
    assert np.allclose(a, b)


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The persisted IVF index is partitioned by cluster; a probe query's
    scan must show a cluster PartitionFilter (files outside the probed
    clusters are never read) — the 100 TB probe path."""
    from schemasaurus_spark.operators.similarity import (
        ann_ivf_topk_from_index, ivf_train_centroids, ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_train_centroids(emb, n_centroids=4, sample_rows=500)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(emb, cents, path)

    q = [float(x) for x in emb.first()["embedding"]]
    res = ann_ivf_topk_from_index(spark, path, cents, q, k=5, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    rows = res.collect()
    assert len(rows) == 5
    assert rows[0]["score"] >= rows[-1]["score"]


def test_ivf_train_sample_unbiased(spark):
    """Reservoir sampling sees all partitions (not just the first ones):
    train on a table whose last partitions hold a distinct cluster and
    check a centroid lands near it."""
    import numpy as np
    from pyspark.sql import functions as F
    from schemasaurus_spark.operators.similarity import ivf_train_centroids

    a = spark.range(400).select(
        F.array(F.lit(0.0), F.lit(0.0)).alias("embedding"))
    b = spark.range(400).select(
        F.array(F.lit(9.0), F.lit(9.0)).alias("embedding"))
    both = a.repartition(4).union(b.repartition(4))  # cluster B only in the tail
    cents = ivf_train_centroids(both, n_centroids=2, sample_rows=200, seed=7)
    dists = np.abs(np.asarray(cents) - 9.0).sum(1)
    assert dists.min() < 1.0, f"no centroid near the tail cluster: {cents}"
