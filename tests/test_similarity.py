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
