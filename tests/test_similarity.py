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


# ---------------------------------------------------------- round-3: LSH scale


def test_auto_n_bits_scales_with_corpus():
    assert sim.auto_n_bits(1_000, 1024) == 8          # floor
    assert sim.auto_n_bits(1_000_000, 1024) == 10     # ~1k/bucket
    assert sim.auto_n_bits(10**9, 1024) == 20
    assert sim.auto_n_bits(10**12, 1024) == 24        # ceiling
    assert sim.auto_n_bits(10**12, 1024, hi=40) == 30


def test_bucket_cap_bounds_skewed_fanout(spark):
    """Degenerate fixture: every vector identical → ONE bucket. Uncapped,
    the self-join is N² pairs; with bucket_cap the candidate side is capped,
    so output ≤ N·cap — the skew valve for web-scale hot buckets."""
    n = 60
    rows = [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # k far above the cap so the top-k window cannot mask it: each id's
    # candidate pool is the capped representative set, so per-id neighbor
    # counts stay ≤ cap even with k=100
    capped = sim.ann_knn_join(df, k=100, dims=[0, 1, 2, 3], bucket_cap=8)
    per_id = capped.groupBy("id").count().agg({"count": "max"}).first()[0]
    assert per_id <= 8
    pairs = sim.cosine_neardup_pairs(df, threshold=0.0, dims=[0, 1, 2, 3],
                                     bucket_cap=8)
    assert pairs.count() <= n * 8
    # NO row is invisible to near-dup detection under the cap: every id
    # participates in at least one pair (ids above the cap set pair as id_b
    # with the capped low-id representatives)
    seen = {r["id_a"] for r in pairs.select("id_a").distinct().collect()} | \
           {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    assert seen == set(range(n))


def test_gaussian_lsh_recall_on_clustered_vectors(spark):
    """recall@(cluster-mates) ≥ 0.9 for the Gaussian-plane production path
    (round-2 VERDICT 'What's missing #5'): clusters of near-duplicate
    vectors (base + small noise) must land in the same bucket in at least
    one of the independent hash tables."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    n_clusters, per = 30, 4
    for c in range(n_clusters):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        for j in range(per):
            v = base + 0.05 * rng.standard_normal(16)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planes_tables = None  # adaptive: auto bits + Gaussian planes
    knn = sim.ann_knn_join(df, k=per - 1, n_tables=6, seed=11,
                           target_bucket_size=16).collect()
    hits = sum(1 for r in knn if r["id"] // per == r["neighbor"] // per)
    want = n_clusters * per * (per - 1)
    recall = hits / want
    assert recall >= 0.9, f"recall {recall:.3f} ({hits}/{want})"


def test_gaussian_planes_seeded_deterministic():
    a = sim.gaussian_planes(8, 4, seed=3)
    b = sim.gaussian_planes(8, 4, seed=3)
    c = sim.gaussian_planes(8, 4, seed=4)
    assert a == b and a != c


def test_multi_table_dedups_candidate_pairs(spark):
    """n_tables > 1 must not emit duplicate (id, neighbor) rows."""
    import numpy as np
    rng = np.random.RandomState(1)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.cosine_neardup_pairs(df, threshold=-1.0, n_tables=2, seed=5,
                                   target_bucket_size=8)
    n = out.count()
    nd = out.dropDuplicates(["id_a", "id_b"]).count()
    assert n == nd


def test_adaptive_lsh_hints_avoid_inline_actions(spark, emb):
    """n_rows/dim hints keep the adaptive plane sizing LAZY: plan
    construction must run NO driver action (round-3 VERDICT #7); without
    hints the count()/first() pair still runs (documented eager path)."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    def boom(self, *a, **k):
        raise AssertionError("inline driver action during plan construction")

    real_count, real_first = CDF.count, CDF.first
    CDF.count, CDF.first = boom, boom
    try:
        knn = sim.ann_knn_join(emb, k=2, n_rows=2000, dim=8,
                               target_bucket_size=256)
        pairs = sim.cosine_neardup_pairs(emb, threshold=0.9, n_rows=2000,
                                         dim=8, target_bucket_size=256)
    finally:
        CDF.count, CDF.first = real_count, real_first
    # the hinted plans still execute correctly afterwards
    assert knn.count() > 0
    assert pairs.count() >= 0


def test_ivf_ignores_null_and_ragged_vectors(spark):
    """A corrupt (NULL or wrong-dim) embedding must be absent from the
    index, not a task killer (round-4 review: np.stack raised on one bad
    row x 4 retries = dead job)."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    assigned = {r["id"]: r["cluster"]
                for r in sim.ivf_assign(df, cents).collect()}
    assert assigned == {1: 0, 3: 1}  # null + ragged rows absent, job alive
    top = sim.ann_ivf_topk(df, [1.0, 0.0], k=5, n_probe=2,
                           centroids=cents).collect()
    assert [r["vec_id"] for r in top] == [1, 3]

    # training skips nulls instead of crashing
    c2 = sim.ivf_train_centroids(df, n_centroids=2)
    assert len(c2) == 2


def test_ivf_train_raises_on_all_null(spark):
    df = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        sim.ivf_train_centroids(df)


def test_zero_norm_vector_scores_null_not_crash(spark):
    """An all-zero embedding must yield NULL cosine, not an ANSI
    DIVIDE_BY_ZERO job failure (round-4 verify drive)."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    rows = sim.cosine_topk(df, [1.0, 0.0], k=3).collect()
    assert rows[0]["vec_id"] == 1 and rows[0]["score"] == 1.0
    assert all(r["score"] is not None for r in rows[:2])
    pairs = sim.cosine_neardup_pairs(df, threshold=0.5, dims=[0, 1])
    assert pairs.count() >= 0  # zero-norm rows filtered by NULL >= t


def test_embedding_suite_flags_corrupt_vectors(spark):
    from schemasaurus_spark.operators.similarity import embedding_suite
    from schemasaurus_spark.validate import validate

    rows = [
        ("ok", [0.6, 0.8]),
        ("short", [1.0]),
        ("nan", [float("nan"), 1.0]),
        ("inf", [float("inf"), 0.0]),
        ("zero", [0.0, 0.0]),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    res = validate(df, embedding_suite(dim=2))
    got = {(r["vec_id"], r["constraint_id"])
           for r in res.violations().collect()}
    assert ("ok", "custom.emb_dim") not in got
    assert not any(v == "ok" for v, _ in got)
    assert ("short", "custom.emb_dim") in got
    assert ("nan", "custom.emb_finite") in got
    assert ("inf", "custom.emb_finite") in got
    assert ("zero", "custom.emb_norm") in got
    # null vector: only `required` (null-guard convention)
    assert {c for v, c in got if v == "null"} == {"required"}
    # plan: single projection, no Python nodes
    plan = (res.validated._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_embedding_suite_on_real_embeddings_table(spark):
    from schemasaurus_spark.operators.similarity import embedding_suite
    from schemasaurus_spark.validate import validate

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(df.select("embedding").first()["embedding"])
    res = validate(df, embedding_suite(dim=dim, max_norm=1e6))
    assert res.violations().count() == 0      # generator emits clean vecs
