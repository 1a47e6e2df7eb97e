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
    return _dot(a, b) / (_norm(a) * _norm(b))


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


def sign_lsh_buckets(df: DataFrame, dims: list[int] | None = None,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Bucket vectors by the sign pattern of selected dimensions (8 by
    default) — a deterministic sign-LSH. Returns bucket occupancy."""
    dims = dims or list(range(8))
    bits = [
        F.when(F.element_at(F.col(vec_col), d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    bucket = F.concat(*bits)
    return (
        df.select(bucket.alias("bucket"), F.col(id_col))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.min(id_col).alias("min_id"))
    )


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         dims: list[int] | None = None,
                         vec_col: str = "embedding", id_col: str = "vec_id",
                         round_to: int = 5) -> DataFrame:
    """Embedding near-duplicate pairs: sign-LSH bucket join (candidates),
    then exact cosine ≥ threshold. All-pairs work is confined to buckets."""
    dims = dims or list(range(8))
    bits = [
        F.when(F.element_at(F.col(vec_col), d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    slim = df.select(
        F.concat(*bits).alias("bucket"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
    )
    a, b = slim.alias("a"), slim.alias("b")
    pairs = a.join(b, on="bucket").where(F.col("a.id") < F.col("b.id"))
    score = F.round(cosine(F.col("a.v"), F.col("b.v")), round_to)
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias("score"),
        )
        .where(F.col("score") >= threshold)
    )
