"""Sampling + data-mixture operators for training-data pipelines.

The north star's table is the INPUT side of a training mix; these are the
ops that turn a validated corpus into a mixture: per-source subsampling to
target fractions, exactly-k exemplar reservoirs, and token-budget capping
(sample each source until its token budget is spent — the mixture-weights
op every LLM data pipeline runs).

Scale shapes (100 TB rules):

* ``sample_by_fraction`` — Bernoulli via ``df.sampleBy``: ZERO shuffle,
  streams through the scan; counts are binomial around the target. The
  default at scale.
* ``stratified_sample_exact`` / ``reservoir_per_key`` /
  ``token_budget_mixture`` — exact variants need per-group ordering, i.e.
  ONE hash-partition shuffle on the group key. Ordering uses
  ``xxhash64(id, seed)``, not ``rand()``: deterministic, resumable,
  testable — rerunning the job selects the same rows.
* Skew: a giant group serializes into one window partition. The
  ``salt=`` knob on ``token_budget_mixture`` splits each group into N
  sub-partitions and divides the budget evenly across them — bounded
  rounding error (≤ N·max_weight), no single-task bottleneck.
* Determinism requires a UNIQUE ``id_col``: hash-tied duplicate ids get
  arbitrary relative order (run these AFTER the engine's uniqueness
  check, which exists precisely to catch such rows).

No driver-side data, no Python row loops — pyspark.sql expressions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sample_by_fraction", "stratified_sample_exact",
           "reservoir_per_key", "token_budget_mixture",
           "assign_splits", "shuffle_key", "shard_and_shuffle",
           "sample_rows"]


def sample_by_fraction(df: DataFrame, by: str, fractions: dict,
                       seed: int = 7) -> DataFrame:
    """Bernoulli stratified sample: keep each group's rows with its
    fraction (groups absent from ``fractions`` drop to 0.0). Zero-shuffle
    scale path; counts are approximate (binomial)."""
    return df.sampleBy(by, fractions, seed=seed)


def _hash_order(id_col: str, seed: int):
    return F.xxhash64(F.col(id_col), F.lit(seed))


def stratified_sample_exact(df: DataFrame, by: str, fractions: dict,
                            id_col: str = "doc_id",
                            seed: int = 7) -> DataFrame:
    """EXACT per-group fractions: ceil(frac · |group|) rows per group,
    chosen by deterministic hash order. Two passes over the group
    dimension (a count agg + one window shuffle); rows of groups absent
    from ``fractions`` are dropped."""
    frac_map = F.create_map(
        *[x for kv in fractions.items()
          for x in (F.lit(kv[0]), F.lit(float(kv[1])))])
    # drop unlisted groups BEFORE the window so they never pay the
    # shuffle/sort (review finding: 70% of a web-heavy corpus shuffled
    # only to be discarded)
    df = df.where(frac_map[F.col(by)].isNotNull())
    counts = df.groupBy(by).count()
    want = counts.select(
        F.col(by),
        # round-before-ceil: 100 * 0.07 = 7.000000000000001 in doubles,
        # and a bare ceil would overshoot the documented exact count
        F.ceil(F.round(F.col("count") * frac_map[F.col(by)], 9))
         .alias("__want"))
    w = Window.partitionBy(by).orderBy(_hash_order(id_col, seed), id_col)
    return (df.withColumn("__rn", F.row_number().over(w))
              .join(F.broadcast(want), by)
              .where(F.col("__rn") <= F.col("__want"))
              .drop("__rn", "__want"))


def reservoir_per_key(df: DataFrame, key: str, k: int,
                      id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """Exactly min(k, |group|) exemplar rows per key, deterministic
    (hash-ordered). The distributed analog of a per-key reservoir: one
    shuffle on ``key``, map-side nothing to carry, no driver state."""
    w = Window.partitionBy(key).orderBy(_hash_order(id_col, seed), id_col)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= k)
              .drop("__rn"))


def token_budget_mixture(df: DataFrame, by: str, budgets: dict,
                         weight_col: str = "n_tok",
                         id_col: str = "doc_id", seed: int = 7,
                         salt: int | None = None) -> DataFrame:
    """Cap each group at a WEIGHT budget (e.g. token budget per source):
    rows are taken in deterministic hash order while the running sum of
    ``weight_col`` stays ≤ the group's budget — the mixture-weights
    operator (sample web until 2B tokens, books until 1B, …). Groups
    absent from ``budgets`` are dropped.

    ``salt=N`` is the skew path: each group splits into N hash
    sub-partitions, each capped at budget/N. Selection stays
    deterministic; the realized budget is within N·max(weight) of the
    target, and no group serializes into a single window task.
    ``salt <= 1`` falls back to the unsalted path (salt=0 would
    otherwise NULL every partition id and divide the budget by zero).

    Rows with NULL, negative, NaN, or +Infinity ``weight_col`` are
    EXCLUDED before capping: a NULL weight rides the previous running sum
    (free rows past any budget), a negative one makes the cumulative sum
    non-monotone (non-prefix selection), and NaN/Inf poison the running
    sum for every hash-later row (Spark orders NaN above all numbers, so
    ``>= 0`` alone admits it) — dirty weights go to the validator, not
    the mixture."""
    from pyspark.sql import types as T

    bmap = F.create_map(
        *[x for kv in budgets.items()
          for x in (F.lit(kv[0]), F.lit(float(kv[1])))])
    wcol = F.col(weight_col)
    clean = wcol.isNotNull() & (wcol >= 0)
    if isinstance(df.schema[weight_col].dataType,
                  (T.FloatType, T.DoubleType)):
        clean = clean & ~F.isnan(wcol) & (wcol < F.lit(float("inf")))
    df = df.where(bmap[F.col(by)].isNotNull() & clean)
    if salt is not None and salt <= 1:
        salt = None
    if salt is None:
        w = Window.partitionBy(by).orderBy(_hash_order(id_col, seed), id_col)
        budget = bmap[F.col(by)]
    else:
        part = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed + 1)),
                      F.lit(salt))
        df = df.withColumn("__salt", part)
        w = Window.partitionBy(by, "__salt").orderBy(
            _hash_order(id_col, seed), id_col)
        budget = bmap[F.col(by)] / F.lit(float(salt))
    cum = F.sum(weight_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (df.withColumn("__cum", cum)
             .where(F.col("__cum") <= budget)
             .drop("__cum"))
    return out.drop("__salt") if salt is not None else out


# ------------------------------------------- splits + deterministic shuffle
#
# Train/valid/test assignment and global shuffle order for a training
# pipeline. Both are pure projections of the row's ID — ZERO shuffle, zero
# state, and (critically) STABLE: rerunning the job, adding rows, or
# changing cluster size never moves an existing doc between splits, which
# is what prevents test-set leakage across dataset versions.


def _portable_unit(id_col: str, seed: int):
    """Deterministic uniform [0,1) from an id: first 15 hex digits of
    md5(seed|id) → 60-bit int / 2^60. md5 (not xxhash64) so the SAME
    assignment is reproducible in any engine — DuckDB/Python verify a
    split file byte-for-byte (the dedup module's portable-hash rule)."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / F.lit(
        float(2 ** 60))


def assign_splits(df: DataFrame, weights: dict | None = None,
                  id_col: str = "doc_id", seed: int = 7,
                  split_col: str = "split") -> DataFrame:
    """Add a ``split_col`` assigning each row to one of ``weights``'
    buckets (default ``{"train": .98, "valid": .01, "test": .01}``) by
    hashing ``id_col`` into [0,1) and cutting at the cumulative weights
    (normalized, declaration order). Properties a 100 TB pipeline needs:

    * **projection-only** — no shuffle, no sampling pass, streams with
      the scan;
    * **stable** — a doc's split depends only on (seed, id): appending
      new data or re-running never migrates existing docs across splits;
    * **portable** — md5-derived, so an external auditor can recompute
      membership without Spark.

    Weights must be positive; they are normalized to sum 1. The final
    bucket absorbs the hash's top edge (u == cumulative top) so the
    assignment is total."""
    if weights is None:
        weights = {"train": 0.98, "valid": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must name at least one split")
    bad = {k: w for k, w in weights.items()
           if not (isinstance(w, (int, float)) and w > 0 and w == w
                   and w != float("inf"))}
    if bad:
        raise ValueError(f"split weights must be positive finite: {bad}")
    total = float(sum(weights.values()))
    u = _portable_unit(id_col, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def shuffle_key(df: DataFrame, id_col: str = "doc_id", seed: int = 7,
                key_col: str = "shuffle_key",
                portable: bool = False) -> DataFrame:
    """Deterministic pseudo-random sort key per row: the global-shuffle
    primitive (training wants documents in hash order, not ingest order —
    source-clustered batches bias gradients). ``portable=False`` uses
    ``xxhash64`` (JVM-cheap, the default at scale); ``portable=True``
    uses the md5 derivation when membership must be recomputable outside
    Spark. Ordering by the key IS the shuffle — no rand(), so resumable
    and identical across reruns/cluster sizes."""
    if portable:
        key = (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"),
                           F.col(id_col).cast("string"))), 1, 15), 16, 10)
            .cast("bigint"))
    else:
        key = F.xxhash64(F.col(id_col), F.lit(seed))
    return df.withColumn(key_col, key)


def shard_and_shuffle(df: DataFrame, n_shards: int,
                      id_col: str = "doc_id", seed: int = 7,
                      shard_col: str = "shard",
                      key_col: str = "shuffle_key") -> DataFrame:
    """Deterministic global shuffle materialization: assign each row a
    shard (``pmod(key, n_shards)``) and order rows by the hash key within
    each shard — reading shards in index order then rows in key order is
    one fixed pseudo-random permutation of the corpus, independent of
    cluster size or run count.

    ONE hash-partition shuffle (the repartition); the within-partition
    sort is local. Write with ``.write.partitionBy(shard_col)`` for a
    layout where every training worker streams its own shard. Contrast
    ``df.orderBy(rand())``: non-resumable, and a total sort is a range
    shuffle PLUS a sampling pass."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    keyed = shuffle_key(df, id_col, seed, key_col)
    keyed = keyed.withColumn(
        shard_col, F.pmod(F.col(key_col), F.lit(n_shards)).cast("int"))
    return (keyed.repartition(n_shards, F.col(shard_col))
                 .sortWithinPartitions(shard_col, key_col, id_col))


def sample_rows(df: DataFrame, fraction: float, id_col: str = "doc_id",
                seed: int = 7) -> DataFrame:
    """Deterministic id-hash row sample: keep rows whose portable unit
    hash < ``fraction``. Unlike ``df.sample`` the membership is a pure
    function of (seed, id) — stable across reruns, cluster sizes, and
    growing inputs (a doc stays in the smoke sample forever), and
    recomputable outside Spark (md5 derivation). The filter streams with
    the scan: zero shuffle.

    Rows with a NULL id are ALWAYS in the sample: their hash is NULL and
    a NULL predicate would silently drop them — i.e. the smoke pre-flight
    would report PASS on a table whose id column is broken, the exact
    NotNull failure it exists to catch. A broken id column should
    dominate the sample verdict, not hide from it."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    return df.where(F.coalesce(_portable_unit(id_col, seed), F.lit(0.0))
                    < F.lit(float(fraction)))
