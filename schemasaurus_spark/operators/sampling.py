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
           "reservoir_per_key", "token_budget_mixture"]


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
