"""Deterministic synthetic `sequences` table + violation injection.

Generates the exact `input_hint` shape
``(doc_id string, tokens array<int>, n_tok int, source string)`` per
FIXTURES.md T1, entirely with distributed expressions over ``spark.range``
— no driver-side row lists, so the same generator scales from 200 rows
(unit tests) to bench sizes. Determinism comes from ``xxhash64`` keyed on
the row index (seed folded in), never from RNG state.

The corruption transforms translate the reference's failing test cases
(``/root/reference/test/validator_spec.js:53-321``) into seeded row-level
edits with known expected violations (FIXTURES.md table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEED = 42
VOCAB = 50257
SOURCES = ["web", "books", "code", "wiki", "forums"]
MAX_TOK = 2048


def _u(col, salt: int, mod: int):
    """Deterministic uniform int in [0, mod) from (row index, salt)."""
    return F.pmod(F.xxhash64(col, F.lit(salt), F.lit(SEED)), F.lit(mod))


def gen_sequences(
    spark: SparkSession,
    n_rows: int = 200,
    n_partitions: int = 4,
    max_tok: int = MAX_TOK,
    start: int = 0,
) -> DataFrame:
    """Clean table. Long-tail `source` skew (web ≈ 70%) exercises salting.
    `start` offsets the row index so successive snapshots get disjoint
    doc_ids (appends that re-use ids correctly trip the uniqueness check)."""
    df = spark.range(start, start + n_rows, 1, n_partitions).withColumnRenamed("id", "i")
    u_src = _u(F.col("i"), 13, 100)
    source = (
        F.when(u_src < 70, "web")
        .when(u_src < 80, "books")
        .when(u_src < 90, "code")
        .when(u_src < 96, "wiki")
        .otherwise("forums")
    )
    # log-normal-ish discrete length over [1, max_tok]
    u_len = _u(F.col("i"), 7, 10_000) / 10_000.0
    n_tok = F.least(
        F.lit(max_tok),
        F.greatest(F.lit(1), F.exp(F.lit(2.0) + u_len * F.lit(5.5)).cast("int")),
    )
    df = df.select(
        F.concat(source, F.lit("-"), F.lpad(F.col("i").cast("string"), 8, "0")).alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda j: F.pmod(F.xxhash64(F.col("i"), j, F.lit(SEED)), F.lit(VOCAB)).cast("int"),
        ).alias("tokens"),
        n_tok.cast("int").alias("n_tok"),
        source.alias("source"),
        F.col("i"),
    )
    return df


def finalize(df: DataFrame) -> DataFrame:
    return df.drop("i")


# ---------------------------------------------------------------- corruption
# Each transform marks rows by deterministic predicate on the row index and
# applies exactly one edit; tests know the expected violation set from the
# same predicate. `every` controls the corruption rate (1 row in `every`).


def _mark(every: int, salt: int):
    return _u(F.col("i"), salt, every) == 0


def corrupt_null_docid(df: DataFrame, every: int = 20) -> DataFrame:
    """V-null-docid → `required` (v4validator.js:80)."""
    m = _mark(every, 101)
    return df.withColumn("doc_id", F.when(m, F.lit(None)).otherwise(F.col("doc_id")))


def corrupt_pattern(df: DataFrame, every: int = 20) -> DataFrame:
    """V-pattern → `pattern` (v4validator.js:204-206)."""
    m = _mark(every, 102)
    return df.withColumn("doc_id", F.when(m, F.lit("BAD ID!")).otherwise(F.col("doc_id")))


def corrupt_range(df: DataFrame, every: int = 20) -> DataFrame:
    """V-range-lo / V-range-hi → `minimum` / `maximum` (v4validator.js:294-302)."""

    # round-4 review note: rows marked by BOTH the lo (salt 103) and hi
    # (salt 104) predicates (~1/every^2 of rows) take only the lo branch
    # of the when-chain — a count derived from the hi predicate alone
    # overcounts by exactly those rows; assert membership, not equality.
    lo = _mark(every, 103)
    hi = _mark(every, 104)
    return df.withColumn(
        "n_tok",
        F.when(lo, F.lit(0)).when(hi, F.lit(4096)).otherwise(F.col("n_tok")),
    )


def corrupt_enum(df: DataFrame, every: int = 20) -> DataFrame:
    """V-enum → `enum` (v4validator.js:181-190)."""
    m = _mark(every, 105)
    return df.withColumn("source", F.when(m, F.lit("sp4m")).otherwise(F.col("source")))


def corrupt_size_mismatch(df: DataFrame, every: int = 20) -> DataFrame:
    """V-size-mismatch → `custom.size_eq_n_tok` (conform, v4validator.js:305-322)."""
    m = _mark(every, 106)
    return df.withColumn(
        "n_tok", F.when(m, F.size("tokens") + 7).otherwise(F.col("n_tok"))
    )


def corrupt_items(df: DataFrame, every: int = 20) -> DataFrame:
    """V-minitems/V-maxitems → `minItems`/`maxItems` (v4validator.js:219-231)."""
    lo = _mark(every, 107)
    hi = _mark(every, 108)
    big = F.sequence(F.lit(0), F.lit(2999)).cast("array<int>")
    return df.withColumn(
        "tokens",
        F.when(lo, F.lit([]).cast("array<int>")).when(hi, big).otherwise(F.col("tokens")),
    )


def corrupt_elem_range(df: DataFrame, every: int = 20) -> DataFrame:
    """V-elem-range → `items.minimum` / `items.maximum` (processor.js:31-47)."""
    lo = _mark(every, 109)
    hi = _mark(every, 110)
    return df.withColumn(
        "tokens",
        F.when(lo, F.concat(F.col("tokens"), F.array(F.lit(-5).cast("int"))))
        .when(hi, F.concat(F.col("tokens"), F.array(F.lit(99_999).cast("int"))))
        .otherwise(F.col("tokens")),
    ).withColumn(
        "n_tok",
        F.when(lo | hi, F.col("n_tok") + 1).otherwise(F.col("n_tok")),
    )


def corrupt_intra_dup(df: DataFrame, every: int = 20) -> DataFrame:
    """V-intra-dup → `uniqueItems` (v4validator.js:233-246): force tokens[1]
    to repeat tokens[0].

    CONTRACT CAVEAT (round-4 review): clean generated token arrays ALSO
    collide naturally at high rates (birthday bound over VOCAB=50257:
    ~9% at n_tok=100, near-certain at n_tok~1800), so the marked-row
    predicate identifies a SUBSET of uniqueItems violations, never the
    full expected set. Tests over uniqueItems-enabled suites must assert
    membership ("every marked row violates"), not equality of counts."""
    m = _mark(every, 111) & (F.size("tokens") >= 2)
    dup = F.concat(
        F.slice("tokens", 1, 1),
        F.slice("tokens", 1, 1),
        F.slice(F.col("tokens"), 3, F.greatest(F.size("tokens") - 2, F.lit(0))),
    )
    return df.withColumn("tokens", F.when(m, dup).otherwise(F.col("tokens")))


def corrupt_dup_docid(df: DataFrame, every: int = 50) -> DataFrame:
    """V-dup-docid → `unique.doc_id`: append exact copies of marked rows
    (they land in other partitions on repartition), so each duplicated
    doc_id has occurrence count 2 — one violation per extra occurrence."""
    m = _mark(every, 112)
    return df.unionAll(df.where(m))


def corrupt_ref_source(df: DataFrame, every: int = 25) -> DataFrame:
    """V-ref-source → `ref.source` (absent from the sources dimension)."""
    m = _mark(every, 113)
    return df.withColumn("source", F.when(m, F.lit("shadowlib")).otherwise(F.col("source")))


def sources_dim(spark: SparkSession) -> DataFrame:
    """FIXTURES T2 — the referential dimension (broadcast side)."""
    return spark.createDataFrame(
        [(s, True) for s in SOURCES], "source string, license_ok boolean"
    )
