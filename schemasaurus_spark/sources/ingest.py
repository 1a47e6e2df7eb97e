"""Permissive text-format ingest: JSONL / CSV → normalize → validate.

The reference validates raw JSON values, where everything arrives untyped
(``/root/reference/README.md:291-312`` pairs the normalizer with exactly
this ingest problem). The engine analog: read the file format with ALL
columns staged as strings (no inference surprises, no ANSI cast failures at
scan time), then run the normalizer (one projection of casts/defaults) and
the compiled validation plan — so malformed values become `violations`, not
job failures.

Scale notes: both readers are plain Spark sources — splittable, predicate-
pushdown-aware after normalization, and schema is fixed up-front (inference
is disabled: at 100 TB a schema-inference pre-pass is a full extra scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from schemasaurus_spark.dsl import Suite
from schemasaurus_spark.normalizer import NormalizerSpec, normalize
from schemasaurus_spark.validate import ValidationResult, validate


def _string_schema(columns: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType()) for c in columns])


def read_jsonl(spark: SparkSession, path: str, columns: list[str],
               multiline: bool = False) -> DataFrame:
    """JSON-lines with every declared column staged as string (numbers and
    booleans arrive as their literal text; nested values as JSON text).
    No schema inference — one scan total."""
    return (spark.read
            .schema(_string_schema(columns))
            .option("multiLine", multiline)
            .json(path))


def read_csv(spark: SparkSession, path: str, columns: list[str],
             header: bool = True, sep: str = ",") -> DataFrame:
    """CSV with all-string staging; no inference (inferSchema would be a
    second full scan)."""
    return (spark.read
            .schema(_string_schema(columns))
            .option("header", header)
            .option("sep", sep)
            .csv(path))


def ingest(spark: SparkSession, path: str, fmt: str, columns: list[str],
           spec: NormalizerSpec, suite: Suite) -> ValidationResult:
    """File → permissive strings → normalize (typed) → validate. The whole
    pipeline is scan + TWO narrow projections (normalize, validate) —
    zero shuffle until verdict aggregation."""
    if fmt == "jsonl":
        raw = read_jsonl(spark, path, columns)
    elif fmt == "csv":
        raw = read_csv(spark, path, columns)
    elif fmt in ("parquet", "orc"):
        # typed formats skip string staging, but the declared column list
        # still applies: project to it (column pruning reaches the scan)
        # and fail loudly on a declared column the file doesn't have —
        # silently ignoring `columns` let misspellings pass and leaked
        # undeclared columns into additionalProperties checks (round-4
        # review)
        raw = spark.read.parquet(path) if fmt == "parquet" \
            else spark.read.orc(path)
        missing = [c for c in columns if c not in raw.columns]
        if missing:
            raise ValueError(
                f"ingest: declared column(s) {missing} not present in the "
                f"{fmt} file (has: {sorted(raw.columns)})")
        raw = raw.select(*columns)
    else:
        raise ValueError(f"unknown ingest format '{fmt}'")
    return validate(normalize(raw, spec), suite)
