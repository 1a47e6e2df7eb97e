"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``schemasaurus_spark`` (see SURVEY.md): a from-scratch
PySpark-native schema + constraint validation engine re-expressing the
reference's compile-the-schema-once design
(``/root/reference/src/compiler.js:194-211``) as DSL → Catalyst expression
plans, plus the aggregate checks (stats/uniqueness/referential/drift) and
training-data operators (dedup/similarity/text) the north star mandates.

``queries()`` / ``oracle_sql()`` are re-exported from
``schemasaurus_spark.queries`` — each query is engine-backed and has an
ANSI-SQL DuckDB oracle with identical column names and value semantics
(parity mirrored locally by tests/test_oracle_parity.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from schemasaurus_spark.queries import QUERIES, build_oracles  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation suite over sf0.001 documents → violation
    rows (doc_id, constraint_id, column, value)."""
    return QUERIES["validate_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(build_oracles())
