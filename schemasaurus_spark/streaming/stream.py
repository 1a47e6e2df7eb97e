"""Structured Streaming validation.

The compiled ValidationPlan is a pure projection, so it applies unchanged to
streaming DataFrames: ``readStream → plan.apply → violations/windowed
verdicts → writeStream``. This complements the snapshot-delta path
(incremental.py) for sources that genuinely stream (Kafka-style feeds of
new sequences).

* ``stream_violations`` — per-record violation rows, append mode (stateless:
  scales to any rate; no shuffle).
* ``windowed_verdicts`` — per-(window, source) violation counts with a
  watermark so late events are folded in until the lateness bound, then the
  window finalizes (state is bounded — required for unbounded streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from schemasaurus_spark.compiler import VIOLATIONS_COL, compile_suite
from schemasaurus_spark.dsl import Suite


def apply_plan_stream(stream_df: DataFrame, suite: Suite) -> DataFrame:
    plan = compile_suite(suite, stream_df.schema)
    return plan.apply(stream_df)


def stream_violations(stream_df: DataFrame, suite: Suite) -> DataFrame:
    """Append-mode violation rows (stateless projection + filter + explode)."""
    validated = apply_plan_stream(stream_df, suite)
    idc = suite.id_column
    return (
        validated.where(F.size(VIOLATIONS_COL) > 0)
        .select(F.col(idc), F.explode(VIOLATIONS_COL).alias("__v"))
        .select(idc, "__v.constraint_id", "__v.column", "__v.value",
                "__v.arg", "__v.message")
    )


def windowed_verdicts(stream_df: DataFrame, suite: Suite,
                      time_col: str = "ts", window: str = "10 seconds",
                      watermark: str = "30 seconds",
                      by: str | None = "source") -> DataFrame:
    """Watermarked tumbling-window verdict counts: late rows within the
    watermark still update their window; older rows are dropped and the
    window's state is released (bounded state at unbounded input)."""
    validated = apply_plan_stream(stream_df, suite).withWatermark(time_col, watermark)
    keys = [F.window(F.col(time_col), window).alias("w")]
    if by:
        keys.append(F.col(by))
    return (
        validated.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
        )
        .withColumn("pass", F.col("n_violations") == 0)
    )
