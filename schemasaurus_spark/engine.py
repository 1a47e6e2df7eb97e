"""Full-engine facade: one call = the complete north-star validation job.

``run_full_validation`` stitches together everything the north rule asks of
one run over a sequences table:

* row-level constraint suite (compiled, single-pass)        → violations
* per-partition pass/fail verdicts                          → verdicts
* doc_id uniqueness (exact salted two-phase, unconditional) → violations
* referential check against the sources dimension           → violations
* per-source null-rate thresholds                           → violations
* PSI/KS drift vs a checkpointed baseline histogram         → violations
* one-pass column stats + quantile sketch                   → metrics

All violation families share one schema
(doc_id, constraint_id, column, value, arg, message) and stack with
``unionByName`` — the columnar form of the reference's single error list
(``/root/reference/src/v4validator.js:40-52``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from schemasaurus_spark.compiler import VIOLATIONS_COL
from schemasaurus_spark.dsl import Suite
from schemasaurus_spark.operators import aggregates as agg
from schemasaurus_spark.validate import ValidationResult, validate

VIOLATION_COLS = ["doc_id", "constraint_id", "column", "value", "arg", "message"]


@dataclass
class AggregateChecks:
    """Configuration for the aggregate/statistical half of the suite."""

    unique_key: Optional[str] = "doc_id"
    sources_dim: Optional[DataFrame] = None
    ref_column: str = "source"
    null_rate_max: Optional[dict[str, float]] = None  # column -> max rate
    null_rate_by: Optional[str] = "source"
    drift_baseline: Optional[DataFrame] = None  # histogram (group_key,bucket,count)
    drift_column: str = "n_tok"
    drift_edges: Sequence[float] = ()
    # grouping for the drift comparison. MUST match how drift_baseline was
    # grouped — comparing a global histogram against per-source baseline
    # keys makes every group look drifted. The "unset" sentinel falls back
    # to null_rate_by for compatibility with callers that group both the
    # same way.
    drift_by: object = "__same_as_null_rate_by__"
    psi_threshold: float = 0.2
    ks_threshold: float = 0.15


@dataclass
class FullValidationResult:
    row: ValidationResult
    agg_violations: DataFrame  # stacked aggregate-check violations
    drift: list = field(default_factory=list)
    _n_agg: Optional[int] = field(default=None, init=False, repr=False)

    def _agg_count(self) -> int:
        """Count aggregate violations once per result object — verdicts()
        and is_valid() are often both called on the same run, and the
        aggregate stack re-executes its whole plan per action otherwise."""
        if self._n_agg is None:
            self._n_agg = self.agg_violations.count()
        return self._n_agg

    def violations(self) -> DataFrame:
        """Row-level + aggregate violations, one schema."""
        row_v = self.row.violations().select(
            F.col(self.row.id_column).cast("string").alias("doc_id"),
            "constraint_id", "column", "value", "arg", "message",
        )
        return row_v.unionByName(self.agg_violations.select(*VIOLATION_COLS))

    def verdicts(self) -> DataFrame:
        """Per-partition verdicts; aggregate-check failures are appended as
        pseudo-partition rows (partition_id = -1 per family) so a partition
        table consumer sees the whole-table checks too."""
        base = self.row.verdicts()
        spark = base.sparkSession
        n_agg = self._agg_count()
        extra = spark.createDataFrame(
            [(-1, 0, n_agg, n_agg == 0)],
            "partition_id int, n_rows long, n_violations long, pass boolean",
        )
        return base.unionByName(extra)

    def is_valid(self) -> bool:
        if not self.row.is_valid():
            return False
        # populate the shared count cache: the natural gate-then-report
        # order (is_valid() then verdicts()) must execute the aggregate
        # plan once, not twice. The frame is per-check-sized (never data-
        # sized), so count() over take(1) costs nothing material.
        return self._agg_count() == 0


def _empty_violations_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [], "doc_id string, constraint_id string, column string, "
            "value string, arg string, message string")


def run_full_validation(df: DataFrame, suite: Suite,
                        checks: AggregateChecks | None = None
                        ) -> FullValidationResult:
    checks = checks or AggregateChecks()
    spark = df.sparkSession
    row_res = validate(df, suite)

    parts: list[DataFrame] = []
    if checks.unique_key:
        if checks.unique_key not in df.columns:
            # silent skip = false clean verdict on a duplicate-ridden table;
            # a misconfigured check must be LOUD, not absent
            raise ValueError(
                f"AggregateChecks.unique_key '{checks.unique_key}' is not a "
                f"column of the table ({sorted(df.columns)}); set "
                f"unique_key=None to opt out of the uniqueness check")
        parts.append(agg.uniqueness_check(df, checks.unique_key).violations)
    if checks.sources_dim is not None:
        if checks.ref_column not in df.columns:
            raise ValueError(
                f"AggregateChecks.ref_column '{checks.ref_column}' is not a "
                f"column of the table; referential check cannot run")
        parts.append(agg.referential_check(
            df, checks.sources_dim, checks.ref_column,
            id_column=suite.id_column))
    for colname, max_rate in (checks.null_rate_max or {}).items():
        parts.append(agg.null_rate_check(df, colname, max_rate,
                                         by=checks.null_rate_by))
    drift_results = []
    if checks.drift_baseline is not None and not checks.drift_edges:
        raise ValueError(
            "AggregateChecks.drift_baseline is set but drift_edges is "
            "empty — the frozen bucket edges are required to compare "
            "against the checkpointed baseline")
    if checks.drift_baseline is not None:
        drift_by = (checks.null_rate_by
                    if checks.drift_by == "__same_as_null_rate_by__"
                    else checks.drift_by)
        drift_results = agg.drift_check(
            df, checks.drift_baseline, checks.drift_column,
            list(checks.drift_edges), by=drift_by,
            psi_threshold=checks.psi_threshold,
            ks_threshold=checks.ks_threshold)
        parts.append(agg.drift_violations(
            spark, drift_results, checks.psi_threshold, checks.ks_threshold))

    stacked = _empty_violations_df(spark)
    for p in parts:
        stacked = stacked.unionByName(p.select(*VIOLATION_COLS))
    return FullValidationResult(row_res, stacked, drift_results)
