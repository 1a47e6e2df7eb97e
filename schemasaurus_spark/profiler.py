"""Constraint suggestion: profile a table and emit a draft ``dsl.Suite``.

The reference validates a schema a human wrote; at 100 TB the suite for a
new table usually starts from the DATA (the Deequ/AWS "constraint
suggestion" workflow): profile once, propose constraints, let a human
prune, then enforce with :func:`schemasaurus_spark.validate`.

Scale shape — exactly TWO jobs regardless of column count:

* **Pass 1** is ONE fused ``groupBy().agg()`` over every profiled column
  (null counts, typed min/max, approx distinct, string length bounds,
  array size/element bounds) — a single scan producing a single wide row;
  the driver reads one row, never data.
* **Pass 2** runs ONLY when pass 1 found low-cardinality string columns
  (``approx_count_distinct`` ≤ threshold with HLL head-room): one scan
  stacks the candidate columns into ``(column, value)`` pairs, takes
  ``distinct()``, and collects ≤ candidates × (threshold + slack) rows —
  driver-bounded by construction. approx_count_distinct over-estimates
  ~half the time and UNDER-estimates the other half (CLAUDE.md round-2:
  never trust HLL for correctness), so pass 2 re-checks the EXACT
  cardinality and drops the Enum when it exceeds the threshold.

Suggested bounds are OBSERVED bounds — a draft for human review, not a
guarantee about future data (same contract as Deequ's suggestions).
Uniqueness is reported as *candidates* (``approx_distinct`` within HLL
error of ``n_rows``) rather than a row constraint: key uniqueness is the
engine's aggregate check (``aggregates.uniqueness_check``), not a
per-row predicate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F, types as T

from schemasaurus_spark import dsl

__all__ = ["suggest_suite", "SuggestResult"]

# HLL relative error head-room: approx ≤ threshold*(1+slack) columns go to
# the exact pass 2 check; approx within slack of n_rows → unique candidate
_HLL_SLACK = 0.15


@dataclass
class SuggestResult:
    suite: dsl.Suite
    n_rows: int
    evidence: dict = field(default_factory=dict)  # column -> stats dict
    unique_candidates: list = field(default_factory=list)
    # ready-to-enforce AggregateChecks(stat_bounds=...) draft: per numeric
    # column, mean bounds at observed mean ± slack·(max-min) plus hard
    # observed min/max value bounds — passes the profiled table by
    # construction, fires on a distribution shift
    stat_bounds: dict = field(default_factory=dict)

    def describe(self) -> str:
        lines = [f"# suggested suite over {self.n_rows} rows"]
        for col, cs in sorted(self.suite.columns.items()):
            lines.append(f"{col}: " + ", ".join(type(c).__name__ for c in cs))
        if self.unique_candidates:
            lines.append("unique-key candidates: "
                         + ", ".join(self.unique_candidates))
        return "\n".join(lines)


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def suggest_suite(df: DataFrame, id_column: str | None = None,
                  columns: list[str] | None = None,
                  enum_max_distinct: int = 32,
                  stat_mean_slack: float = 0.05) -> SuggestResult:
    """Profile ``df`` (2 scans max) and return a draft Suite + evidence.

    Per column, by dtype: 0 observed nulls → ``NotNull``; numeric →
    ``Minimum``/``Maximum``; string → ``MinLength``/``MaxLength`` and, for
    exact cardinality ≤ ``enum_max_distinct``, ``Enum(sorted values)``;
    array → ``MinItems``/``MaxItems`` and, for numeric elements,
    ``Items([Minimum, Maximum])``. Empty or all-null columns get no
    constraints (no vacuous claims). Map/struct columns are skipped.

    Numeric columns additionally yield ``result.stat_bounds`` — a draft
    ``AggregateChecks(stat_bounds=...)`` spec (mean at observed ±
    ``stat_mean_slack``·span, hard observed min/max) that the fused
    aggregate pass enforces: the suggest → enforce loop for aggregate
    assertions, same contract as the row-level draft (passes the profiled
    table; a human prunes before production). The profile is GLOBAL, so
    enforce with ``AggregateChecks(stat_bounds=..., null_rate_by=None)``
    — per-group means legitimately sit away from the global mean.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [n for n, dt in fields.items()
                   if not isinstance(dt, (T.MapType, T.StructType))]

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__ad"),
        ]
        if _is_numeric(dt):
            aggs += [F.min(col).alias(f"{c}__min"),
                     F.max(col).alias(f"{c}__max"),
                     F.avg(col).alias(f"{c}__mean"),
                     F.stddev(col).alias(f"{c}__std")]
        elif isinstance(dt, T.StringType):
            aggs += [F.min(F.length(col)).alias(f"{c}__minlen"),
                     F.max(F.length(col)).alias(f"{c}__maxlen")]
        elif isinstance(dt, T.ArrayType):
            aggs += [F.min(F.size(col)).alias(f"{c}__minsz"),
                     F.max(F.size(col)).alias(f"{c}__maxsz")]
            if _is_numeric(dt.elementType):
                # array_min/array_max are NULL on empty arrays; the outer
                # min/max skip nulls, so empty arrays don't poison bounds
                aggs += [F.min(F.array_min(col)).alias(f"{c}__emin"),
                         F.max(F.array_max(col)).alias(f"{c}__emax")]
    row = df.agg(*aggs).first()  # pass 1: ONE scan, one wide row
    n_rows = row["__n"]

    # pass 2 (conditional): exact distincts for low-cardinality strings
    cand = [c for c in columns
            if isinstance(fields[c], T.StringType) and c != id_column
            and n_rows > 0
            and row[f"{c}__ad"] <= enum_max_distinct * (1 + _HLL_SLACK)]
    enum_values: dict[str, list] = {}
    if cand:
        pairs = (df.select(F.explode(F.array(*[
                    F.struct(F.lit(c).alias("c"), F.col(c).alias("v"))
                    for c in cand])).alias("p"))
                   .select("p.c", "p.v")
                   .where(F.col("v").isNotNull())
                   .distinct()
                   .collect())  # ≤ |cand| × ~threshold rows by HLL screen
        by_col: dict[str, list] = {}
        for r in pairs:
            by_col.setdefault(r["c"], []).append(r["v"])
        for c, vals in by_col.items():
            if len(vals) <= enum_max_distinct:  # exact check, not HLL
                enum_values[c] = sorted(vals)

    suite_cols: dict[str, list] = {}
    evidence: dict[str, dict] = {}
    unique_candidates: list[str] = []
    for c in columns:
        dt = fields[c]
        nulls = row[f"{c}__nulls"] or 0  # sum() is NULL over zero rows
        ad = row[f"{c}__ad"] or 0
        ev = {"n_nulls": nulls, "approx_distinct": ad}
        cs: list = []
        non_null = n_rows - nulls
        if non_null > 0:
            if nulls == 0:
                cs.append(dsl.NotNull())
            if _is_numeric(dt):
                ev["min"], ev["max"] = row[f"{c}__min"], row[f"{c}__max"]
                ev["mean"] = row[f"{c}__mean"]
                ev["stddev"] = row[f"{c}__std"]  # NULL when non_null == 1
                cs += [dsl.Minimum(ev["min"]), dsl.Maximum(ev["max"])]
            elif isinstance(dt, T.StringType):
                ev["min_len"] = row[f"{c}__minlen"]
                ev["max_len"] = row[f"{c}__maxlen"]
                cs += [dsl.MinLength(ev["min_len"]),
                       dsl.MaxLength(ev["max_len"])]
                if c in enum_values:
                    ev["values"] = enum_values[c]
                    cs.append(dsl.Enum(enum_values[c]))
            elif isinstance(dt, T.ArrayType):
                ev["min_size"] = row[f"{c}__minsz"]
                ev["max_size"] = row[f"{c}__maxsz"]
                cs += [dsl.MinItems(ev["min_size"]),
                       dsl.MaxItems(ev["max_size"])]
                if _is_numeric(dt.elementType) \
                        and row[f"{c}__emin"] is not None:
                    ev["elem_min"] = row[f"{c}__emin"]
                    ev["elem_max"] = row[f"{c}__emax"]
                    cs.append(dsl.Items([dsl.Minimum(ev["elem_min"]),
                                         dsl.Maximum(ev["elem_max"])]))
            if isinstance(dt, (T.StringType, T.IntegralType)) \
                    and nulls == 0 and n_rows > 0 \
                    and ad >= n_rows * (1 - _HLL_SLACK):
                unique_candidates.append(c)
        evidence[c] = ev
        if cs:
            suite_cols[c] = cs

    if id_column is None:
        id_column = ("doc_id" if "doc_id" in fields
                     else (unique_candidates[0] if unique_candidates
                           else columns[0]))
    suite = dsl.Suite(id_column=id_column, columns=suite_cols,
                      name="suggested_v1")
    import math

    stat_bounds: dict[str, dict] = {}
    for c, ev in evidence.items():
        if ev.get("mean") is None or ev.get("min") is None:
            continue
        mn, mx, mean = float(ev["min"]), float(ev["max"]), float(ev["mean"])
        if any(math.isnan(v) for v in (mn, mx, mean)):
            # NaN-bearing column: NaN bounds never fire (driver-side
            # comparisons are all False) — suggest nothing rather than a
            # vacuous check; NaN policing belongs to the embedding/row
            # suites (is_nan Conform), not mean bounds
            continue
        # slack·(value span) around the observed mean; a constant column
        # (span 0) falls back to |mean| so the bound is never degenerate
        m = stat_mean_slack * ((mx - mn) or abs(mean) or 1.0)
        stat_bounds[c] = {"min_mean": mean - m, "max_mean": mean + m,
                          "min_value": mn, "max_value": mx}
    return SuggestResult(suite=suite, n_rows=n_rows, evidence=evidence,
                         unique_candidates=unique_candidates,
                         stat_bounds=stat_bounds)
