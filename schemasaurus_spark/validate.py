"""Run a compiled ValidationPlan — the engine's ``begin``/``end`` lifecycle.

The reference returns ``{valid, errors}`` per value
(``/root/reference/src/v4validator.js:326-331``); the engine's unit of
verdict is the **partition** (per north_rule): ``verdicts()`` is one row per
input partition with ``pass ⇔ zero violations`` — the direct generalization
of ``valid = errors.length === 0``.

Execution shape (scale notes):

* ``apply`` is a narrow projection — zero shuffle, whole-stage codegen.
* ``verdicts()`` groups on ``spark_partition_id()`` — partial aggregation
  means each task emits ONE partial row; the shuffle moves O(#partitions)
  rows, not data.
* ``violations()`` explodes the violation arrays — rows flow only for
  failing checks, so a clean 10^12-row table emits nothing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F, types as T

from schemasaurus_spark.compiler import (
    VIOLATIONS_COL,
    ValidationPlan,
    compile_suite,
)
from schemasaurus_spark.dsl import Suite


@dataclass
class ValidationResult:
    plan: ValidationPlan
    validated: DataFrame  # input + __violations array column

    @property
    def id_column(self) -> str:
        return self.plan.suite.id_column

    def violations(self) -> DataFrame:
        """(doc_id, constraint_id, column, value, arg, message) — one row per
        violation, the analog of the reference error list; emission order
        within a row is preserved by posexplode position.

        Plan shape: scan → project → posexplode, all whole-stage-codegen'd,
        with NO size-filter — exploding an empty array emits nothing, and a
        ``where(size(violations) > 0)`` would inline the whole constraint
        tree into the FileScan as an interpreted DataFilter (the
        filter-pushdown pathology, BENCH.md round 2: 77 s vs 7 s at 16M
        rows / 32 cores)."""
        idc = self.id_column
        v = self.plan.explode_violations(self.validated.drop(VIOLATIONS_COL))
        out = v.select(
            idc,
            "__v.constraint_id",
            "__v.column",
            "__v.value",
            "__v.arg",
            "__v.message",
            F.col("__pos").alias("pos"),
        )
        extra = self.undeclared_columns()
        if extra:
            # additionalProperty=false analog (v4validator.js:287): the
            # schema is static, so one violation per undeclared COLUMN
            # (doc_id null), not per row — documented divergence.
            from schemasaurus_spark.messages import render_message

            spark = self.validated.sparkSession
            msg = render_message("additionalProperties",
                                 overrides=self.plan.suite.messages)
            rows = [(None, "additionalProperties", c, None, None, msg, 0)
                    for c in extra]
            schema_cols = out.schema
            out = out.unionByName(spark.createDataFrame(rows, schema_cols))
        return out

    def undeclared_columns(self) -> list[str]:
        suite = self.plan.suite
        if suite.allow_undeclared_columns:
            return []
        from schemasaurus_spark import dsl as _dsl

        # dotted suite paths declare their TOP-LEVEL column (a.b declares
        # a), and columns the suite reads (Conform extra_cols, Dependency
        # targets) are part of the declared surface — flagging them would
        # report additionalProperties on fully valid data
        declared = {c.split(".")[0] for c in suite.columns}
        declared |= {suite.id_column.split(".")[0], VIOLATIONS_COL}
        declared |= {label.split(".")[0] for label, _ in suite.row}
        refs = _dsl.referenced_columns(
            [c for cs in suite.columns.values() for c in cs]
            + [c for _, c in suite.row],
            definitions=suite.definitions)
        declared |= {r.split(".")[0] for r in refs}
        return [c for c in self.validated.columns if c not in declared]

    def verdicts(self) -> DataFrame:
        """Per-partition (partition_id, n_rows, n_violations, pass).
        Undeclared-column violations (static, not row-scoped) append as a
        pseudo-partition row (partition_id = -2; the engine's aggregate
        checks use -1) so verdict consumers see what violations() reports
        instead of passing a table the violation report calls invalid."""
        base = (
            self.validated
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"),
            )
            .withColumn("pass", F.col("n_violations") == 0)
        )
        extra = self.undeclared_columns()
        if not extra:
            return base
        spark = self.validated.sparkSession
        pseudo = spark.createDataFrame(
            [(-2, 0, len(extra), False)],
            "partition_id int, n_rows long, n_violations long, pass boolean")
        return base.unionByName(pseudo)

    def metrics(self) -> DataFrame:
        """Violation counts per (constraint_id, column) — the metrics table.
        Includes the STATIC undeclared-column additionalProperties counts:
        violations()/verdicts()/is_valid() all report them, and a metrics
        consumer must not see a clean table the other surfaces call
        invalid (round-4 review)."""
        base = (
            self.validated
            .select(F.explode(VIOLATIONS_COL).alias("v"))
            .groupBy("v.constraint_id", "v.column")
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        extra = self.undeclared_columns()
        if not extra:
            return base
        spark = self.validated.sparkSession
        static = spark.createDataFrame(
            [("additionalProperties", c, 1) for c in extra],
            "constraint_id string, column string, n_violations long")
        return base.unionByName(static)

    def violation_examples(self, k: int = 5) -> DataFrame:
        """Up to k example violations per (constraint_id, column) — the
        triage view (SURVEY §2.4 window-functions row). The window runs over
        the already-exploded violation rows (small), never the input."""
        from pyspark.sql.window import Window

        v = self.violations()
        w = Window.partitionBy("constraint_id", "column").orderBy(
            F.col(self.id_column))
        return (
            v.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
        )

    def register_views(self, prefix: str = "validation") -> list[str]:
        """Expose the result as temp views for the SQL surface:
        <prefix>_violations / _verdicts / _metrics — `spark.sql` users get
        the same lazily-planned DataFrames."""
        names = []
        for suffix, df in (("violations", self.violations()),
                           ("verdicts", self.verdicts()),
                           ("metrics", self.metrics())):
            name = f"{prefix}_{suffix}"
            df.createOrReplaceTempView(name)
            names.append(name)
        return names

    def _row_filter(self, want_valid: bool) -> DataFrame:
        """Row filter with a pushdown barrier. Neither an AND-ed barrier
        nor `when(barrier, pred)` works: Catalyst partitions AND-conjuncts
        by determinism, and SimplifyConditionalsInPredicate rewrites the
        CASE WHEN back into `barrier AND pred` — both still push the whole
        compiled constraint tree into the parquet scan as an interpreted
        DataFilter (round-4 review, verified in the physical plan; the
        exact 77s-vs-5s negative-scaling pathology of BENCH.md round 2).
        An OR-disjunct with a never-true NON-DETERMINISTIC side is not
        conjunct-splittable, so the predicate stays above the scan — but
        the barrier must also survive simplification: Spark 4 range-folds
        `rand() < -1` to false and drops the disjunct (verified).
        `monotonically_increasing_id() < 0` is flagged non-deterministic,
        costs nothing, is false by contract, and is NOT folded;
        tests/test_plans.py pins the scan's DataFilters empty."""
        rv = self.plan.row_valid
        pred = (F.coalesce(rv, F.lit(False)) if rv is not None
                else F.size(VIOLATIONS_COL) == 0)
        if not want_valid:
            pred = ~pred
        barrier = F.monotonically_increasing_id() < F.lit(0)  # always FALSE
        return (self.validated.where(pred | barrier)
                .drop(VIOLATIONS_COL))

    def valid_rows(self) -> DataFrame:
        return self._row_filter(True)

    def invalid_rows(self) -> DataFrame:
        return self._row_filter(False)

    def write_split(self, out_dir: str, mode: str = "error",
                    flag_col: str = "quarantined",
                    report_col: str = "violation_report",
                    compression: str = "snappy") -> dict:
        """Quarantine split sink: ONE scan writes valid rows under
        ``{out_dir}/{flag_col}=false/`` and failing rows (with their
        violation list as a JSON ``report_col``) under ``…=true/`` — the
        validation-tier gate of a training pipeline (clean corpus flows
        downstream, quarantine goes to triage).

        Scale shape: the flag is computed IN the validation projection and
        routed via ``partitionBy`` — no ``row_valid`` filter (the parquet
        DataFilter-pushdown pathology needs no barrier because there is no
        filter at all), no second scan, no shuffle; the dynamic-partition
        writer's per-task sort is over one boolean. Contrast
        ``valid_rows()``/``invalid_rows()``: TWO scans each re-evaluating
        the constraint tree. Counts come from the written parquet FOOTERS
        (pyarrow metadata.num_rows — zero data read, the lineage module's
        manifest trick).

        Static undeclared-column ``additionalProperties`` violations are
        table-scoped, not row-scoped — they never quarantine rows; check
        ``undeclared_columns()``/``verdicts()`` for them.

        The flag is written as STRING ``"true"``/``"false"``: partition
        directories only keep the rendered value, and Spark's
        partition-type inference reads booleans back as strings anyway —
        a string flag round-trips type-stably (filter with
        ``col(flag_col) == "true"``).
        """
        out = split_frame(self.validated, flag_col, report_col)
        (out.write.mode(mode)
            .option("compression", compression)
            .partitionBy(flag_col)
            .parquet(out_dir))
        counts = {"n_valid": 0, "n_quarantined": 0}
        import glob as _glob
        import os as _os

        import pyarrow.parquet as _pq

        for side, key in ((f"{flag_col}=false", "n_valid"),
                          (f"{flag_col}=true", "n_quarantined")):
            for f in _glob.glob(_os.path.join(out_dir, side, "*.parquet")):
                counts[key] += _pq.ParquetFile(f).metadata.num_rows
        counts["out_dir"] = out_dir
        return counts

    def is_valid(self) -> bool:
        """Table-level verdict (collects one aggregate row). Includes the
        static undeclared-column check — violations() reports those, so the
        boolean verdict must agree."""
        if self.undeclared_columns():
            return False
        row = self.validated.select(
            F.sum(F.size(VIOLATIONS_COL)).alias("n")
        ).first()
        return (row["n"] or 0) == 0


def split_frame(validated: DataFrame, flag_col: str = "quarantined",
                report_col: str = "violation_report") -> DataFrame:
    """The quarantine-split projection shared by the batch sink
    (:meth:`ValidationResult.write_split`) and the streaming sink
    (``streaming.stream.quarantine_sink``): flag + JSON violation report
    computed IN the validation projection, violations column dropped —
    ONE implementation so the two paths can never drift. The flag is a
    STRING ``"true"``/``"false"`` for a type-stable partition round-trip
    (write_split's docstring has the full rationale)."""
    clash = {flag_col, report_col} & set(validated.columns)
    if clash - {VIOLATIONS_COL}:
        raise ValueError(
            f"output columns {sorted(clash)} already exist in the "
            f"input — pass different flag_col/report_col")
    q = F.size(F.col(VIOLATIONS_COL)) > 0
    return (validated
            .withColumn(report_col,
                        F.when(q, F.to_json(F.col(VIOLATIONS_COL))))
            .withColumn(flag_col, q.cast("string"))
            .drop(VIOLATIONS_COL))


def validate(df: DataFrame, suite: Suite) -> ValidationResult:
    """Compile (once, driver-side) + apply (lazy)."""
    plan = compile_suite(suite, df.schema)
    return ValidationResult(plan, plan.apply(df))


def make_value_validator(spark, suite: Suite, schema: str):
    """The reference's per-value entry point, verbatim shape:
    ``newValidator(schema)`` returns ``fn(value) -> {valid, errors}``
    (v4validator.js:326-331; iterator.js:16-20). Compile ONCE, then call
    with plain dicts; each error carries the reference's record fields
    (code, message, value, arg, path=[column]).

    This is a convenience for parity/tests and small interactive checks —
    it round-trips one row through a local DataFrame, so it is NOT the
    scale path (tables go through :func:`validate`)."""
    t = T._parse_datatype_string(schema) if isinstance(schema, str) else schema
    plan = compile_suite(suite, t)

    def validator(value: dict) -> dict:
        row = tuple(value.get(f.name) for f in t.fields)
        df = spark.createDataFrame([row], t)
        rows = ValidationResult(plan, plan.apply(df)).violations().collect()
        errors = [
            {"code": r["constraint_id"], "message": r["message"],
             "value": r["value"], "arg": r["arg"], "path": [r["column"]]}
            for r in rows
        ]
        return {"valid": not errors, "errors": errors}

    return validator
