"""Checkpointed validation runs: per-file lineage, metrics, resume.

North-rule requirements: "emits per-partition pass/fail verdicts ...
resumes from Iceberg-snapshot checkpoints with per-partition lineage +
metrics tables".

The resumable unit is the immutable **input file** (not
``spark_partition_id``, which changes with parallelism): a lineage row
``(snapshot_id, suite_hash, file, n_rows, n_violations, pass, wall_ts)``
records that a file was fully validated under a given suite fingerprint.
``run`` validates only files without a lineage row for
(snapshot, suite_hash) — crash-and-rerun skips completed work, and a suite
change (different fingerprint) naturally invalidates the checkpoint.

State lives in three append-only parquet tables under ``state_dir``:
``lineage/``, ``violations/``, ``metrics/``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from schemasaurus_spark.compiler import VIOLATIONS_COL, compile_suite
from schemasaurus_spark.dsl import Suite
from schemasaurus_spark.sources.storage import SnapshotStore

LINEAGE_SCHEMA = (
    "snapshot_id string, suite_hash string, file string, n_rows long, "
    "n_violations long, pass boolean, wall_ts double"
)


def _canon(path: str) -> str:
    """input_file_name() yields file:/// URIs; manifests store bare paths."""
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            return path[len(prefix):]
    return path


@dataclass
class CheckpointedRun:
    snapshot_id: str
    suite_hash: str
    files_validated: int
    files_skipped: int
    n_rows: int
    n_violations: int

    @property
    def table_pass(self) -> bool:
        return self.n_violations == 0


class ValidationCheckpoint:
    def __init__(self, state_dir: str):
        self.state = Path(state_dir)
        self.state.mkdir(parents=True, exist_ok=True)

    def _table(self, name: str) -> Path:
        return self.state / name

    def lineage(self, spark: SparkSession) -> DataFrame:
        p = self._table("lineage")
        if not p.exists():
            return spark.createDataFrame([], LINEAGE_SCHEMA)
        return spark.read.parquet(str(p))

    def violations(self, spark: SparkSession) -> DataFrame:
        p = self._table("violations")
        if not p.exists():
            return spark.createDataFrame(
                [], "doc_id string, constraint_id string, column string, "
                    "value string, arg string, message string, "
                    "snapshot_id string, suite_hash string, file string")
        return spark.read.parquet(str(p))

    def completed_files(self, spark: SparkSession, snapshot_id: str,
                        suite_hash: str) -> set[str]:
        lin = self.lineage(spark)
        rows = (
            lin.where((F.col("snapshot_id") == snapshot_id)
                      & (F.col("suite_hash") == suite_hash))
            .select("file").collect()
        )
        return {r["file"] for r in rows}

    # -- the checkpointed run ------------------------------------------------

    def run(self, spark: SparkSession, store: SnapshotStore, suite: Suite,
            snapshot_id: str | None = None) -> CheckpointedRun:
        snap = store._get(snapshot_id)
        suite_hash = suite.fingerprint()
        done = self.completed_files(spark, snap.id, suite_hash)
        todo = [f for f in snap.files if f not in done]
        if not todo:
            lin = self.lineage(spark).where(
                (F.col("snapshot_id") == snap.id)
                & (F.col("suite_hash") == suite_hash))
            agg = lin.agg(F.sum("n_rows").alias("r"),
                          F.sum("n_violations").alias("v")).first()
            return CheckpointedRun(snap.id, suite_hash, 0, len(done),
                                   int(agg["r"] or 0), int(agg["v"] or 0))

        df = spark.read.parquet(*todo)
        plan = compile_suite(suite, df.schema)
        canon_file = F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
        validated = plan.apply(df).withColumn("__file", canon_file)

        # one pass: per-file verdicts (partial agg → tiny shuffle)
        verd = (
            validated.groupBy("__file")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.size(VIOLATIONS_COL)).alias("n_violations"))
            .withColumn("pass", F.col("n_violations") == 0)
        ).collect()

        # violations appended with full lineage columns
        vio = (
            validated.where(F.size(VIOLATIONS_COL) > 0)
            .select(F.col(suite.id_column).cast("string").alias("doc_id"),
                    F.explode(VIOLATIONS_COL).alias("v"), F.col("__file"))
            .select("doc_id", "v.constraint_id", "v.column", "v.value",
                    "v.arg", "v.message",
                    F.lit(snap.id).alias("snapshot_id"),
                    F.lit(suite_hash).alias("suite_hash"),
                    F.col("__file").alias("file"))
        )
        vio.write.mode("append").parquet(str(self._table("violations")))

        now = time.time()
        lineage_rows = [
            (snap.id, suite_hash, r["__file"], r["n_rows"],
             r["n_violations"], bool(r["pass"]), now)
            for r in verd
        ]
        spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(self._table("lineage")))

        # metrics table: per-constraint counts for this increment
        met = (
            validated.select(F.explode(VIOLATIONS_COL).alias("v"))
            .groupBy("v.constraint_id", "v.column")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .withColumn("snapshot_id", F.lit(snap.id))
            .withColumn("suite_hash", F.lit(suite_hash))
            .withColumn("wall_ts", F.lit(now))
        )
        met.write.mode("append").parquet(str(self._table("metrics")))

        n_rows = sum(r["n_rows"] for r in verd)
        n_vio = sum(r["n_violations"] for r in verd)
        prev = self.lineage(spark).where(
            (F.col("snapshot_id") == snap.id)
            & (F.col("suite_hash") == suite_hash)
            & (~F.col("file").isin(list({r["__file"] for r in verd}))))
        prev_agg = prev.agg(F.sum("n_rows").alias("r"),
                            F.sum("n_violations").alias("v")).first()
        return CheckpointedRun(
            snap.id, suite_hash, len(todo), len(done),
            n_rows + int(prev_agg["r"] or 0),
            n_vio + int(prev_agg["v"] or 0),
        )
