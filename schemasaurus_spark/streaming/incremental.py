"""Incremental snapshot validation — the engine's streaming analog.

SURVEY.md §2.4: the corpus is a static snapshot table, so the streaming
story is *incremental validation of snapshot deltas* (Iceberg incremental
read semantics), not Structured Streaming state: each new snapshot's added
files are validated (cheap — only the delta), lineage/metrics are appended,
and mergeable sketch state (operators/sketch.py) is folded in, so
whole-table statistics stay current without rescanning history.

A true Structured Streaming source could feed the same ValidationPlan
(the plan is a pure projection and works on streaming DataFrames); that
path is exercised in tests/test_streaming.py with the rate source.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from schemasaurus_spark.dsl import Suite
from schemasaurus_spark.plans.lineage import CheckpointedRun, ValidationCheckpoint
from schemasaurus_spark.sources.storage import SnapshotStore


@dataclass
class IncrementalState:
    last_validated_snapshot: str | None = None


def validate_new_snapshots(
    spark: SparkSession,
    store: SnapshotStore,
    suite: Suite,
    checkpoint: ValidationCheckpoint,
    state: IncrementalState,
) -> list[CheckpointedRun]:
    """Validate every snapshot appended since state.last_validated_snapshot.
    Because the lineage unit is the file and snapshots share unchanged
    files, each run touches ONLY the delta files (resume machinery reuses
    prior snapshots' lineage rows per (snapshot, suite) — files already
    validated under this suite for an earlier snapshot are revalidated only
    if the snapshot id is part of the lineage key; we pre-seed lineage for
    carried-over files instead)."""
    runs: list[CheckpointedRun] = []
    snaps = store.snapshots()
    seen = state.last_validated_snapshot
    start = 0
    if seen is not None:
        start = next(i for i, s in enumerate(snaps) if s.id == seen) + 1
    suite_hash = suite.fingerprint()
    for snap in snaps[start:]:
        # carry forward lineage of files validated under previous snapshots
        if runs or seen is not None:
            prev_id = snaps[start - 1].id if not runs else runs[-1].snapshot_id
            _carry_forward(spark, checkpoint, prev_id, snap.id, suite_hash)
        runs.append(checkpoint.run(spark, store, suite, snap.id))
        state.last_validated_snapshot = snap.id
    return runs


def _carry_forward(spark, checkpoint: ValidationCheckpoint, prev_id: str,
                   new_id: str, suite_hash: str) -> None:
    """Copy lineage rows for files unchanged between snapshots so the new
    snapshot's run only processes added files."""
    from pyspark.sql import functions as F

    lin = checkpoint.lineage(spark)
    prev = lin.where((F.col("snapshot_id") == prev_id)
                     & (F.col("suite_hash") == suite_hash))
    already = checkpoint.completed_files(spark, new_id, suite_hash)
    carry = prev.where(~F.col("file").isin(list(already))) if already else prev
    carried = carry.withColumn("snapshot_id", F.lit(new_id))
    if carried.take(1):
        carried.coalesce(1).write.mode("append").parquet(
            str(checkpoint._table("lineage")))
