#!/usr/bin/env python
"""Cluster entry point: checkpointed, resumable validation of a snapshot
table.

    spark-submit --py-files dist/schemasaurus_spark.zip \
        jobs/validate_job.py --table /path/to/table --state /path/to/state \
        [--snapshot sNNNNN] [--suite sequences_full]

Exit code 0 = table passed, 1 = violations found (lineage/violations/
metrics tables written either way), 2 = usage error.
"""

from __future__ import annotations

import argparse
import json
import sys


def sequences_full_suite():
    import pyspark.sql.functions as F
    from schemasaurus_spark import dsl, datagen

    return dsl.Suite(
        id_column="doc_id",
        columns={
            "doc_id": [dsl.NotNull(), dsl.Pattern(r"^[a-z]+-[0-9]{8}$")],
            "n_tok": [dsl.NotNull(), dsl.Minimum(1), dsl.Maximum(2048)],
            "source": [dsl.NotNull(), dsl.Enum(datagen.SOURCES)],
            "tokens": [
                dsl.MinItems(1), dsl.MaxItems(2048),
                dsl.Items([dsl.Minimum(0), dsl.Maximum(datagen.VOCAB - 1)]),
            ],
        },
        row=[("tokens", dsl.Conform(
            name="size_eq_n_tok",
            expr=lambda c: F.size("tokens") == F.col("n_tok")))],
        name="sequences_full_v1",
    )


SUITES = {"sequences_full": sequences_full_suite}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="snapshot-table root")
    ap.add_argument("--state", required=True, help="checkpoint state dir")
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--suite", default="sequences_full", choices=sorted(SUITES))
    ap.add_argument("--incremental", action="store_true",
                    help="validate every snapshot not yet covered by "
                         "lineage (delta files only, carried-forward "
                         "lineage for unchanged files)")
    args = ap.parse_args()

    # On a cluster, spark-submit provides the session; get_spark only fills
    # in local-mode defaults when run standalone.
    from schemasaurus_spark.session import get_spark
    from schemasaurus_spark.sources.storage import SnapshotStore
    from schemasaurus_spark.plans.lineage import ValidationCheckpoint

    spark = get_spark("validate_job")
    store = SnapshotStore(args.table)
    cp = ValidationCheckpoint(args.state)
    suite = SUITES[args.suite]()
    if args.incremental:
        from schemasaurus_spark.streaming.incremental import (
            IncrementalState, validate_new_snapshots)

        runs = validate_new_snapshots(spark, store, suite, cp,
                                      IncrementalState())
        if not runs:
            print(json.dumps({"snapshots_validated": 0, "pass": True}))
            return 0
        run = runs[-1]
    else:
        run = cp.run(spark, store, suite, args.snapshot)
    print(json.dumps({
        "snapshot_id": run.snapshot_id,
        "suite_hash": run.suite_hash,
        "files_validated": run.files_validated,
        "files_skipped": run.files_skipped,
        "n_rows": run.n_rows,
        "n_violations": run.n_violations,
        "pass": run.table_pass,
    }))
    return 0 if run.table_pass else 1


if __name__ == "__main__":
    sys.exit(main())
