"""Checkpointed drift baselines.

North rule: "distribution-drift detection (PSI/KS on n_tok and token-id
histograms) against a CHECKPOINTED baseline". The baseline is a fixed-edge
histogram written once (bootstrap run) and compared against forever after;
edges are frozen alongside it so bucket identities never shift between
runs (SURVEY.md §7 hard-part 4).

Layout under the state dir: ``baseline/<column>/hist/`` (parquet:
group_key, bucket, count) + ``baseline/<column>/edges.json``.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class BaselineStore:
    def __init__(self, state_dir: str):
        self.root = Path(state_dir) / "baseline"

    def _dir(self, column: str) -> Path:
        return self.root / column

    def exists(self, column: str) -> bool:
        return (self._dir(column) / "edges.json").exists()

    def save(self, hist: DataFrame, column: str, edges: list[float]) -> None:
        """Bootstrap: freeze the current histogram + its edges. Histogram is
        groups × buckets rows — sketch-sized at any input scale."""
        d = self._dir(column)
        hist.coalesce(1).write.mode("overwrite").parquet(str(d / "hist"))
        tmp = d / "edges.json.tmp"
        tmp.write_text(json.dumps({"column": column, "edges": list(edges)}))
        tmp.replace(d / "edges.json")  # atomic commit, written LAST

    def load(self, spark: SparkSession, column: str):
        """(hist_df, edges) or None when no baseline is checkpointed yet."""
        d = self._dir(column)
        if not self.exists(column):
            return None
        meta = json.loads((d / "edges.json").read_text())
        return spark.read.parquet(str(d / "hist")), meta["edges"]
