"""Checkpointed drift baselines.

North rule: "distribution-drift detection (PSI/KS on n_tok and token-id
histograms) against a CHECKPOINTED baseline". The baseline is a fixed-edge
histogram written once (bootstrap run) and compared against forever after;
edges are frozen alongside it so bucket identities never shift between
runs (SURVEY.md §7 hard-part 4).

Layout under the state dir: ``baseline/<column>/hist-<version>/``
(parquet: group_key, bucket, count) + ``baseline/<column>/edges.json``
naming the committed hist version — edges.json is the single atomic
commit point, so a crash mid-rebaseline can never pair a new histogram
with old edges.
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

    def save(self, hist: DataFrame, column: str, edges: list[float],
             config: dict | None = None) -> None:
        """Freeze the current histogram + its edges. Histogram is groups ×
        buckets rows — sketch-sized at any input scale.

        Crash-atomic for RE-baselining too: the histogram lands in a fresh
        versioned dir and edges.json (the atomic commit) names it.
        Overwriting ``hist/`` in place would let a crash between the two
        writes pair the NEW counts with the OLD edges — bucket identities
        silently shift, exactly what this module promises never happens."""
        import uuid

        d = self._dir(column)
        # remember the version committed BEFORE this save: a concurrent
        # load() may have just read edges.json naming it, so it must
        # survive this save's cleanup (round-3 ADVICE — deleting every
        # other hist* dir raced concurrent readers/writers)
        prev_committed = None
        if (d / "edges.json").exists():
            try:
                prev_committed = json.loads(
                    (d / "edges.json").read_text()).get("hist")
            except (ValueError, OSError):
                prev_committed = None
        version = uuid.uuid4().hex[:8]
        hist.coalesce(1).write.mode("overwrite").parquet(
            str(d / f"hist-{version}"))
        tmp = d / "edges.json.tmp"
        # `config` freezes HOW the histogram was built (group key, scalar
        # vs array form): comparing against a baseline built under a
        # different grouping silently flags every group as drifted
        # (round-4 review) — callers check config(column) and refuse
        tmp.write_text(json.dumps({"column": column, "edges": list(edges),
                                   "hist": f"hist-{version}",
                                   "config": config or {}}))
        tmp.replace(d / "edges.json")  # atomic commit, written LAST
        # best-effort cleanup of superseded versions (crash-safe: an
        # uncommitted or stale hist-* dir is simply never referenced).
        # The previous committed version is RETAINED one generation so an
        # in-flight load() that read the old edges.json still finds its
        # directory; it is reaped by the save after next.
        import shutil

        keep = {f"hist-{version}", prev_committed}
        for old in d.glob("hist*"):
            if old.is_dir() and old.name not in keep:
                shutil.rmtree(old, ignore_errors=True)

    def load(self, spark: SparkSession, column: str):
        """(hist_df, edges) or None when no baseline is checkpointed yet."""
        d = self._dir(column)
        if not self.exists(column):
            return None
        meta = json.loads((d / "edges.json").read_text())
        hist_dir = meta.get("hist", "hist")  # pre-versioning baselines
        return spark.read.parquet(str(d / hist_dir)), meta["edges"]

    def config(self, column: str) -> dict:
        """The frozen build config ({} for pre-config baselines)."""
        d = self._dir(column)
        if not self.exists(column):
            return {}
        return json.loads((d / "edges.json").read_text()).get("config", {})
