"""Snapshot table store — Iceberg semantics on partitioned Parquet.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the adapter provides the same contract on Parquet + a JSON manifest
(SURVEY.md §7 Step 0): ``append(df)`` creates a new immutable snapshot,
``read(snapshot_id)`` reads a snapshot's file set, ``added_files`` gives the
delta between snapshots (the analog of Iceberg incremental reads). Swapping
in Iceberg means reimplementing only this class against the catalog API —
nothing above it changes.

Files are the unit of lineage/resume: a parquet file is immutable once
written, so (snapshot, file) identifies a resumable work unit — see
plans/lineage.py.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def file_record_count(path: str) -> int:
    """Row count from the parquet footer only (metadata read, no data scan) —
    the information Iceberg keeps in its manifests."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


@dataclass(frozen=True)
class Snapshot:
    id: str
    files: tuple[str, ...]
    ts: float
    # per-file row counts, the analog of Iceberg's manifest `record_count`:
    # lets a checkpointed run know n_rows per file WITHOUT scanning data.
    record_counts: dict[str, int] = None  # type: ignore[assignment]

    def record_count(self, file: str) -> int | None:
        if self.record_counts:
            return self.record_counts.get(file)
        return None


class SnapshotStore:
    def __init__(self, root: str):
        self.root = Path(root)
        self.data_dir = self.root / "data"
        self.manifest_path = self.root / "manifest.json"
        self.root.mkdir(parents=True, exist_ok=True)
        self.data_dir.mkdir(exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _load(self) -> list[dict]:
        if not self.manifest_path.exists():
            return []
        return json.loads(self.manifest_path.read_text())["snapshots"]

    def _save(self, snaps: list[dict]) -> None:
        tmp = self.manifest_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"snapshots": snaps}, indent=1))
        tmp.replace(self.manifest_path)  # atomic commit, Iceberg-style

    def snapshots(self) -> list[Snapshot]:
        return [Snapshot(s["id"], tuple(s["files"]), s["ts"],
                         s.get("record_counts") or {})
                for s in self._load()]

    def current(self) -> Snapshot | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # -- write -------------------------------------------------------------

    def append(self, df: DataFrame) -> Snapshot:
        """Write df as a new snapshot = previous files + new files. Per-file
        row counts land in the manifest (Iceberg `record_count` analog) via a
        footer-only read — no data scan."""
        snaps = self._load()
        sid = f"s{len(snaps):05d}"
        out_dir = self.data_dir / sid
        # overwrite, not error: a crash between this write and _save()
        # leaves an orphan dir for an id the manifest never recorded; the
        # retry recomputes the SAME id, and mode('error') would then brick
        # every future append with 'path already exists'. Overwriting the
        # unrecorded staging dir is exactly the manifest-last commit
        # protocol — only _save() publishes a snapshot.
        df.write.mode("overwrite").parquet(str(out_dir))
        new_files = sorted(str(p) for p in out_dir.glob("*.parquet"))
        prev = snaps[-1]["files"] if snaps else []
        prev_counts = snaps[-1].get("record_counts") or {} if snaps else {}
        counts = dict(prev_counts)
        counts.update({f: file_record_count(f) for f in new_files})
        snap = {"id": sid, "files": prev + new_files, "ts": time.time(),
                "record_counts": counts}
        snaps.append(snap)
        self._save(snaps)
        return Snapshot(sid, tuple(snap["files"]), snap["ts"], counts)

    # -- read --------------------------------------------------------------

    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        snap = self._get(snapshot_id)
        return spark.read.parquet(*snap.files)

    def added_files(self, from_id: str | None, to_id: str | None = None) -> list[str]:
        """Incremental read surface: files added in (from_id, to_id]."""
        base = set(self._get(from_id).files) if from_id else set()
        return [f for f in self._get(to_id).files if f not in base]

    def _get(self, snapshot_id: str | None) -> Snapshot:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no snapshots in {self.root}")
        if snapshot_id is None:
            return snaps[-1]
        for s in snaps:
            if s.id == snapshot_id:
                return s
        raise KeyError(f"unknown snapshot '{snapshot_id}'")
