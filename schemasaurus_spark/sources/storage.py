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
        # absolutize at construction: Spark resolves relative paths against
        # the JVM working directory, which need not match the Python CWD —
        # a relative root would silently write data somewhere else entirely
        self.root = Path(root).absolute()
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

    def _resolve(self, path: str) -> str:
        """Manifest path → absolute path. New-format manifests store paths
        RELATIVE TO THE STORE ROOT (relocatable store, and the same file
        resolves identically from any driver CWD — lineage keys depend on
        it). Legacy manifests stored paths as glob() produced them
        (CWD-relative when the root arg was relative): root-joined first,
        CWD fallback for legacy rows."""
        import os

        if os.path.isabs(path):
            return path
        rooted = os.path.abspath(str(self.root / path))
        if os.path.exists(rooted):
            return rooted
        return os.path.abspath(path)  # legacy CWD-relative manifest row

    def snapshots(self) -> list[Snapshot]:
        out = []
        for s in self._load():
            files = tuple(self._resolve(f) for f in s["files"])
            counts = {self._resolve(f): n
                      for f, n in (s.get("record_counts") or {}).items()}
            out.append(Snapshot(s["id"], files, s["ts"], counts))
        return out

    def current(self) -> Snapshot | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    # -- write -------------------------------------------------------------

    def append(self, df: DataFrame) -> Snapshot:
        """Write df as a new snapshot = previous files + new files. Per-file
        row counts land in the manifest (Iceberg `record_count` analog) via a
        footer-only read — no data scan.

        Concurrency + crash safety (round-3 ADVICE): the whole
        load→write→save sequence holds an advisory ``flock`` on the store,
        so two concurrent ``append()`` calls serialize instead of computing
        the same sid and overwriting each other's committed files (Iceberg's
        optimistic catalog swap, done pessimistically — same-host drivers
        are the only writers this sandbox has). Data is staged into a
        uuid-named temp dir and atomically renamed to the sid; a crash at
        any point leaves either an unreferenced ``_tmp-*`` dir or an
        unreferenced sid dir (removed on the next locked attempt) — only
        ``_save()`` publishes a snapshot."""
        import os
        import shutil
        import uuid

        lock_path = self.root / ".lock"
        with open(lock_path, "w") as lock_f:
            try:
                import fcntl

                fcntl.flock(lock_f, fcntl.LOCK_EX)
            except ImportError:  # non-POSIX: documented single-writer
                pass
            snaps = self._load()
            sid = f"s{len(snaps):05d}"
            out_dir = self.data_dir / sid
            if out_dir.exists():
                # orphan of a crashed earlier attempt: sid is derived from
                # manifest length, so an existing-but-unpublished dir can
                # only be a leftover — remove it, never read it
                shutil.rmtree(out_dir)
            # reap staging dirs from crashed attempts: _tmp-* is only ever
            # created under this lock, so any that exist now are dead
            # (round-4 review: without this, every crash between write and
            # rename leaked a snapshot-sized directory forever)
            for stale in self.data_dir.glob("_tmp-*"):
                shutil.rmtree(stale, ignore_errors=True)
            tmp_dir = self.data_dir / f"_tmp-{uuid.uuid4().hex}"
            df.write.mode("overwrite").parquet(str(tmp_dir))
            os.rename(tmp_dir, out_dir)
            abs_files = sorted(str(p) for p in out_dir.glob("*.parquet"))
            # manifest stores root-RELATIVE paths (see _resolve)
            root_abs = os.path.abspath(str(self.root))
            new_files = [os.path.relpath(os.path.abspath(f), root_abs)
                         for f in abs_files]
            prev = snaps[-1]["files"] if snaps else []
            prev_counts = snaps[-1].get("record_counts") or {} if snaps else {}
            counts = dict(prev_counts)
            counts.update({f: file_record_count(a)
                           for f, a in zip(new_files, abs_files)})
            snap = {"id": sid, "files": prev + new_files, "ts": time.time(),
                    "record_counts": counts}
            snaps.append(snap)
            self._save(snaps)
        return Snapshot(
            sid, tuple(self._resolve(f) for f in snap["files"]), snap["ts"],
            {self._resolve(f): n for f, n in counts.items()})

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
