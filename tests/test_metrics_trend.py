"""Run-over-run violation-rate trend (plans/lineage.metrics_trend):
spike/novel detection between the last two validated increments, reading
only the lineage/metrics tables (zero input scans)."""

from schemasaurus_spark import Enum, Minimum, NotNull, Suite, datagen
from schemasaurus_spark.plans.lineage import ValidationCheckpoint, metrics_trend
from schemasaurus_spark.sources.storage import SnapshotStore


def _suite():
    return Suite(
        id_column="doc_id",
        columns={"doc_id": [NotNull()],
                 "n_tok": [Minimum(1)],
                 "source": [Enum(datagen.SOURCES)]},
        name="trend_suite",
    )


def test_spike_and_novel_alerts(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    cp = ValidationCheckpoint(str(tmp_path / "state"))

    # snapshot 1: light enum corruption (~1/50 of 400 rows)
    store.append(datagen.finalize(datagen.corrupt_enum(
        datagen.gen_sequences(spark, 400, 4), every=50)))
    cp.run(spark, store, _suite())
    assert metrics_trend(cp, spark) == []  # one snapshot: nothing to compare

    # snapshot 2: heavy enum corruption (~1/3) + NOVEL null doc_ids
    d2 = datagen.gen_sequences(spark, 400, 4, start=400)
    d2 = datagen.corrupt_enum(d2, every=3)
    d2 = datagen.corrupt_null_docid(d2, every=8)
    store.append(datagen.finalize(d2))
    cp.run(spark, store, _suite())

    alerts = {(a.constraint_id, a.column): a
              for a in metrics_trend(cp, spark, factor=5.0, min_count=10)}
    spike = alerts[("enum", "source")]
    assert spike.kind == "spike"
    assert spike.cur_rate >= 5.0 * spike.prev_rate
    assert spike.prev_n > 0 and spike.cur_n >= 10
    novel = alerts[("required", "doc_id")]
    assert novel.kind == "novel" and novel.prev_n == 0


def test_min_count_suppresses_noise(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    cp = ValidationCheckpoint(str(tmp_path / "state"))
    store.append(datagen.finalize(datagen.gen_sequences(spark, 200, 2)))
    cp.run(spark, store, _suite())
    d2 = datagen.finalize(datagen.corrupt_enum(
        datagen.gen_sequences(spark, 200, 2, start=200), every=60))
    store.append(d2)
    cp.run(spark, store, _suite())
    # a handful of novel violations stay under min_count -> no alert
    n_bad = d2.where(d2.source == "sp4m").count()
    assert 0 < n_bad < 10
    assert metrics_trend(cp, spark, min_count=10) == []
    assert [a.kind for a in
            metrics_trend(cp, spark, min_count=1)] == ["novel"]


def test_job_trend_flag(spark, tmp_path):
    """--trend on the packaged job: clean history passes; a violation
    spike between increments fails the run with the alert in the JSON."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    store = SnapshotStore(str(tmp_path / "tbl"))
    store.append(datagen.finalize(datagen.corrupt_enum(
        datagen.gen_sequences(spark, 400, 4), every=50)))

    def run():
        env = dict(os.environ, SPARK_GRAFT_CPUS="4")
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "validate_job.py"),
             "--table", str(tmp_path / "tbl"), "--state",
             str(tmp_path / "state"), "--trend"],
            capture_output=True, text=True, timeout=600, cwd=repo, env=env)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        assert lines, f"no JSON:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
        return json.loads(lines[-1]), out.returncode

    rep1, _ = run()
    assert rep1["trend"] == []  # single increment: nothing to compare

    d2 = datagen.corrupt_enum(
        datagen.gen_sequences(spark, 400, 4, start=400), every=3)
    store.append(datagen.finalize(d2))
    rep2, rc2 = run()
    assert rc2 == 1 and not rep2["pass"]
    kinds = {(a["constraint_id"], a["kind"]) for a in rep2["trend"]}
    assert ("enum", "spike") in kinds or ("enum", "novel") in kinds
