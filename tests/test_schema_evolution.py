"""Schema-evolution checks (plans/schema_evolution.py): recursive diff
with Iceberg promotion rules, and the snapshot-store walk that catches an
upstream writer changing the schema mid-table."""

from pyspark.sql import types as T

from schemasaurus_spark.plans.schema_evolution import (
    breaking_changes,
    schema_diff,
    snapshot_schema_changes,
)


def _s(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


def test_identical_and_reordered_schemas_no_changes(spark):
    a = _s("a int, b string")
    assert schema_diff(a, a) == []
    # Spark resolves by name: column order is not a change
    assert schema_diff(a, _s("b string, a int")) == []


def test_safe_promotions_not_breaking(spark):
    changes = schema_diff(_s("a int, b float, c decimal(10,2)"),
                          _s("a bigint, b double, c decimal(20,2)"))
    assert len(changes) == 3
    assert not breaking_changes(changes)


def test_breaking_changes_classified(spark):
    old = _s("a int, b string, c double")
    new = _s("a string, c float")
    kinds = {(c.kind, c.column, c.breaking)
             for c in schema_diff(old, new)}
    assert kinds == {
        ("type_changed", "a", True),    # int -> string: lossy
        ("removed", "b", True),
        ("type_changed", "c", True),    # double -> float: narrowing
    }


def test_added_column_nullable_vs_required(spark):
    old = _s("a int")
    new = T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("opt", T.StringType(), nullable=True),
        T.StructField("req", T.StringType(), nullable=False),
    ])
    by_col = {c.column: c for c in schema_diff(old, new)}
    assert not by_col["opt"].breaking
    assert by_col["req"].breaking


def test_nested_struct_array_map_paths(spark):
    old = _s("s struct<x:int,y:array<int>>, m map<string,int>")
    new = _s("s struct<x:bigint,y:array<string>>, m map<string,bigint>")
    by_col = {c.column: c for c in schema_diff(old, new)}
    assert not by_col["s.x"].breaking          # int -> long inside struct
    assert by_col["s.y[]"].breaking            # array elem int -> string
    assert not by_col["m{}"].breaking          # map value int -> long
    tight = schema_diff(
        T.StructType([T.StructField("a", T.IntegerType(), nullable=True)]),
        T.StructType([T.StructField("a", T.IntegerType(), nullable=False)]))
    assert [c.kind for c in tight] == ["nullability_tightened"]
    assert tight[0].breaking


def test_snapshot_store_schema_walk(spark, tmp_path):
    """An upstream writer drifts the schema between snapshots: the walk
    reports the (from, to) pair and the breaking change, using only the
    ADDED files of each snapshot (never a merged full-table read)."""
    from schemasaurus_spark.sources.storage import SnapshotStore

    store = SnapshotStore(str(tmp_path / "tbl"))
    store.append(spark.createDataFrame(
        [("a", 1)], "doc_id string, n_tok int"))
    store.append(spark.createDataFrame(
        [("b", 2)], "doc_id string, n_tok int"))          # same schema
    store.append(spark.createDataFrame(
        [("c", 3, "web")], "doc_id string, n_tok bigint, source string"))

    changed = snapshot_schema_changes(store, spark)
    assert len(changed) == 1
    frm, to, changes = changed[0]
    assert (frm, to) == ("s00001", "s00002")
    by_col = {c.column: c for c in changes}
    assert by_col["n_tok"].kind == "type_changed"
    assert not by_col["n_tok"].breaking        # int -> long: safe
    assert by_col["source"].kind == "added"
    assert not breaking_changes(changes)


def test_job_check_schema_flag(spark, tmp_path):
    """--check-schema on the packaged job: breaking drift fails the run
    (exit 1) with the change report in the JSON; safe drift passes."""
    import json
    import os
    import subprocess
    import sys

    from schemasaurus_spark.sources.storage import SnapshotStore

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    store = SnapshotStore(str(tmp_path / "tbl"))
    store.append(spark.createDataFrame(
        [("ab-00000001", 5, "web")],
        "doc_id string, n_tok int, source string"))
    store.append(spark.createDataFrame(
        [("ab-00000002", 7)],   # drops source: BREAKING
        "doc_id string, n_tok int"))

    # a minimal suite over doc_id only, so row validation passes on both
    # file schemas and exit 1 can come ONLY from the schema check
    doc = {"type": "object",
           "properties": {"doc_id": {"type": "string"}},
           "required": ["doc_id"]}
    doc_path = str(tmp_path / "schema.json")
    with open(doc_path, "w") as f:
        json.dump(doc, f)

    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "validate_job.py"),
         "--table", str(tmp_path / "tbl"), "--state",
         str(tmp_path / "state"), "--schema-json", doc_path,
         "--check-schema"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    rep = json.loads(lines[-1])
    assert out.returncode == 1 and not rep["pass"]
    changes = rep["schema_changes"]
    assert len(changes) == 1 and changes[0]["from"] == "s00000"
    assert any(c["kind"] == "removed" and c["column"] == "source"
               and c["breaking"] for c in changes[0]["changes"])
