"""Round-4 core-engine review regressions: fingerprint integrity,
surface consistency (invalid_rows/violations/metrics), Ref-aware declared
columns, and suite-walker descent."""

import pyspark.sql.functions as F
import pytest

from schemasaurus_spark import dsl, validate


def test_fingerprint_not_fooled_by_hex_user_data():
    s1 = dsl.Suite(columns={"c": [dsl.Enum(values=("0xa",))]})
    s2 = dsl.Suite(columns={"c": [dsl.Enum(values=("0xb",))]})
    assert s1.fingerprint() != s2.fingerprint()
    assert (dsl.Suite(columns={"c": [dsl.Pattern("0x1f")]}).fingerprint()
            != dsl.Suite(columns={"c": [dsl.Pattern("0x2e")]}).fingerprint())


def test_fingerprint_tracks_conform_body():
    """Editing a lambda's BODY must invalidate resume checkpoints even
    though its qualname and repr are unchanged."""
    f1 = dsl.Suite(
        columns={"c": [dsl.Conform(expr=lambda c: c > 0)]}).fingerprint()
    f2 = dsl.Suite(
        columns={"c": [dsl.Conform(expr=lambda c: c > 100)]}).fingerprint()
    f3 = dsl.Suite(
        columns={"c": [dsl.Conform(expr=lambda c: c > 0)]}).fingerprint()
    assert f1 != f2 and f1 == f3


def test_row_level_container_null_is_consistent(spark):
    """A NULL value under a ROW-level container constraint must agree
    across every surface: it FAILS and EMITS (scalar row-check parity) —
    previously invalid_rows() said invalid while violations() was empty."""
    df = spark.createDataFrame([(1, None), (2, [1, 2])],
                               "doc_id long, arr array<int>")
    suite = dsl.Suite(id_column="doc_id",
                      row=[("arr", dsl.UniqueItems())])
    res = validate(df, suite)
    vio = res.violations().collect()
    assert [(r["doc_id"], r["constraint_id"]) for r in vio] == \
        [(1, "uniqueItems")]
    assert [r["doc_id"] for r in res.invalid_rows().collect()] == [1]
    assert not res.is_valid()


def test_ref_target_extra_cols_are_declared(spark):
    """Conform.extra_cols inside a Ref'd definition is part of the
    declared/read surface: no false additionalProperties, and a typo'd
    target is a compile-time error."""
    suite = dsl.Suite(
        id_column="a",
        columns={"a": [dsl.Ref("d")]},
        definitions={"d": [dsl.Conform(
            name="uses_b", expr=lambda c, b: c > b,
            extra_cols=["b"])]},
        allow_undeclared_columns=False,
    )
    df = spark.createDataFrame([(5, 1)], "a long, b long")
    res = validate(df, suite)
    assert res.undeclared_columns() == []
    assert res.is_valid()

    from schemasaurus_spark.compiler import SuiteCompileError
    bad = dsl.Suite(
        id_column="a", columns={"a": [dsl.Ref("d")]},
        definitions={"d": [dsl.Conform(
            name="uses_nope", expr=lambda c, nope: c > nope,
            extra_cols=["nope"])]})
    with pytest.raises(SuiteCompileError, match="nope"):
        validate(df, bad)


def test_metrics_include_undeclared_columns(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, extra string")
    suite = dsl.Suite(id_column="doc_id",
                      columns={"doc_id": [dsl.NotNull()]},
                      allow_undeclared_columns=False)
    res = validate(df, suite)
    m = {(r["constraint_id"], r["column"]): r["n_violations"]
         for r in res.metrics().collect()}
    assert m.get(("additionalProperties", "extra")) == 1
    assert not res.is_valid()


def test_walker_descends_combinators_and_refs():
    from schemasaurus_spark.plans.suite_tools import suite_to_markdown

    suite = dsl.Suite(
        columns={
            "v": [dsl.AnyOf([[dsl.Minimum(0)], [dsl.Pattern("^x")]]),
                  dsl.Not([dsl.Enum(["z"])])],
            "r": [dsl.Ref("short")],
        },
        definitions={"short": [dsl.MaxLength(3)]},
    )
    md = suite_to_markdown(suite)
    # branch members are ENFORCED, so docs must show them
    assert "minimum" in md and "pattern" in md     # anyOf branches
    assert "enum" in md                            # not branch
    assert "maxLength" in md                       # ref target
    assert "anyOf[0]" in md and "ref:short[0]" in md


# --- round-5 review fixes -------------------------------------------------


_FP_SNIPPET = """
from schemasaurus_spark import dsl

def _expr(c):
    items = [1, 2, 3]
    ok = (lambda x: x >= min(v for v in items))  # nested lambda + genexp
    return ok(c)

s = dsl.Suite(columns={"c": [dsl.Conform(expr=_expr)]}, name="fp_stability")
print(s.fingerprint())
"""


def test_fingerprint_cross_process_with_nested_lambda():
    """Suite.fingerprint must be identical across interpreter processes
    even when a Conform callable embeds NESTED code objects (a lambda and
    a genexp live in co_consts): repr() of a code object carries a
    per-process address, which previously made every driver restart
    recompute a fresh suite_hash and re-validate the whole snapshot."""
    import subprocess
    import sys

    runs = [
        subprocess.run([sys.executable, "-c", _FP_SNIPPET],
                       capture_output=True, text=True, check=True,
                       timeout=120).stdout.strip()
        for _ in range(2)
    ]
    assert runs[0] and runs[0] == runs[1]


def test_json_pointer_decodes_like_decodeURI():
    """references.js:12 uses decodeURI, which leaves RESERVED escapes
    (%23='#', %2F='/') encoded — so 'a%23b' is one segment naming the
    literal key 'a%23b', and %2F must not split a segment in two. Only
    non-reserved escapes (%20) decode."""
    from schemasaurus_spark.schema_json import resolve_json_pointer

    root = {"definitions": {"a%23b": {"t": 1}, "a%2Fb": {"t": 2},
                            "a b": {"t": 3}}}
    assert resolve_json_pointer(root, "#/definitions/a%23b") == {"t": 1}
    assert resolve_json_pointer(root, "#/definitions/a%2Fb") == {"t": 2}
    assert resolve_json_pointer(root, "#/definitions/a%20b") == {"t": 3}


def test_tdigest_accuracy_survives_all_null_group(spark, tmp_path):
    """A lang whose n_chars are ALL NULL makes exact percentile return
    None; close() must record False/skip rather than TypeError-ing the
    whole bench run."""
    from schemasaurus_spark.queries import q_tdigest_accuracy

    rows = [(i, "t" * (50 + i), "xx", "s0", None) for i in range(40)]
    rows += [(100 + i, "u" * (60 + i), "en", "s1", 60 + i)
             for i in range(40)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_tdigest_accuracy(spark, str(tmp_path)).collect()
    got = {(r["lang"], r["q"]): r["within_tol"] for r in out}
    assert got[("en", "p50")] is True
    assert got[("xx", "p50")] is False  # all-NULL group: not close, no crash


def test_struct_closed_flags_undeclared_nonnull_fields(spark):
    """additionalProperties=false on a struct column: undeclared field
    with a value → one 'additionalProperties' violation carrying the
    field name; null undeclared field (padded-absent) passes."""
    df = spark.createDataFrame(
        [(1, (1, "x")), (2, (2, None))],
        "doc_id long, obj struct<k: long, rogue: string>")
    suite = dsl.Suite(id_column="doc_id",
                      columns={"obj": [dsl.StructClosed(allowed=["k"])]})
    vio = validate(df, suite).violations().collect()
    assert [(r["doc_id"], r["constraint_id"], r["value"]) for r in vio] == \
        [(1, "additionalProperties", "rogue")]


def test_struct_closed_pattern_allows_matching_fields(spark):
    df = spark.createDataFrame(
        [(1, ("a", "b"))], "doc_id long, obj struct<v_x: string, other: string>")
    suite = dsl.Suite(id_column="doc_id",
                      columns={"obj": [dsl.StructClosed(patterns=["^v_"])]})
    vio = validate(df, suite).violations().collect()
    assert [r["value"] for r in vio] == ["other"]


def test_merge_object_allof_folds_branches():
    from schemasaurus_spark.schema_json import merge_object_allof

    schema = {
        "properties": {"a": {"minimum": 0}},
        "allOf": [{"properties": {"a": {"maximum": 5},
                                  "b": {"type": "string"}},
                   "required": ["b"]},
                  {"minimum": 3}],  # value-form branch stays put
    }
    out = merge_object_allof(schema)
    assert out["properties"]["a"] == {"allOf": [{"minimum": 0},
                                                {"maximum": 5}]}
    assert out["properties"]["b"] == {"type": "string"}
    assert out["required"] == ["b"]
    assert out["allOf"] == [{"minimum": 3}]


def test_required_without_properties_entry(spark):
    """required: ["a","b"] with no properties still demands presence
    (v4validator.js required-array form)."""
    from schemasaurus_spark.schema_json import suite_from_json_schema

    suite = suite_from_json_schema(
        {"type": "object", "required": ["a", "b"]}, id_column="doc_id")
    df = spark.createDataFrame(
        [(1, 1, 2), (2, 1, None)], "doc_id long, a long, b long")
    vio = validate(df, suite).violations().collect()
    assert [(r["doc_id"], r["constraint_id"], r["column"]) for r in vio] == \
        [(2, "required", "b")]


_FP_SET_SNIPPET = """
from schemasaurus_spark import dsl

def _expr(c):
    ok = (lambda x: x in {'alpha', 'beta', 'gamma', 'delta'})
    return ok(c)

print(dsl.Suite(columns={"c": [dsl.Conform(expr=_expr)]},
                name="fp_set").fingerprint())
"""


def test_fingerprint_stable_across_hash_seeds():
    """set/frozenset co_consts repr in PYTHONHASHSEED-randomized order —
    _const_bytes must sort them or every driver restart re-fingerprints
    (round-5 review finding #1)."""
    import os
    import subprocess
    import sys

    outs = []
    for seed in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=seed)
        outs.append(subprocess.run(
            [sys.executable, "-c", _FP_SET_SNIPPET], capture_output=True,
            text=True, check=True, timeout=120, env=env).stdout.strip())
    assert outs[0] and outs[0] == outs[1]


def test_struct_closed_roundtrips_to_json():
    """suite_to_json_schema must re-emit additionalProperties:false for a
    nested closed object instead of raising (round-5 review finding #2)."""
    from schemasaurus_spark.schema_json import (
        suite_from_json_schema, suite_to_json_schema)

    doc = {"type": "object",
           "properties": {"obj": {"type": "object",
                                  "properties": {"k": {"type": "integer"}},
                                  "additionalProperties": False}}}
    suite = suite_from_json_schema(doc)
    back = suite_to_json_schema(suite)
    assert back["properties"]["obj"]["additionalProperties"] is False


def test_struct_closed_required_names_are_not_exempt(spark):
    """draft-4: additionalProperties exempts ONLY properties /
    patternProperties matches; a `required` name outside `properties` is
    still an additional property (round-5 review finding #4)."""
    from schemasaurus_spark.schema_json import suite_from_json_schema

    doc = {"type": "object", "properties": {"k": {"type": "integer"}},
           "required": ["extra"], "additionalProperties": False}
    from schemasaurus_spark.official_suite import (
        OfficialTest, run_official_tests)

    t = OfficialTest("inline", "required is not an exemption",
                     "required-but-undeclared key is additional",
                     doc, {"k": 1, "extra": 5}, False)
    res = run_official_tests(spark, [t])
    assert not res.failed and not res.skipped and len(res.passed) == 1
