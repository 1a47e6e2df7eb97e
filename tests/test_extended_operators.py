"""TupleItems/additionalItems, Map properties, KeyPattern, extension
registry, undeclared-column check — the rest of SURVEY.md §2.1."""

import pyspark.sql.functions as F
import pytest

from schemasaurus_spark import dsl
from schemasaurus_spark.validate import validate


def test_tuple_items_positional(spark):
    """processor.js:54-61: element i checked against specs[i]."""
    df = spark.createDataFrame([([1, 50],), ([99, 2],)], "v array<int>")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.TupleItems([[dsl.Maximum(10)], [dsl.Minimum(10)]])]})
    rows = validate(df, suite).violations().collect()
    got = {(str(r["v"]), r["constraint_id"]) for r in rows}
    assert got == {("[99, 2]", "items.0.maximum"), ("[99, 2]", "items.1.minimum")}


def test_additional_items_false(spark):
    """v4validator.js:217 + processor.js:113-124: one error per extra
    element, carrying the element."""
    df = spark.createDataFrame([([1, 2, 7, 8],)], "v array<int>")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.TupleItems([[dsl.Minimum(0)], [dsl.Minimum(0)]], additional=False)]})
    rows = validate(df, suite).violations().collect()
    extras = [(r["constraint_id"], r["value"]) for r in rows]
    assert extras == [("additionalItems", "7"), ("additionalItems", "8")]


def test_map_properties_bounds(spark):
    """v4validator.js:275-285 key-count bounds on MapType."""
    df = spark.createDataFrame([({"a": 1},), ({"a": 1, "b": 2, "c": 3},)],
                               "v map<string,int>")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.MinProperties(2), dsl.MaxProperties(2)]})
    rows = validate(df, suite).violations().collect()
    codes = sorted(r["constraint_id"] for r in rows)
    assert codes == ["maxProperties", "minProperties"]


def test_key_pattern(spark):
    """patternProperties analog: offending keys reported individually."""
    df = spark.createDataFrame([({"ok_1": 1, "bad!": 2, "ok_2": 3},)],
                               "v map<string,int>")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.KeyPattern([r"^ok_\d+$"])]})
    rows = validate(df, suite).violations().collect()
    assert len(rows) == 1
    assert rows[0]["constraint_id"] == "additionalProperties"
    assert rows[0]["value"] == "bad!"


def test_extension_registry(spark):
    """V4Validator.extend analog (validator_extend.js:4-27): plugin
    constraint classes compile to fragments via a registered hook."""
    from dataclasses import dataclass
    from schemasaurus_spark.compiler import _scalar_fragment

    @dataclass(frozen=True)
    class IsUpper(dsl.Constraint):
        @property
        def code(self):
            return "custom.isUpper"

    def compile_is_upper(compiler, out, col_name, col, c, m, null_guard):
        failed = col.isNotNull() & (F.upper(col) != col)
        out.fragments.append(_scalar_fragment(
            failed, "custom.isUpper", col_name, col, None, m or "shall be uppercase"))
        out.valid = ~failed

    dsl.register_constraint(IsUpper, compile_is_upper)
    df = spark.createDataFrame([("HI",), ("lo",)], "v string")
    suite = dsl.Suite(id_column="v", columns={"v": [IsUpper()]})
    rows = validate(df, suite).violations().collect()
    assert len(rows) == 1 and rows[0]["v"] == "lo"
    assert rows[0]["message"] == "shall be uppercase"


def test_undeclared_columns_reported(spark):
    """additionalProperty=false table-level analog (v4validator.js:287)."""
    df = spark.createDataFrame([("a", 1, "x")], "doc_id string, n int, rogue string")
    suite = dsl.Suite(columns={"n": [dsl.Minimum(0)]},
                      allow_undeclared_columns=False)
    res = validate(df, suite)
    assert res.undeclared_columns() == ["rogue"]
    rows = res.violations().where("constraint_id = 'additionalProperties'").collect()
    assert len(rows) == 1 and rows[0]["column"] == "rogue"


def test_items_no_extraction_mode_is_codegen(spark):
    """extract_offenders=False: one violation per array, plan stays in
    WholeStageCodegen (no lambda expressions)."""
    df = spark.createDataFrame([([1, -2, -3],), ([1, 2],)], "v array<int>")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.Items([dsl.Minimum(0)], extract_offenders=False),
        dsl.UniqueItems(extract_occurrences=False),
    ]})
    res = validate(df, suite)
    rows = res.violations().collect()
    assert len(rows) == 1 and rows[0]["constraint_id"] == "items.minimum"
    assert rows[0]["value"] == "[1, -2, -3]"
    p = res.validated._jdf.queryExecution().executedPlan().toString()
    assert "WholeStageCodegen" in p or "*(1)" in p


def test_tuple_items_array_shorter_than_specs(spark):
    """Array shorter than the spec list: missing positions silently skip
    (schema-only semantics, processor.js:43-47) without ANSI index errors."""
    df = spark.createDataFrame([([5],)], "v array<int>")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.TupleItems([[dsl.Maximum(3)], [dsl.Minimum(0)], [dsl.Minimum(0)]])]})
    rows = validate(df, suite).violations().collect()
    assert [(r["constraint_id"], r["value"]) for r in rows] == [("items.0.maximum", "5")]


def test_column_conform_skips_null(spark):
    """Column-level conform must skip absent (null) values like other
    non-required checks."""
    df = spark.createDataFrame([(None,), (3,)], "v int")
    suite = dsl.Suite(id_column="v", columns={"v": [
        dsl.Conform(name="even", expr=lambda c: c % 2 == 0)]})
    rows = validate(df, suite).violations().collect()
    assert len(rows) == 1 and rows[0]["value"] == "3"


def test_nested_struct_field_constraints(spark):
    """Nested-object descent parity (processor.js:66-88): dotted paths in
    the suite reach struct fields; violation `column` carries the path —
    the analog of the reference error path chain."""
    df = spark.createDataFrame(
        [(1, {"width": 640, "codec": "h264"}),
         (2, {"width": -5, "codec": "weird"})],
        "id long, media struct<width:int, codec:string>")
    suite = dsl.Suite(id_column="id", columns={
        "media.width": [dsl.Minimum(0)],
        "media.codec": [dsl.Enum(["h264", "vp9"])],
    })
    rows = validate(df, suite).violations().orderBy("pos").collect()
    got = {(r["id"], r["constraint_id"], r["column"]) for r in rows}
    assert got == {(2, "minimum", "media.width"), (2, "enum", "media.codec")}


def test_nested_missing_path_raises(spark):
    from schemasaurus_spark.compiler import SuiteCompileError
    df = spark.createDataFrame([(1, {"w": 1})], "id long, m struct<w:int>")
    with pytest.raises(SuiteCompileError, match="m.nope"):
        validate(df, dsl.Suite(columns={"m.nope": [dsl.NotNull()]}))

def test_ref_named_reuse_compiles_like_inline(spark):
    """Ref('name') inline-expands from suite.definitions — identical
    violations to writing the constraints directly (references.js:11-27)."""
    df = spark.createDataFrame([(1,), (50,), (200,)], "v int")
    bounds = [dsl.Minimum(10), dsl.Maximum(100)]
    ref_suite = dsl.Suite(id_column="v", columns={"v": [dsl.Ref("bounds")]},
                          definitions={"bounds": bounds})
    inline_suite = dsl.Suite(id_column="v", columns={"v": bounds})
    got_ref = sorted((r["v"], r["constraint_id"])
                     for r in validate(df, ref_suite).violations().collect())
    got_inline = sorted((r["v"], r["constraint_id"])
                        for r in validate(df, inline_suite).violations().collect())
    assert got_ref == got_inline == [(1, "minimum"), (200, "maximum")]


def test_unknown_and_cyclic_ref_raise(spark):
    from schemasaurus_spark.compiler import SuiteCompileError, compile_suite

    with pytest.raises(SuiteCompileError, match="no entry"):
        compile_suite(dsl.Suite(columns={"v": [dsl.Ref("nope")]}))
    cyc = dsl.Suite(columns={"v": [dsl.Ref("a")]},
                    definitions={"a": [dsl.Ref("b")], "b": [dsl.Ref("a")]})
    with pytest.raises(SuiteCompileError, match="cyclic Ref"):
        compile_suite(cyc)


def test_cyclic_combinator_raises(spark):
    """A branch list that reaches its own combinator must fail compile with
    a clear error, not recurse forever ($$visited analog, compiler.js:136-141)."""
    from schemasaurus_spark.compiler import SuiteCompileError, compile_suite

    branch = [dsl.Minimum(1)]
    allof = dsl.AllOf([branch])
    branch.append(allof)  # cycle: allof -> branch -> allof
    with pytest.raises(SuiteCompileError, match="cyclic constraint"):
        compile_suite(dsl.Suite(columns={"v": [allof]}))


def test_items_empty_array_passes_specialized_paths(spark):
    """Regression (round-1 ADVICE): empty arrays must PASS Items min/max in
    BOTH extraction modes (array_min/max are NULL on [])."""
    df = spark.createDataFrame([([],), ([5],), ([0, 9],)], "v array<int>")
    for extract in (True, False):
        suite = dsl.Suite(id_column="v", columns={"v": [
            dsl.Items([dsl.Minimum(2), dsl.Maximum(8)],
                      extract_offenders=extract)]})
        rows = validate(df, suite).violations().collect()
        assert all(r["v"] != [] for r in rows), f"extract={extract}"
        codes = sorted(r["constraint_id"] for r in rows if r["v"] == [0, 9])
        assert codes == ["items.maximum", "items.minimum"], f"extract={extract}"


def test_items_struct_fields_descent(spark):
    """array<struct> element validation (processor.js:31-64 items descent
    into object sub-schemas): per-field constraints, one violation per
    offending element, code items.<field>.<subcode>, value = field value;
    NotNull = field required per element; null/empty arrays pass."""
    df = spark.createDataFrame(
        [(1, [{"start": 0, "end": 5, "label": "ok"},
              {"start": -2, "end": 99, "label": "bad"}]),
         (2, [{"start": 3, "end": None, "label": "ok"}]),
         (3, None),
         (4, [])],
        "id long, spans array<struct<start:int, end:int, label:string>>")
    suite = dsl.Suite(id_column="id", columns={"spans": [dsl.Items(fields={
        "start": [dsl.Minimum(0)],
        "end": [dsl.NotNull(), dsl.Maximum(50)],
        "label": [dsl.Enum(["ok", "good"])],
    })]})
    res = validate(df, suite)
    rows = sorted((r["id"], r["constraint_id"], r["value"])
                  for r in res.violations().collect())
    assert rows == [
        (1, "items.end.maximum", "99"),
        (1, "items.label.enum", "bad"),
        (1, "items.start.minimum", "-2"),
        (2, "items.end.required", None),
    ]
    verdicts = {r["partition_id"]: r["pass"]
                for r in res.verdicts().collect()}
    assert not all(verdicts.values())


def test_items_struct_fields_fingerprint_stable(spark):
    mk = lambda: dsl.Suite(id_column="id", columns={"s": [dsl.Items(fields={
        "a": [dsl.Minimum(1)], "b": [dsl.NotNull()]})]})
    assert mk().fingerprint() == mk().fingerprint()


def test_items_scalar_and_fields_combined(spark):
    """Scalar element constraints and field descent coexist on one Items."""
    df = spark.createDataFrame(
        [(1, [{"v": 5}, {"v": 200}])],
        "id long, xs array<struct<v:int>>")
    suite = dsl.Suite(id_column="id", columns={"xs": [
        dsl.MinItems(1), dsl.Items(fields={"v": [dsl.Maximum(100)]})]})
    rows = [(r["constraint_id"], r["value"])
            for r in validate(df, suite).violations().collect()]
    assert rows == [("items.v.maximum", "200")]


def test_tuple_additional_schema_form(spark):
    """Draft-4 SCHEMA form of additionalItems (round 5b): extras beyond
    the positional specs each satisfy the sub-schema, null-strict like
    spec'd positions; no extras -> never fires."""
    df = spark.createDataFrame(
        [(1, [1, 20, 30]), (2, [1, 5]), (3, [2]), (4, None), (5, [1, None])],
        "id long, xs array<long>")
    suite = dsl.Suite(id_column="id", columns={"xs": [
        dsl.TupleItems([[dsl.TypeIs("integer")]],
                       additional=[dsl.Minimum(10)])]})
    got = sorted((r["id"], r["constraint_id"], r["value"])
                 for r in validate(df, suite).violations().collect())
    assert got == [(2, "additionalItems.minimum", "5"),
                   (5, "additionalItems.minimum", None)]


def test_tuple_additional_schema_form_nested(spark):
    """The same schema form applies on NESTED tuple schemas (element
    predicate: forall over the extras slice)."""
    df = spark.createDataFrame(
        [(1, [[1, 20], [2, 30]]), (2, [[1, 20], [2, 3]])],
        "id long, m array<array<long>>")
    suite = dsl.Suite(id_column="id", columns={"m": [dsl.Items([
        dsl.TupleItems([[dsl.TypeIs("integer")]],
                       additional=[dsl.Minimum(10)])])]})
    bad = {r["id"] for r in validate(df, suite).violations().collect()}
    assert bad == {2}


def test_tuple_additional_schema_json_roundtrip(spark):
    """additionalItems: {schema} translates from draft-4 JSON and keeps a
    JSON form for the keyword fingerprint reverse-translation."""
    from schemasaurus_spark.schema_json import suite_from_json_schema
    schema = {"type": "object", "properties": {
        "arr": {"type": "array",
                "items": [{"type": "integer"}],
                "additionalItems": {"minimum": 10}}}}
    s = suite_from_json_schema(schema, id_column="rid")
    df = spark.createDataFrame(
        [(1, [1, 20]), (2, [1, 5])], "rid long, arr array<long>")
    got = {(r["rid"], r["constraint_id"])
           for r in validate(df, s).violations().collect()}
    assert got == {(2, "additionalItems.minimum")}
