"""Normalizer parity tests — translations of
/root/reference/test/normalizer_spec.js cases to DataFrame assertions."""

import pytest

from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize


def test_defaults_applied_for_null(spark):
    """normalizer_spec.js: default replaces null/undefined (js:12-16)."""
    df = spark.createDataFrame([(None,), ("x",)], "a string")
    spec = NormalizerSpec([col_spec("a", "string", default="dflt")])
    out = [r["a"] for r in normalize(df, spec).collect()]
    assert sorted(out) == ["dflt", "x"]


def test_missing_column_materialized_with_default(spark):
    """normalizer_spec.js:46-57: {} → {a:{b:3}} — a fully missing declared
    field materializes so its default applies."""
    df = spark.createDataFrame([(1,)], "other int")
    spec = NormalizerSpec([col_spec("b", "integer", default=3)],
                          prune_additional=True)
    rows = normalize(df, spec).collect()
    assert rows[0]["b"] == 3
    assert rows[0].asDict().keys() == {"b"}


def test_prune_additional_columns(spark):
    """normalizer.js:22-24: undeclared property deleted."""
    df = spark.createDataFrame([("a", "b")], "keep string, drop string")
    spec = NormalizerSpec([col_spec("keep", "string")])
    out = normalize(df, spec)
    assert out.columns == ["keep"]


def test_type_casts_string_sources(spark):
    """normalizer.js:25-56 casts: parseInt prefix semantics, parseFloat,
    boolean truth table ('true'/'on'/'false'/'off', else truthiness)."""
    df = spark.createDataFrame(
        [("42abc", "3.5", "true"), ("7", "x", "off"), ("nope", "2", "weird")],
        "i string, n string, b string",
    )
    spec = NormalizerSpec([
        col_spec("i", "integer"), col_spec("n", "number"), col_spec("b", "boolean"),
    ])
    rows = normalize(df, spec).collect()
    assert [r["i"] for r in rows] == [42, 7, None]
    ns = [r["n"] for r in rows]
    assert ns[0] == 3.5 and ns[1] is None and ns[2] == 2.0
    assert [r["b"] for r in rows] == [True, False, True]


def test_float_to_integer_truncates(spark):
    """parseInt(3.9) semantics: truncate toward zero."""
    df = spark.createDataFrame([(3.9,), (-2.7,)], "x double")
    spec = NormalizerSpec([col_spec("x", "integer")])
    assert [r["x"] for r in normalize(df, spec).collect()] == [3, -2]


def test_array_wrap(spark):
    """normalizer.js:51-55: non-array wrapped as [x]."""
    df = spark.createDataFrame([(5,)], "x int")
    spec = NormalizerSpec([col_spec("x", "array<long>")])
    assert normalize(df, spec).collect()[0]["x"] == [5]


def test_null_passthrough_without_default(spark):
    """normalizer_spec: null stays null when no default declared."""
    df = spark.createDataFrame([(None,)], "x string")
    spec = NormalizerSpec([col_spec("x", "integer")])
    assert normalize(df, spec).collect()[0]["x"] is None


def test_numeric_boolean_truthiness(spark):
    """JS Boolean(0) == false, Boolean(2) == true (normalizer.js:43-50)."""
    df = spark.createDataFrame([(0,), (2,)], "x int")
    spec = NormalizerSpec([col_spec("x", "boolean")])
    assert [r["x"] for r in normalize(df, spec).collect()] == [False, True]


def test_normalize_is_single_projection(spark):
    df = spark.createDataFrame([("1", "y")], "a string, b string")
    spec = NormalizerSpec([col_spec("a", "integer"), col_spec("b", "string")])
    plan = normalize(df, spec)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1

def test_nested_struct_defaults_materialize(spark):
    """normalizer_spec.js:46-57: {} -> {a: {b: 3}} — defaults inside nested
    structs materialize the struct, and existing nested values survive."""
    df = spark.createDataFrame([("x",)], "other string")  # no 'a' at all
    spec = NormalizerSpec([col_spec("a.b", "integer", default=3)])
    row = normalize(df, spec).collect()[0]
    assert row["a"]["b"] == 3

    df2 = spark.createDataFrame([((7, "keep"),), ((None, "keep2"),)],
                                "a struct<b int, c string>")
    spec2 = NormalizerSpec([col_spec("a.b", "integer", default=3)],
                           prune_additional=False)
    rows = normalize(df2, spec2).select("a.b", "a.c").collect()
    assert [(r["b"], r["c"]) for r in rows] == [(7, "keep"), (3, "keep2")]


def test_parse_float_prefix_semantics(spark):
    """type:number is parseFloat ('12.5 kg' → 12.5), not try_cast→null
    (review fix; normalizer.js:39-42)."""
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize

    df = spark.createDataFrame([("12.5 kg",), ("-3e2x",), ("abc",), (None,)],
                               "v string")
    out = [r["v"] for r in normalize(
        df, NormalizerSpec([col_spec("v", "number")])).collect()]
    assert out == [12.5, -300.0, None, None]


def test_nan_infinity_normalize_to_null_not_fabricated(spark):
    """NaN/±Inf must not fabricate 0 / Long.MIN/MAX under type:integer, and
    Boolean(NaN) is false (review fix)."""
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (2.9,)], "v double")
    ints = [r["v"] for r in normalize(
        df, NormalizerSpec([col_spec("v", "integer")])).collect()]
    assert ints == [None, None, 2]
    bools = [r["v"] for r in normalize(
        df, NormalizerSpec([col_spec("v", "boolean")])).collect()]
    assert bools == [False, True, True]


def test_spec_tree_rejects_parent_leaf_after_children(spark):
    import pytest
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize

    df = spark.createDataFrame([((3,),)], "a struct<b: int>")
    spec = NormalizerSpec([col_spec("a.b", "integer"), col_spec("a")])
    with pytest.raises(ValueError, match="conflicts"):
        normalize(df, spec)


def test_integer_cast_overflow_is_null(spark):
    """Finite doubles beyond long range must NULL, not saturate to
    Long.MAX_VALUE (round-4 review: the NaN/Inf guard promised exactly
    this and didn't deliver it for finite overflow)."""
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize

    df = spark.createDataFrame(
        [(1e30,), (-1e30,), (3.9,), (float("nan"),)], "v double")
    out = normalize(df, NormalizerSpec(columns=[col_spec("v", "integer")]))
    vals = [r["v"] for r in out.collect()]
    assert vals[0] is None and vals[1] is None
    assert vals[2] == 3 and vals[3] is None


# --- round-5: element-wise casts inside arrays and map values -------------


def test_array_element_cast_parses_strings(spark):
    """normalizer.js:25-56 + processor.js:31-64: [type] fires on every
    array ELEMENT — ["1","2"] with array<integer> becomes [1,2]; a
    non-numeric element nulls (parseInt semantics); an existing array no
    longer passes through unchanged."""
    from schemasaurus_spark.normalizer import (
        NormalizerSpec, col_spec, normalize)

    df = spark.createDataFrame(
        [(1, ["1", "2"]), (2, ["x7", "08", None])],
        "id long, xs array<string>")
    out = normalize(df, NormalizerSpec(
        [col_spec("id", "integer"), col_spec("xs", "array<integer>")]))
    rows = {r["id"]: r["xs"] for r in out.collect()}
    assert rows[1] == [1, 2]
    assert rows[2] == [None, 8, None]
    assert dict(out.dtypes)["xs"] == "array<bigint>"


def test_array_element_cast_number_and_boolean(spark):
    from schemasaurus_spark.normalizer import (
        NormalizerSpec, col_spec, normalize)

    df = spark.createDataFrame(
        [(1, ["12.5 kg", "x"], ["on", "off", ""])],
        "id long, ns array<string>, bs array<string>")
    out = normalize(df, NormalizerSpec(
        [col_spec("ns", "array<number>"), col_spec("bs", "array<boolean>")]))
    r = out.first()
    assert r["ns"] == [12.5, None]
    assert r["bs"] == [True, False, False]


def test_map_value_cast_and_default(spark):
    """map<elem> casts every VALUE via transform_values; a dict default
    fires before the cast (default → cast order, compiler.js:76)."""
    from schemasaurus_spark.normalizer import (
        NormalizerSpec, col_spec, normalize)

    df = spark.createDataFrame(
        [(1, {"a": "3", "b": "12.9kg"}), (2, None)],
        "id long, attrs map<string,string>")
    out = normalize(df, NormalizerSpec(
        [col_spec("id", "integer"),
         col_spec("attrs", "map<integer>", default={"a": "0"})]))
    rows = {r["id"]: r["attrs"] for r in out.collect()}
    assert rows[1] == {"a": 3, "b": 12}
    assert rows[2] == {"a": 0}
    assert dict(out.dtypes)["attrs"] == "map<string,bigint>"
