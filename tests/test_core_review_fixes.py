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
