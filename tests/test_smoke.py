"""End-to-end slice: DSL → compile → execute → verdicts (SURVEY.md §7 Step 2)."""

import pyspark.sql.functions as F

from schemasaurus_spark import (
    Enum, Maximum, Minimum, NotNull, Pattern, Suite, Conform, validate,
)
from schemasaurus_spark import datagen


def seq_suite():
    return Suite(
        id_column="doc_id",
        columns={
            "doc_id": [NotNull(), Pattern(r"^[a-z]+-[0-9]{8}$")],
            "n_tok": [NotNull(), Minimum(1), Maximum(2048)],
            "source": [Enum(datagen.SOURCES)],
        },
        row=[
            (
                "tokens",
                Conform(
                    name="size_eq_n_tok",
                    expr=lambda col: F.size("tokens") == F.col("n_tok"),
                ),
            )
        ],
        name="seq_v1",
    )


def test_clean_table_passes(spark):
    df = datagen.finalize(datagen.gen_sequences(spark, 200, 4))
    res = validate(df, seq_suite())
    assert res.violations().count() == 0
    verd = res.verdicts().collect()
    assert len(verd) == 4
    assert all(r["pass"] for r in verd)
    assert sum(r["n_rows"] for r in verd) == 200


def test_token_array_equality_invariant(spark):
    """Per-row invariant (BASELINE.json input_hint): validation must not
    mutate tokens — analog of the validator's noreplace mode
    (/root/reference/src/iterator.js:18)."""
    df = datagen.gen_sequences(spark, 100, 4)
    res = validate(datagen.finalize(df), seq_suite())
    back = res.validated.drop("__violations")
    diff = back.exceptAll(datagen.finalize(df))
    assert diff.count() == 0


def test_corrupted_rows_fail_with_expected_codes(spark):
    df = datagen.gen_sequences(spark, 200, 4)
    df = datagen.corrupt_pattern(df, every=10)
    df = datagen.corrupt_range(df, every=10)
    df = datagen.corrupt_enum(df, every=10)
    res = validate(datagen.finalize(df), seq_suite())
    v = res.violations()
    codes = {r["constraint_id"] for r in v.select("constraint_id").distinct().collect()}
    assert "pattern" in codes
    assert "minimum" in codes or "maximum" in codes
    assert "enum" in codes
    # a failing partition's verdict flips
    verd = res.verdicts().collect()
    assert any(not r["pass"] for r in verd)


def test_violation_shape_matches_reference_error_record(spark):
    """Field-for-field analog of {code, message, value, arg, path}
    (/root/reference/src/v4validator.js:45-51)."""
    df = datagen.corrupt_enum(datagen.gen_sequences(spark, 50, 2), every=5)
    res = validate(datagen.finalize(df), seq_suite())
    rows = res.violations().where(F.col("constraint_id") == "enum").collect()
    assert rows, "expected enum violations"
    r = rows[0]
    assert r["column"] == "source"
    assert r["value"] == "sp4m"
    assert "web" in r["arg"]
    assert r["message"].startswith("shall be one of values")


def test_required_short_circuits_other_checks(spark):
    """Null doc_id must yield ONLY `required`, not `pattern` — ctx.stop()
    parity (v4validator.js:80)."""
    df = datagen.corrupt_null_docid(datagen.gen_sequences(spark, 50, 2), every=5)
    res = validate(datagen.finalize(df), seq_suite())
    v = res.violations().where(F.col("column") == "doc_id")
    codes = {r["constraint_id"] for r in v.collect()}
    assert codes == {"required"}


def test_make_value_validator_reference_shape(spark):
    """newValidator(schema) per-value parity: fn(value) -> {valid, errors}
    with the reference error record shape (v4validator.js:40-52, 326-331)."""
    from schemasaurus_spark import Minimum, NotNull, Suite, make_value_validator

    fn = make_value_validator(
        spark,
        Suite(id_column="v", columns={"v": [NotNull(), Minimum(5)]}),
        "v int")
    assert fn({"v": 7}) == {"valid": True, "errors": []}
    bad = fn({"v": 2})
    assert not bad["valid"]
    assert bad["errors"] == [{"code": "minimum", "message": "shall be >= 5",
                              "value": "2", "arg": "5", "path": ["v"]}]
    nul = fn({})
    assert [e["code"] for e in nul["errors"]] == ["required"]


def test_compile_checks_referenced_columns(spark):
    """Typos in Dependency/Conform/id_column surface as SuiteCompileError
    at compile, not AnalysisException at first action (review fix)."""
    import pytest
    from schemasaurus_spark import dsl
    from schemasaurus_spark.compiler import SuiteCompileError

    df = spark.createDataFrame([("x", "y")], "a string, b string")
    with pytest.raises(SuiteCompileError, match="sorce"):
        validate(df, dsl.Suite(id_column="a", columns={}, row=[
            ("a", dsl.Dependency(on="sorce", requires=["b"]))]))
    with pytest.raises(SuiteCompileError, match="nope"):
        validate(df, dsl.Suite(id_column="a", columns={
            "a": [dsl.Conform(name="x", expr=lambda a, n: a == n,
                              extra_cols=["nope"])]}))


def test_undeclared_scan_allows_dotted_parents_and_refs(spark):
    """Parent structs of dotted paths and Conform/Dependency-referenced
    columns are DECLARED surface (review fix: false additionalProperties
    on valid data), and is_valid()/verdicts() agree with violations()."""
    from schemasaurus_spark import dsl

    df = spark.createDataFrame([((1,), "x", "y", "z")],
                               "meta struct<n: int>, a string, b string, "
                               "extra string")
    suite = dsl.Suite(
        id_column="a",
        columns={"meta.n": [dsl.Minimum(0)],
                 "a": [dsl.Conform(name="eq", expr=lambda a, b: a != b,
                                   extra_cols=["b"])]},
        allow_undeclared_columns=False)
    res = validate(df, suite)
    assert res.undeclared_columns() == ["extra"]
    assert not res.is_valid()                      # violations() reports it
    v = res.verdicts().collect()
    pseudo = [r for r in v if r["partition_id"] == -2]
    assert pseudo and pseudo[0]["n_violations"] == 1 and not pseudo[0]["pass"]
