"""Conformance corpus — per-keyword cases translated from the reference's
test suite (/root/reference/test/validator_spec.js; harness at :12-50).

Each case: (constraints-on-one-column, value, expected constraint codes).
A reference case "value X fails with code C" becomes "1-row DataFrame with
column=X yields exactly violation codes {C}" — the partition-level
translation promised in SURVEY.md §5.
"""

import pyspark.sql.functions as F
import pytest

from schemasaurus_spark import dsl
from schemasaurus_spark.validate import validate

S = "string"

# (case_name, column_spark_type, constraints, value, expected_codes)
CASES = [
    # --- type checks (validator_spec.js:53-113) ---
    ("string ok", S, [dsl.TypeIs("string")], "s", set()),
    ("integer ok", "int", [dsl.TypeIs("integer")], 5, set()),
    ("integer from double col whole", "double", [dsl.TypeIs("integer")], 5.0, set()),
    ("integer from double col frac", "double", [dsl.TypeIs("integer")], 5.5, {"integer"}),
    ("number ok", "double", [dsl.TypeIs("number")], 1.5, set()),
    ("boolean ok", "boolean", [dsl.TypeIs("boolean")], True, set()),
    ("union type int-or-string: int passes", "int",
     [dsl.TypeIs(["integer", "string"])], 3, set()),
    # --- required & null (validator_spec.js:114-166) ---
    ("required null fails", S, [dsl.NotNull()], None, {"required"}),
    ("required present ok", S, [dsl.NotNull()], "x", set()),
    ("optional null skips other checks", S, [dsl.MinLength(5)], None, set()),
    ("required failure suppresses others", S,
     [dsl.NotNull(), dsl.MinLength(5)], None, {"required"}),
    # --- strings (validator_spec.js:167-237) ---
    ("minLength fail", S, [dsl.MinLength(3)], "ab", {"minLength"}),
    ("minLength ok", S, [dsl.MinLength(3)], "abc", set()),
    ("maxLength fail", S, [dsl.MaxLength(2)], "abc", {"maxLength"}),
    ("unicode length counts chars", S, [dsl.MaxLength(3)], "日本語", set()),
    ("pattern search semantics", S, [dsl.Pattern("b+c")], "abbbcd", set()),
    ("pattern fail", S, [dsl.Pattern("^x")], "abc", {"pattern"}),
    ("format email ok", S, [dsl.Format("email")], "a@b.co", set()),
    ("format email fail", S, [dsl.Format("email")], "nope", {"format.email"}),
    ("format date-time ok", S, [dsl.Format("date-time")],
     "2024-01-31T10:00:00Z", set()),
    ("format ipv4 fail", S, [dsl.Format("ipv4")], "999.1.1.1", {"format.ipv4"}),
    ("format ipv4 ok", S, [dsl.Format("ipv4")], "192.168.0.1", set()),
    ("format uri ok", S, [dsl.Format("uri")], "https://x.y/z", set()),
    ("format hostname ok", S, [dsl.Format("hostname")], "a-b.example.com", set()),
    # --- numbers (validator_spec.js:290-302) ---
    ("minimum fail", "int", [dsl.Minimum(5)], 4, {"minimum"}),
    ("minimum boundary ok", "int", [dsl.Minimum(5)], 5, set()),
    ("exclusiveMinimum boundary fails", "int",
     [dsl.ExclusiveMinimum(5)], 5, {"minimum.exclusive"}),
    ("maximum fail", "int", [dsl.Maximum(5)], 6, {"maximum"}),
    ("exclusiveMaximum boundary fails", "int",
     [dsl.ExclusiveMaximum(5)], 5, {"maximum.exclusive"}),
    ("multipleOf ok", "int", [dsl.MultipleOf(3)], 9, set()),
    ("multipleOf fail", "int", [dsl.MultipleOf(3)], 10, {"multipleOf"}),
    ("multipleOf fractional", "double", [dsl.MultipleOf(0.5)], 1.5, set()),
    # --- enum (validator_spec.js:181-190) ---
    ("enum ok", S, [dsl.Enum(["a", "b"])], "a", set()),
    ("enum fail", S, [dsl.Enum(["a", "b"])], "c", {"enum"}),
    ("enum int ok", "int", [dsl.Enum([1, 2, 3])], 2, set()),
    # --- arrays (validator_spec.js:217-246) ---
    ("minItems fail", "array<int>", [dsl.MinItems(2)], [1], {"minItems"}),
    ("maxItems fail", "array<int>", [dsl.MaxItems(2)], [1, 2, 3], {"maxItems"}),
    ("uniqueItems ok", "array<int>", [dsl.UniqueItems()], [1, 2, 3], set()),
    ("uniqueItems fail", "array<int>", [dsl.UniqueItems()], [1, 2, 1], {"uniqueItems"}),
    ("items minimum fail", "array<int>",
     [dsl.Items([dsl.Minimum(0)])], [1, -2, 3], {"items.minimum"}),
    ("items enum fail", "array<string>",
     [dsl.Items([dsl.Enum(["x", "y"])])], ["x", "z"], {"items.enum"}),
    # --- combinators (validator_spec.js:127-177) ---
    ("allOf ok", "int", [dsl.AllOf([[dsl.Minimum(1)], [dsl.Maximum(9)]])], 5, set()),
    ("allOf one branch fails", "int",
     [dsl.AllOf([[dsl.Minimum(1)], [dsl.Maximum(3)]])], 5, {"allOf", "maximum"}),
    ("anyOf ok via second branch", "int",
     [dsl.AnyOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])], 5, set()),
    ("anyOf all fail bubbles sub-errors", "int",
     [dsl.AnyOf([[dsl.Minimum(100)], [dsl.MultipleOf(2)]])], 7,
     {"anyOf", "minimum", "multipleOf"}),
    ("oneOf exactly one ok", "int",
     [dsl.OneOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])], 5, set()),
    ("oneOf zero", "int",
     [dsl.OneOf([[dsl.Minimum(100)], [dsl.MultipleOf(2)]])], 7,
     {"oneOf.zero", "minimum", "multipleOf"}),
    ("oneOf many emits oneOf alone", "int",
     [dsl.OneOf([[dsl.Minimum(1)], [dsl.Maximum(10)]])], 5, {"oneOf"}),
    ("not ok when branch fails", "int", [dsl.Not([dsl.Minimum(100)])], 5, set()),
    ("not fails when branch passes", "int",
     [dsl.Not([dsl.Minimum(1)])], 5, {"not"}),
]


@pytest.mark.parametrize("name,coltype,constraints,value,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_keyword_case(spark, name, coltype, constraints, value, expected):
    df = spark.createDataFrame([(value,)], f"v {coltype}")
    suite = dsl.Suite(id_column="v", columns={"v": list(constraints)})
    res = validate(df, suite)
    got = {r["constraint_id"] for r in res.violations().collect()}
    assert got == expected, f"{name}: got {got}, expected {expected}"
    # table verdict mirrors {valid: errors.length === 0} (v4validator.js:326)
    assert res.is_valid() == (not expected)


def test_custom_message_override(spark):
    """[messages] analog (v4validator.js:57-63): per-constraint override."""
    df = spark.createDataFrame([(1,)], "v int")
    suite = dsl.Suite(
        id_column="v",
        columns={"v": [dsl.Minimum(5, message="too small!")]},
    )
    rows = validate(df, suite).violations().collect()
    assert rows[0]["message"] == "too small!"


def test_suite_level_message_catalog_override(spark):
    df = spark.createDataFrame([(1,)], "v int")
    suite = dsl.Suite(
        id_column="v",
        columns={"v": [dsl.Minimum(5)]},
        messages={"minimum": "custom catalog: need >= %d"},
    )
    rows = validate(df, suite).violations().collect()
    assert rows[0]["message"] == "custom catalog: need >= 5"


def test_message_interpolation_matches_reference_catalog(spark):
    """printf-style interpolation of args (messages.js:4-36)."""
    df = spark.createDataFrame([("c",)], "v string")
    suite = dsl.Suite(id_column="v", columns={"v": [dsl.Enum(["a", "b"])]})
    rows = validate(df, suite).violations().collect()
    assert rows[0]["message"] == 'shall be one of values ["a", "b"]'


def test_conform_pandas_udf_vectorized(spark):
    """[conform] escape hatch via Arrow pandas UDF (v4validator.js:305-310)."""
    import pandas as pd

    def is_even(s: pd.Series) -> pd.Series:
        return s % 2 == 0

    df = spark.createDataFrame([(2,), (3,)], "v int")
    suite = dsl.Suite(
        id_column="v",
        columns={"v": [dsl.Conform(name="even", pandas_fn=is_even)]},
    )
    rows = validate(df, suite).violations().collect()
    assert len(rows) == 1 and rows[0]["constraint_id"] == "custom.even"
    assert rows[0]["value"] == "3"


def test_dependency_property_form(spark):
    """dependencies array form ⇒ required list (v4validator.js:104-123)."""
    df = spark.createDataFrame(
        [("x", None), (None, None), ("y", "z")], "a string, b string")
    suite = dsl.Suite(
        id_column="a",
        columns={},
        row=[("a", dsl.Dependency(on="a", requires=["b"]))],
    )
    rows = validate(df, suite).violations().collect()
    got = {(r["a"], r["constraint_id"]) for r in rows}
    assert got == {("x", "dependency"), ("x", "required")}


def test_conform_cross_column_extra_cols(spark):
    """ctx.parent analog (README.md:205-208): a conform check reading
    sibling columns via extra_cols."""
    df = spark.createDataFrame([(10, 5), (3, 5)], "a int, b int")
    suite = dsl.Suite(
        id_column="a",
        columns={"a": [dsl.Conform(
            name="gte_b", expr=lambda a, b: a >= b, extra_cols=["b"])]},
    )
    rows = validate(df, suite).violations().collect()
    assert len(rows) == 1 and rows[0]["a"] == 3
    assert rows[0]["constraint_id"] == "custom.gte_b"
