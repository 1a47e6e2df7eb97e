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

# Round-2 widening toward the official draft-4 corpus
# (test/official_suite_spec.js loads the whole JSON-Schema-Test-Suite; the
# submodule isn't vendored here, so these encode the same public keyword
# semantics case-by-case — boundaries, unicode, empty containers, nesting).
CASES += [
    # --- type: permissive string-staged probes (runtime=True) ---
    ("rt integer from int-string", S, [dsl.TypeIs("integer", runtime=True)], "42", set()),
    ("rt integer from frac-string", S, [dsl.TypeIs("integer", runtime=True)], "4.5", {"integer"}),
    ("rt integer from garbage", S, [dsl.TypeIs("integer", runtime=True)], "abc", {"integer"}),
    ("rt number from float-string", S, [dsl.TypeIs("number", runtime=True)], "4.5", set()),
    ("rt number from garbage", S, [dsl.TypeIs("number", runtime=True)], "4x", {"number"}),
    ("rt boolean from 'True'", S, [dsl.TypeIs("boolean", runtime=True)], "True", set()),
    ("rt boolean from 'yes'", S, [dsl.TypeIs("boolean", runtime=True)], "yes", {"boolean"}),
    ("union null-or-string: null passes", S, [dsl.TypeIs(["null", "string"])], None, set()),
    ("type null alone: value fails", S, [dsl.TypeIs("null")], "x", {"null"}),
    ("union splice emits all tried types", S,
     [dsl.TypeIs(["integer", "boolean"], runtime=True)], "nope",
     {"integer", "boolean"}),
    ("number accepts long col", "long", [dsl.TypeIs("number")], 7, set()),
    ("array type static ok", "array<int>", [dsl.TypeIs("array")], [1], set()),
    # --- strings: boundaries + unicode + formats ---
    ("minLength 0 accepts empty", S, [dsl.MinLength(0)], "", set()),
    ("minLength boundary eq ok", S, [dsl.MinLength(2)], "ab", set()),
    ("maxLength boundary eq ok", S, [dsl.MaxLength(2)], "ab", set()),
    ("unicode minLength counts chars", S, [dsl.MinLength(3)], "日本語", set()),
    ("unicode maxLength fail", S, [dsl.MaxLength(2)], "日本語", {"maxLength"}),
    ("pattern digit search ok", S, [dsl.Pattern(r"\d")], "a1b", set()),
    ("pattern digit search fail", S, [dsl.Pattern(r"\d")], "abc", {"pattern"}),
    ("pattern anchored both ends", S, [dsl.Pattern(r"^a+$")], "aab", {"pattern"}),
    ("format date-time no tz fails", S, [dsl.Format("date-time")],
     "2024-01-31T10:00:00", {"format.date-time"}),
    ("format date-time offset ok", S, [dsl.Format("date-time")],
     "2024-01-31 10:00:00+02:00", set()),
    ("format ipv6 ok", S, [dsl.Format("ipv6")], "2001:db8::1", set()),
    ("format ipv6 fail", S, [dsl.Format("ipv6")], "2001:db8:::1", {"format.ipv6"}),
    ("format hostname fail on underscore", S, [dsl.Format("hostname")],
     "bad_host.example.com", {"format.hostname"}),
    ("format uri fail no scheme", S, [dsl.Format("uri")], "//x.y/z", {"format.uri"}),
    ("format email multiple @ fails", S, [dsl.Format("email")], "a@b@c", {"format.email"}),
    ("format ipv4 octet 256 fails", S, [dsl.Format("ipv4")], "1.2.3.256", {"format.ipv4"}),
    # --- numbers: negatives, fractions, boundaries ---
    ("minimum negative bound ok", "int", [dsl.Minimum(-5)], -5, set()),
    ("minimum negative bound fail", "int", [dsl.Minimum(-5)], -6, {"minimum"}),
    ("maximum boundary eq ok", "int", [dsl.Maximum(5)], 5, set()),
    ("exclusiveMinimum above ok", "int", [dsl.ExclusiveMinimum(5)], 6, set()),
    ("exclusiveMaximum below ok", "int", [dsl.ExclusiveMaximum(5)], 4, set()),
    # IEEE754 parity with the JS reference: 19.99/0.01 = 1998.999... % 1 != 0
    # → fails in BOTH engines (the official suite's rational reading differs;
    # we match the reference's float arithmetic, v4validator.js:290-292)
    ("multipleOf float-exact ok", "double", [dsl.MultipleOf(0.25)], 19.25, set()),
    ("multipleOf float-inexact fails like JS", "double",
     [dsl.MultipleOf(0.01)], 19.99, {"multipleOf"}),
    ("multipleOf negative value ok", "int", [dsl.MultipleOf(3)], -9, set()),
    ("multipleOf fractional fail", "double", [dsl.MultipleOf(0.5)], 1.3, {"multipleOf"}),
    ("minimum on double col fail", "double", [dsl.Minimum(1.5)], 1.25, {"minimum"}),
    # --- enum ---
    ("enum single value ok", S, [dsl.Enum(["only"])], "only", set()),
    ("enum single value fail", S, [dsl.Enum(["only"])], "other", {"enum"}),
    ("enum int fail", "int", [dsl.Enum([1, 2, 3])], 9, {"enum"}),
    # --- arrays: empties, boundaries, element sub-codes ---
    ("minItems 0 accepts empty", "array<int>", [dsl.MinItems(0)], [], set()),
    ("minItems boundary eq ok", "array<int>", [dsl.MinItems(2)], [1, 2], set()),
    ("maxItems boundary eq ok", "array<int>", [dsl.MaxItems(2)], [1, 2], set()),
    ("uniqueItems empty ok", "array<int>", [dsl.UniqueItems()], [], set()),
    ("uniqueItems single ok", "array<int>", [dsl.UniqueItems()], [7], set()),
    ("uniqueItems strings fail", "array<string>",
     [dsl.UniqueItems()], ["a", "b", "a"], {"uniqueItems"}),
    ("items empty array passes min/max", "array<int>",
     [dsl.Items([dsl.Minimum(2), dsl.Maximum(8)])], [], set()),
    ("items pattern elements fail", "array<string>",
     [dsl.Items([dsl.Pattern(r"^[a-z]+$")])], ["ok", "NO"], {"items.pattern"}),
    ("items multipleOf fail", "array<int>",
     [dsl.Items([dsl.MultipleOf(2)])], [2, 3], {"items.multipleOf"}),
    ("items exclusive bounds", "array<int>",
     [dsl.Items([dsl.ExclusiveMinimum(0)])], [1, 0], {"items.minimum.exclusive"}),
    ("tuple shorter than specs passes", "array<int>",
     [dsl.TupleItems([[dsl.Minimum(0)], [dsl.Minimum(0)]], additional=False)],
     [5], set()),
    ("tuple exact length ok with additional=false", "array<int>",
     [dsl.TupleItems([[dsl.Minimum(0)], [dsl.Minimum(0)]], additional=False)],
     [1, 2], set()),
    ("tuple extra allowed when additional=true", "array<int>",
     [dsl.TupleItems([[dsl.Minimum(0)]], additional=True)], [1, 2, 3], set()),
    # --- maps ---
    ("minProperties boundary ok", "map<string,string>",
     [dsl.MinProperties(1)], {"a": "x"}, set()),
    ("maxProperties fail", "map<string,string>",
     [dsl.MaxProperties(1)], {"a": "x", "b": "y"}, {"maxProperties"}),
    ("keyPattern multiple patterns ok", "map<string,string>",
     [dsl.KeyPattern([r"^a", r"^b"])], {"aa": "x", "bb": "y"}, set()),
    ("keyPattern fail carries key", "map<string,string>",
     [dsl.KeyPattern([r"^a"])], {"zz": "x"}, {"additionalProperties"}),
    # --- combinators: nesting + multi-branch splices ---
    ("allOf both branches fail", "int",
     [dsl.AllOf([[dsl.Minimum(10)], [dsl.MultipleOf(2)]])], 7,
     {"allOf", "minimum", "multipleOf"}),
    ("allOf nested anyOf bubbles", "int",
     [dsl.AllOf([[dsl.AnyOf([[dsl.Minimum(100)], [dsl.Maximum(0)]])]])], 5,
     {"allOf", "anyOf", "minimum", "maximum"}),
    ("oneOf three branches two pass", "int",
     [dsl.OneOf([[dsl.Minimum(1)], [dsl.Maximum(10)], [dsl.Minimum(100)]])],
     5, {"oneOf"}),
    ("oneOf nested not", "int",
     [dsl.OneOf([[dsl.Not([dsl.Minimum(0)])], [dsl.Minimum(100)]])], 5,
     {"oneOf.zero", "not", "minimum"}),
    ("not of enum passes on non-member", S,
     [dsl.Not([dsl.Enum(["bad"])])], "good", set()),
    ("not of enum fails on member", S,
     [dsl.Not([dsl.Enum(["bad"])])], "bad", {"not"}),
    ("anyOf nested allOf ok", "int",
     [dsl.AnyOf([[dsl.AllOf([[dsl.Minimum(0)], [dsl.Maximum(10)]])]])], 5, set()),
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


def test_nested_oneof_error_bubbling_struct_path(spark):
    """validator_spec.js:292-304 'for nested schemas': a oneOf on a nested
    property fails with BOTH the parent combinator error (path a) and the
    sub-schema error (path a.b). Columnar analog: dotted-path column."""
    df = spark.createDataFrame([((5,),), (("ok",),)],
                               "a struct<b: string>") if False else \
         spark.createDataFrame([(("5x",),), (("ok",),)], "a struct<b: string>")
    suite = dsl.Suite(
        id_column="a",
        columns={"a.b": [dsl.OneOf([[dsl.Pattern(r"^[a-z]+$")]])]},
    )
    rows = validate(df, suite).violations().collect()
    got = {(r["constraint_id"], r["column"]) for r in rows}
    assert got == {("oneOf.zero", "a.b"), ("pattern", "a.b")}


def test_dependency_schema_form_trigger_absent(spark):
    """dependencies fire ONLY when the trigger property is present
    (v4validator.js:104-109): null trigger = no check at all."""
    df = spark.createDataFrame([(None, "bad")], "a string, b string")
    suite = dsl.Suite(
        id_column="b", columns={},
        row=[("a", dsl.Dependency(on="a",
                                  constraints=[("b", dsl.Enum(["ok"]))]))],
    )
    assert validate(df, suite).violations().count() == 0


def test_dependency_multiple_requires(spark):
    """array-form dependency with several required props: one `required`
    sub-error per missing prop + one dependency head."""
    df = spark.createDataFrame([("x", None, None)],
                               "a string, b string, c string")
    suite = dsl.Suite(
        id_column="a", columns={},
        row=[("a", dsl.Dependency(on="a", requires=["b", "c"]))],
    )
    rows = validate(df, suite).violations().collect()
    got = sorted((r["constraint_id"], r["column"]) for r in rows)
    assert got == [("dependency", "a"), ("required", "b"), ("required", "c")]


def test_dependency_schema_form_sub_error_codes(spark):
    """schema-form dependency failure = dependency head + the sub-schema's
    own error codes (v4validator.js:110-123)."""
    df = spark.createDataFrame([("x", "bad"), ("x", "ok")],
                               "a string, b string")
    suite = dsl.Suite(
        id_column="b", columns={},
        row=[("a", dsl.Dependency(on="a",
                                  constraints=[("b", dsl.Enum(["ok"]))]))],
    )
    rows = validate(df, suite).violations().collect()
    got = sorted((r["b"], r["constraint_id"]) for r in rows)
    assert got == [("bad", "dependency"), ("bad", "enum")]


def test_ref_inside_combinator_branch(spark):
    """Ref resolution nests through combinator branches (references.js used
    from any schema position)."""
    df = spark.createDataFrame([(5,), (50,)], "v int")
    suite = dsl.Suite(
        id_column="v",
        columns={"v": [dsl.AnyOf([[dsl.Ref("small")], [dsl.Minimum(100)]])]},
        definitions={"small": [dsl.Maximum(10)]},
    )
    rows = validate(df, suite).violations().collect()
    got = {(r["v"], r["constraint_id"]) for r in rows}
    assert got == {(50, "anyOf"), (50, "maximum"), (50, "minimum")}


@pytest.mark.parametrize("mode,value,limit,expect_fail", [
    # 𝄞 (U+1D11E, astral): 1 codepoint, 2 UTF-16 units, 1 grapheme
    ("codepoints", "𝄞𝄞", 3, True),
    ("utf16", "𝄞𝄞", 3, False),          # JS "𝄞𝄞".length == 4 >= 3
    ("graphemes", "𝄞𝄞", 3, True),
    # e + combining acute (2 codepoints, 1 grapheme)
    ("codepoints", "ééé", 4, False),  # 6 codepoints
    ("graphemes", "ééé", 4, True),    # 3 graphemes < 4
])
def test_str_length_modes(spark, mode, value, limit, expect_fail):
    """Pluggable strLength (v4validator.js:15-17; the official-suite harness
    counts graphemes, official_suite_spec.js:34-36) — expression-only."""
    df = spark.createDataFrame([(value,)], "v string")
    suite = dsl.Suite(id_column="v", columns={"v": [dsl.MinLength(limit)]},
                      str_length=mode)
    got = {r["constraint_id"] for r in validate(df, suite).violations().collect()}
    assert got == ({"minLength"} if expect_fail else set())


def test_gettext_hook_translates_defaults_and_overrides(spark):
    """opts.gettext analog (v4validator.js:15-20): wraps BOTH the default
    catalog and per-suite overrides; folded at compile time."""
    df = spark.createDataFrame([(1,)], "v int")
    # gettext sees the TEMPLATE (pre-interpolation), like the reference's
    # messages(gettext) catalog construction
    tr = {"shall be >= %d": "doit être >= %d", "trop grand": "TROP GRAND"}
    suite = dsl.Suite(
        id_column="v",
        columns={"v": [dsl.Minimum(5), dsl.Maximum(0)]},
        messages={"maximum": "trop grand"},
        gettext=lambda s: tr.get(s, s),
    )
    got = {r["constraint_id"]: r["message"]
           for r in validate(df, suite).violations().collect()}
    assert got["minimum"] == "doit être >= 5"   # default, translated + %d
    assert got["maximum"] == "TROP GRAND"       # override, translated
