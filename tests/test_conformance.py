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

# Shared definitions map for Ref cases — the `definitions` object of the
# official suite's ref.json cases (resolution is inline expansion,
# references.js:11-27). Passed to every batch suite; unused entries are
# never compiled.
DEFS = {
    "positive": [dsl.Minimum(0)],
    "small": [dsl.Maximum(10)],
    "pos_small": [dsl.Ref("positive"), dsl.Ref("small")],
    "shortstr": [dsl.MinLength(2), dsl.MaxLength(4)],
}

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

# ---------------------------------------------------------------- round 3
# Remaining applicable draft-4 official-suite families (the reference loads
# JSON-Schema-Test-Suite draft4 wholesale, official_suite_spec.js:9-51, with
# ignore-list ignored.json): definitions/$ref, type incl. `object`,
# enum over non-strings, pattern/format breadth, number boundaries, array
# element sub-schemas (incl. array<struct> field descent), map bounds,
# combinator nesting, and nested-struct dotted paths. 6-tuples carry an
# optional dotted sub-path (columnar analog of the official suite's
# `properties` descent). Cases marked ignored.json families (`definitions`
# with remote/changing resolution scope) stay out, matching the reference.
CASES += [
    # --- type: static object/array checks + runtime probes ---
    ("type object on struct col ok", "struct<b: int>",
     [dsl.TypeIs("object")], (1,), set()),
    ("type object on map col ok", "map<string,string>",
     [dsl.TypeIs("object")], {"a": "b"}, set()),
    ("type object on string col fails", S, [dsl.TypeIs("object")], "x", {"object"}),
    ("type string on int col fails", "int", [dsl.TypeIs("string")], 1, {"string"}),
    ("type array on string col fails", S, [dsl.TypeIs("array")], "x", {"array"}),
    ("type integer on boolean col fails", "boolean",
     [dsl.TypeIs("integer")], True, {"integer"}),
    ("type number on boolean col fails", "boolean",
     [dsl.TypeIs("number")], True, {"number"}),
    ("type integer on long col ok", "long", [dsl.TypeIs("integer")], 9, set()),
    ("union array-or-null: null ok", "array<int>",
     [dsl.TypeIs(["array", "null"])], None, set()),
    ("union object-or-string: struct ok", "struct<b: int>",
     [dsl.TypeIs(["object", "string"])], (1,), set()),
    ("type null on null value ok", S, [dsl.TypeIs("null")], None, set()),
    ("rt integer from exponent string", S,
     [dsl.TypeIs("integer", runtime=True)], "1e2", set()),
    ("rt number from empty string fails", S,
     [dsl.TypeIs("number", runtime=True)], "", {"number"}),
    ("rt boolean from 'FALSE' ok", S,
     [dsl.TypeIs("boolean", runtime=True)], "FALSE", set()),
    ("rt integer whitespace-padded ok", S,
     [dsl.TypeIs("integer", runtime=True)], " 7 ", set()),
    # --- required: draft-4 required is presence, not truthiness ---
    ("required empty string ok", S, [dsl.NotNull()], "", set()),
    ("required zero ok", "int", [dsl.NotNull()], 0, set()),
    ("required false ok", "boolean", [dsl.NotNull()], False, set()),
    # --- enum over non-strings + null skip ---
    ("enum bool ok", "boolean", [dsl.Enum([True])], True, set()),
    ("enum bool fail", "boolean", [dsl.Enum([True])], False, {"enum"}),
    ("enum double ok", "double", [dsl.Enum([1.5, 2.5])], 2.5, set()),
    ("enum double fail", "double", [dsl.Enum([1.5, 2.5])], 3.5, {"enum"}),
    ("enum null skips (optional)", S, [dsl.Enum(["a"])], None, set()),
    ("enum is case-sensitive", S, [dsl.Enum(["A"])], "a", {"enum"}),
    # --- strings: pattern breadth ---
    ("pattern alternation ok", S, [dsl.Pattern("cat|dog")], "hotdog!", set()),
    ("pattern quantifier fail", S, [dsl.Pattern("^a{3}$")], "aa", {"pattern"}),
    ("pattern char class ok", S, [dsl.Pattern("[0-9]{4}")], "year 2024", set()),
    ("pattern escaped dot fail", S, [dsl.Pattern(r"\.com$")], "xcom", {"pattern"}),
    ("pattern .+ on empty fail", S, [dsl.Pattern(".+")], "", {"pattern"}),
    ("minLength 1 on empty fail", S, [dsl.MinLength(1)], "", {"minLength"}),
    ("maxLength astral counts codepoints", S, [dsl.MaxLength(2)], "𝄞𝄞", set()),
    # --- formats: remaining ok/fail pairs of the six built-ins ---
    ("format date-time month 13 fails", S, [dsl.Format("date-time")],
     "2024-13-01T10:00:00Z", {"format.date-time"}),
    ("format date-time fractional ok", S, [dsl.Format("date-time")],
     "2024-01-31T10:00:00.123Z", set()),
    ("format uri mailto ok", S, [dsl.Format("uri")], "mailto:x@y.z", set()),
    ("format uri space fails", S, [dsl.Format("uri")], "http://a b", {"format.uri"}),
    ("format email empty domain fails", S, [dsl.Format("email")],
     "a@", {"format.email"}),
    ("format hostname trailing hyphen label fails", S, [dsl.Format("hostname")],
     "bad-.com", {"format.hostname"}),
    ("format hostname single label ok", S, [dsl.Format("hostname")],
     "localhost", set()),
    ("format ipv6 zone index ok", S, [dsl.Format("ipv6")], "fe80::1%eth0", set()),
    ("format ipv4 three octets fails", S, [dsl.Format("ipv4")],
     "1.2.3", {"format.ipv4"}),
    ("format null skips (optional)", S, [dsl.Format("email")], None, set()),
    # --- numbers: boundaries, longs, doubles ---
    ("minimum double boundary eq ok", "double", [dsl.Minimum(1.5)], 1.5, set()),
    ("maximum double fail", "double", [dsl.Maximum(1.5)], 1.6, {"maximum"}),
    ("exclusiveMinimum double above ok", "double",
     [dsl.ExclusiveMinimum(1.5)], 1.6, set()),
    ("exclusiveMaximum double eq fails", "double",
     [dsl.ExclusiveMaximum(1.5)], 1.5, {"maximum.exclusive"}),
    ("multipleOf 1 whole double ok", "double", [dsl.MultipleOf(1)], 3.0, set()),
    ("multipleOf 1 frac double fail", "double",
     [dsl.MultipleOf(1)], 3.5, {"multipleOf"}),
    ("minimum big long ok", "long", [dsl.Minimum(2**40)], 2**41, set()),
    ("maximum negative fail", "int", [dsl.Maximum(-5)], -4, {"maximum"}),
    ("minimum int bound on whole double ok", "double", [dsl.Minimum(5)], 5.0, set()),
    ("multipleOf 7 ok", "int", [dsl.MultipleOf(7)], 49, set()),
    # --- arrays: bounds, null-safe uniqueItems, element sub-schemas ---
    ("minItems on empty fail", "array<int>", [dsl.MinItems(1)], [], {"minItems"}),
    ("maxItems 0 empty ok", "array<int>", [dsl.MaxItems(0)], [], set()),
    ("maxItems 0 nonempty fail", "array<int>", [dsl.MaxItems(0)], [1], {"maxItems"}),
    ("minItems null skips (optional)", "array<int>", [dsl.MinItems(2)], None, set()),
    ("maxItems null skips (optional)", "array<int>", [dsl.MaxItems(1)], None, set()),
    ("uniqueItems doubles fail", "array<double>",
     [dsl.UniqueItems()], [1.0, 1.0], {"uniqueItems"}),
    ("uniqueItems null duplicates fail", "array<int>",
     [dsl.UniqueItems()], [1, None, None], {"uniqueItems"}),
    ("uniqueItems nested arrays fail", "array<array<int>>",
     [dsl.UniqueItems()], [[1], [1]], {"uniqueItems"}),
    ("uniqueItems nested arrays ok", "array<array<int>>",
     [dsl.UniqueItems()], [[1], [1, 2]], set()),
    ("uniqueItems structs fail", "array<struct<a: int>>",
     [dsl.UniqueItems()], [(1,), (1,)], {"uniqueItems"}),
    ("items notnull element fail", "array<string>",
     [dsl.Items([dsl.NotNull()])], ["a", None], {"items.required"}),
    ("items minLength element fail", "array<string>",
     [dsl.Items([dsl.MinLength(2)])], ["ab", "c"], {"items.minLength"}),
    ("items maxLength elements ok", "array<string>",
     [dsl.Items([dsl.MaxLength(2)])], ["ab", "c"], set()),
    ("items format email element fail", "array<string>",
     [dsl.Items([dsl.Format("email")])], ["a@b.co", "nope"],
     {"items.format.email"}),
    ("tuple extra fails additionalItems", "array<int>",
     [dsl.TupleItems([[dsl.Minimum(0)]], additional=False)],
     [1, 2, 3], {"additionalItems"}),
    ("tuple position constraint fail", "array<int>",
     [dsl.TupleItems([[dsl.Minimum(0)], [dsl.Minimum(10)]], additional=True)],
     [5, 3], {"items.1.minimum"}),
    ("tuple enum positions ok", "array<string>",
     [dsl.TupleItems([[dsl.Enum(["a"])], [dsl.Enum(["b"])]], additional=False)],
     ["a", "b"], set()),
    # --- array<struct> element field descent (processor.js:31-64) ---
    ("items field minimum fail", "array<struct<s: int, e: int>>",
     [dsl.Items(fields={"s": [dsl.Minimum(0)]})],
     [(1, 2), (-1, 3)], {"items.s.minimum"}),
    ("items field required fail", "array<struct<s: int, e: int>>",
     [dsl.Items(fields={"e": [dsl.NotNull()]})], [(1, None)],
     {"items.e.required"}),
    ("items field pattern ok", "array<struct<t: string>>",
     [dsl.Items(fields={"t": [dsl.Pattern("^x")]})],
     [("xa",), ("xb",)], set()),
    ("items field null element skips non-required", "array<struct<s: int>>",
     [dsl.Items(fields={"s": [dsl.Minimum(0)]})], [(None,)], set()),
    ("items fields empty array ok", "array<struct<s: int>>",
     [dsl.Items(fields={"s": [dsl.NotNull()]})], [], set()),
    # --- maps ---
    ("minProperties empty map fail", "map<string,int>",
     [dsl.MinProperties(1)], {}, {"minProperties"}),
    ("maxProperties boundary eq ok", "map<string,string>",
     [dsl.MaxProperties(2)], {"a": "x", "b": "y"}, set()),
    ("map bounds null skips (optional)", "map<string,string>",
     [dsl.MinProperties(1)], None, set()),
    ("keyPattern every bad key emits", "map<string,string>",
     [dsl.KeyPattern(["^a"])], {"z": "1", "y": "2"}, {"additionalProperties"}),
    # --- combinators: nesting depth + null skip ---
    ("anyOf first branch ok", "int",
     [dsl.AnyOf([[dsl.Minimum(0)], [dsl.Minimum(100)]])], 5, set()),
    ("oneOf exactly one ok", "int",
     [dsl.OneOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])], 5, set()),
    ("oneOf zero bubbles subs", "int",
     [dsl.OneOf([[dsl.Minimum(100)], [dsl.Minimum(200)]])], 5,
     {"oneOf.zero", "minimum"}),
    ("not multi-constraint fails when all hold", "int",
     [dsl.Not([dsl.Minimum(0), dsl.Maximum(10)])], 5, {"not"}),
    ("not multi-constraint ok when one fails", "int",
     [dsl.Not([dsl.Minimum(0), dsl.Maximum(3)])], 5, set()),
    ("allOf of allOf ok", "int",
     [dsl.AllOf([[dsl.AllOf([[dsl.Minimum(0)]])]])], 5, set()),
    ("anyOf of failing oneOf bubbles", "int",
     [dsl.AnyOf([[dsl.OneOf([[dsl.Minimum(100)], [dsl.Minimum(200)]])]])], 5,
     {"anyOf", "oneOf.zero", "minimum"}),
    ("combinator null skips (optional)", "int",
     [dsl.AllOf([[dsl.Minimum(10)]])], None, set()),
    ("not null skips (optional)", S, [dsl.Not([dsl.Enum(["x"])])], None, set()),
    ("oneOf both pattern branches pass", S,
     [dsl.OneOf([[dsl.Pattern("^a")], [dsl.Pattern("z$")]])], "abz", {"oneOf"}),
    ("allOf format+length ok", S,
     [dsl.AllOf([[dsl.Format("email")], [dsl.MinLength(3)]])], "a@b.co", set()),
    ("three-level nesting ok", "int",
     [dsl.AllOf([[dsl.AnyOf([[dsl.Not([dsl.Minimum(100)])]])]])], 5, set()),
    # --- definitions / $ref (official suite ref.json analog) ---
    ("ref simple ok", "int", [dsl.Ref("positive")], 5, set()),
    ("ref simple fail", "int", [dsl.Ref("positive")], -1, {"minimum"}),
    ("ref chain ok", "int", [dsl.Ref("pos_small")], 5, set()),
    ("ref chain fail lower", "int", [dsl.Ref("pos_small")], -1, {"minimum"}),
    ("ref chain fail upper", "int", [dsl.Ref("pos_small")], 11, {"maximum"}),
    ("ref inside not", "int", [dsl.Not([dsl.Ref("small")])], 5, {"not"}),
    ("ref inside oneOf both pass", "int",
     [dsl.OneOf([[dsl.Ref("positive")], [dsl.Ref("small")]])], 5, {"oneOf"}),
    ("ref string definition fail", S, [dsl.Ref("shortstr")], "toolong",
     {"maxLength"}),
    ("ref plus inline constraint", "int",
     [dsl.Ref("positive"), dsl.MultipleOf(2)], 3, {"multipleOf"}),
    ("ref null skips (optional)", "int", [dsl.Ref("positive")], None, set()),
    # --- nested-struct dotted paths (properties descent) ---
    ("nested minimum fail", "struct<b: int>", [dsl.Minimum(0)], (-1,),
     {"minimum"}, "b"),
    ("nested required fail", "struct<b: string>", [dsl.NotNull()], (None,),
     {"required"}, "b"),
    ("nested null struct skips optional", "struct<b: int>",
     [dsl.Minimum(0)], None, set(), "b"),
    ("nested pattern ok", "struct<b: string>", [dsl.Pattern("^x")], ("xy",),
     set(), "b"),
    ("nested two levels maximum ok", "struct<b: struct<c: int>>",
     [dsl.Maximum(10)], ((5,),), set(), "b.c"),
    ("nested two levels maximum fail", "struct<b: struct<c: int>>",
     [dsl.Maximum(10)], ((50,),), {"maximum"}, "b.c"),
    ("nested enum fail", "struct<b: string>", [dsl.Enum(["ok"])], ("bad",),
     {"enum"}, "b"),
    ("nested combinator bubbles", "struct<b: int>",
     [dsl.AnyOf([[dsl.Minimum(100)], [dsl.Maximum(0)]])], (5,),
     {"anyOf", "minimum", "maximum"}, "b"),
    # --- element-level sub-schema combinators + refs (processor.js:31-64
    #     descends into arbitrary sub-schemas; element emits the combinator
    #     code — bubbling is column-level only, see compiler docstring) ---
    ("items oneOf zero-pass element fail", "array<int>",
     [dsl.Items([dsl.OneOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])])],
     [5, 50], {"items.oneOf"}),
    ("items oneOf both-pass element fail", "array<int>",
     [dsl.Items([dsl.OneOf([[dsl.Minimum(0)], [dsl.Maximum(10)]])])],
     [5], {"items.oneOf"}),
    ("items anyOf elements ok", "array<int>",
     [dsl.Items([dsl.AnyOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])])],
     [5, 200], set()),
    ("items anyOf element fail", "array<int>",
     [dsl.Items([dsl.AnyOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])])],
     [50], {"items.anyOf"}),
    ("items allOf element fail", "array<int>",
     [dsl.Items([dsl.AllOf([[dsl.Minimum(0)], [dsl.Maximum(10)]])])],
     [5, 20], {"items.allOf"}),
    ("items not element fail", "array<int>",
     [dsl.Items([dsl.Not([dsl.Minimum(0)])])], [5], {"items.not"}),
    ("items not element ok", "array<int>",
     [dsl.Items([dsl.Not([dsl.Minimum(0)])])], [-5], set()),
    ("items top-level ref keeps target code", "array<int>",
     [dsl.Items([dsl.Ref("small")])], [5, 50], {"items.maximum"}),
    ("items nested ref inside anyOf", "array<int>",
     [dsl.Items([dsl.AnyOf([[dsl.Ref("positive")], [dsl.Maximum(-10)]])])],
     [-5], {"items.anyOf"}),
    ("tuple position oneOf fail", "array<int>",
     [dsl.TupleItems([[dsl.OneOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])]],
                     additional=True)], [50], {"items.0.oneOf"}),
    ("items field anyOf fail", "array<struct<s: int>>",
     [dsl.Items(fields={"s": [dsl.AnyOf([[dsl.Minimum(100)],
                                         [dsl.Maximum(10)]])]})],
     [(50,)], {"items.s.anyOf"}),
    # --- uniform element null semantics (round 3): null elements skip
    #     value checks, Items([NotNull()]) flags presence ---
    ("items enum null element skips", "array<string>",
     [dsl.Items([dsl.Enum(["x"])])], [None, "x"], set()),
    ("items pattern null element skips", "array<string>",
     [dsl.Items([dsl.Pattern("^a")])], ["ab", None], set()),
    ("items minimum null element skips", "array<int>",
     [dsl.Items([dsl.Minimum(0)])], [None, 5], set()),
    ("items notnull flags nulls, minimum flags values", "array<int>",
     [dsl.Items([dsl.NotNull(), dsl.Minimum(0)])], [None, -1],
     {"items.required", "items.minimum"}),
    ("items combinator null element skips", "array<int>",
     [dsl.Items([dsl.AnyOf([[dsl.Minimum(100)]])])], [None], set()),
    # --- patternProperties VALUE sub-schemas (processor.js:90-111) ---
    ("patternProps value ok", "map<string,int>",
     [dsl.PatternProperties([("^n", [dsl.Minimum(0)])])], {"n1": 5}, set()),
    ("patternProps value fail, unmatched key unchecked", "map<string,int>",
     [dsl.PatternProperties([("^n", [dsl.Minimum(0)])])],
     {"n1": -1, "x": -5}, {"minimum"}),
    ("patternProps additional=false flags unmatched key", "map<string,int>",
     [dsl.PatternProperties([("^n", [dsl.Minimum(0)])], additional=False)],
     {"n1": 1, "x": 1}, {"additionalProperties"}),
    ("patternProps additional schema checks unmatched values",
     "map<string,int>",
     [dsl.PatternProperties([("^n", ())], additional=[dsl.Maximum(10)])],
     {"n1": 99, "z": 99}, {"maximum"}),
    ("patternProps null value skips checks", "map<string,string>",
     [dsl.PatternProperties([("^a", [dsl.MinLength(2)])])],
     {"aa": None}, set()),
    ("patternProps notnull flags null value", "map<string,string>",
     [dsl.PatternProperties([("^a", [dsl.NotNull()])])],
     {"aa": None}, {"required"}),
    ("patternProps combinator value fail", "map<string,int>",
     [dsl.PatternProperties(
         [("^a", [dsl.AnyOf([[dsl.Minimum(100)], [dsl.Maximum(10)]])])])],
     {"aa": 50}, {"anyOf"}),
    ("patternProps overlapping patterns both apply", "map<string,int>",
     [dsl.PatternProperties([("^a", [dsl.Minimum(0)]),
                             ("b$", [dsl.Maximum(10)])])],
     {"ab": 50}, {"maximum"}),
    ("patternProps null map skips (optional)", "map<string,int>",
     [dsl.PatternProperties([("^a", [dsl.Minimum(0)])], additional=False)],
     None, set()),
]


# Round-4: TypeIs as an items() element constraint (items/type cases of the
# official draft-4 suite; static fold against the element Spark type, with
# the whole-valued runtime probe kept for double elements).
CASES += [
    ("items type static match", "array<int>",
     [dsl.Items([dsl.TypeIs("integer")])], [1, 2], set()),
    ("items type static mismatch", "array<string>",
     [dsl.Items([dsl.TypeIs("integer")])], ["x"], {"items.integer"}),
    ("items type double whole ok", "array<double>",
     [dsl.Items([dsl.TypeIs("integer")])], [1.0, 2.0], set()),
    ("items type double frac fails", "array<double>",
     [dsl.Items([dsl.TypeIs("integer")])], [1.5], {"items.integer"}),
    ("items union type single code", "array<int>",
     [dsl.Items([dsl.TypeIs(["integer", "string"])])], [1], set()),
    ("items type number on string fails", "array<string>",
     [dsl.Items([dsl.TypeIs("number")])], ["1"], {"items.number"}),
    ("items type inside combinator branch", "array<int>",
     [dsl.Items([dsl.AnyOf([[dsl.TypeIs("string")], [dsl.Minimum(0)]])])],
     [1, -2], {"items.anyOf"}),
]


# Round-4: arbitrary-depth Items descent (processor.js:31-64 recursion at
# depth >= 2): container constraints as element predicates.
CASES += [
    ("nested array items fail", "array<array<int>>",
     [dsl.Items([dsl.Items([dsl.Minimum(0)])])], [[1], [2, -3]],
     {"items.items"}),
    ("nested array items ok", "array<array<int>>",
     [dsl.Items([dsl.Items([dsl.Minimum(0)])])], [[1], [2]], set()),
    ("uniqueItems on inner arrays", "array<array<int>>",
     [dsl.Items([dsl.UniqueItems()])], [[1, 1], [2]],
     {"items.uniqueItems"}),
    ("minItems on inner arrays", "array<array<int>>",
     [dsl.Items([dsl.MinItems(2)])], [[1], [2, 3]], {"items.minItems"}),
    ("maxItems on inner arrays ok", "array<array<int>>",
     [dsl.Items([dsl.MaxItems(2)])], [[1], [2, 3]], set()),
    ("struct field array minItems", "array<struct<s:int,tags:array<string>>>",
     [dsl.Items(fields={"tags": [dsl.MinItems(1)]})], [(1, [])],
     {"items.tags.minItems"}),
    ("struct field nested items fail",
     "array<struct<s:int,tags:array<string>>>",
     [dsl.Items(fields={"tags": [dsl.Items([dsl.MinLength(2)])]})],
     [(1, ["x", "ok"])], {"items.tags.items"}),
    ("struct field nested items ok",
     "array<struct<s:int,tags:array<string>>>",
     [dsl.Items(fields={"tags": [dsl.Items([dsl.MinLength(2)])]})],
     [(1, ["yes", "ok"])], set()),
    ("nested inner null element skips checks", "array<array<string>>",
     [dsl.Items([dsl.Items([dsl.MinLength(2)])])], [["ok", None]], set()),
    ("nested inner NotNull flags nulls", "array<array<string>>",
     [dsl.Items([dsl.Items([dsl.NotNull()])])], [["ok", None]],
     {"items.items"}),
    ("tuple schema per element ok", "array<array<int>>",
     [dsl.Items([dsl.TupleItems([[dsl.Minimum(1)], [dsl.Maximum(5)]],
                                additional=False)])], [[2, 3]], set()),
    ("tuple schema per element fail", "array<array<int>>",
     [dsl.Items([dsl.TupleItems([[dsl.Minimum(1)], [dsl.Maximum(5)]],
                                additional=False)])], [[0, 9, 1]],
     {"items.items"}),
]


# Round-4 review fixes: tuple positions stay null-strict under statically
# folded type checks (the verdict must not depend on the element's physical
# dtype), and a "null" union member still admits nulls.
CASES += [
    ("tuple static type null fails", "array<int>",
     [dsl.TupleItems([[dsl.TypeIs("integer")]])], [None],
     {"items.0.integer"}),
    ("tuple runtime type null fails", "array<double>",
     [dsl.TupleItems([[dsl.TypeIs("integer")]])], [None],
     {"items.0.integer"}),
    ("tuple null-union type null ok", "array<int>",
     [dsl.TupleItems([[dsl.TypeIs(["null", "integer"])]])], [None], set()),
    ("items static type null skips (element convention)", "array<int>",
     [dsl.Items([dsl.TypeIs("integer")])], [1, None], set()),
]


def test_corpus_size():
    """Round-3 bar (VERDICT.md next-steps #6): corpus ≥200 translated cases."""
    assert len(CASES) >= 200


def _run_batch(spark, cases):
    """Batched corpus runner: one wide single-row DataFrame + ONE suite per
    ~24 cases (each case its own column c<i>, optionally with a dotted
    sub-path), validated in ONE Spark job. This is both a test-time win
    (~9 jobs instead of ~210) and a realism win — a production suite IS a
    many-column suite compiled into one projection. Violations attribute
    back to cases via the violation `column` field."""
    fields, row, columns = ["cid string"], ["row0"], {}
    for i, case in enumerate(cases):
        _, coltype, constraints, value = case[:4]
        sub = case[5] if len(case) > 5 else None
        fields.append(f"c{i} {coltype}")
        row.append(value)
        columns[f"c{i}" if sub is None else f"c{i}.{sub}"] = list(constraints)
    df = spark.createDataFrame([tuple(row)], ", ".join(fields))
    suite = dsl.Suite(id_column="cid", columns=columns, definitions=DEFS)
    res = validate(df, suite)
    got = {i: set() for i in range(len(cases))}
    for r in res.violations().collect():
        # column is c<i>, c<i>.<subpath>, or c<i>[<map key>]
        base = r["column"].split(".")[0].split("[")[0]
        got[int(base[1:])].add(r["constraint_id"])
    mismatches = [
        f"{cases[i][0]}: got {sorted(got[i])}, expected {sorted(cases[i][4])}"
        for i in range(len(cases)) if got[i] != set(cases[i][4])
    ]
    assert not mismatches, "\n".join(mismatches)
    # table verdict mirrors {valid: errors.length === 0} (v4validator.js:326)
    assert res.is_valid() == all(not c[4] for c in cases)


_BATCH = 24
BATCHES = [CASES[i:i + _BATCH] for i in range(0, len(CASES), _BATCH)]


@pytest.mark.parametrize("batch", BATCHES,
                         ids=[f"batch{j:02d}" for j in range(len(BATCHES))])
def test_keyword_corpus_batch(spark, batch):
    _run_batch(spark, batch)


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


def test_dependency_requires_all_present_ok(spark):
    """requires-form with every required property present: no violations
    (official suite dependencies.json 'with dependencies' valid case)."""
    df = spark.createDataFrame([("x", "y", "z")],
                               "a string, b string, c string")
    suite = dsl.Suite(
        id_column="a", columns={},
        row=[("a", dsl.Dependency(on="a", requires=["b", "c"]))],
    )
    assert validate(df, suite).violations().count() == 0


def test_dependency_schema_form_passing_constraint(spark):
    """schema-form dependency whose sub-schema holds: no violations."""
    df = spark.createDataFrame([("x", "ok")], "a string, b string")
    suite = dsl.Suite(
        id_column="b", columns={},
        row=[("a", dsl.Dependency(on="a",
                                  constraints=[("b", dsl.Enum(["ok"]))]))],
    )
    assert validate(df, suite).violations().count() == 0


def test_two_independent_dependencies_per_suite(spark):
    """multiple dependency specs evaluate independently (dependencies.json
    'multiple dependencies' family): each trigger fires only its own check."""
    df = spark.createDataFrame(
        [("x", None, "q", "ok"), (None, "y", None, None)],
        "a string, b string, c string, d string")
    suite = dsl.Suite(
        id_column="a", columns={},
        row=[("a", dsl.Dependency(on="a", requires=["b"])),
             ("c", dsl.Dependency(on="c",
                                  constraints=[("d", dsl.Enum(["ok"]))]))],
    )
    rows = validate(df, suite).violations().collect()
    # row 1: a present & b missing → dependency+required; c's schema dep holds
    # row 2: a absent, c absent → nothing fires
    got = sorted((r["constraint_id"], r["column"]) for r in rows)
    assert got == [("dependency", "a"), ("required", "b")]


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
