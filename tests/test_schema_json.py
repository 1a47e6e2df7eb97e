"""Draft-4 JSON Schema → Suite translation: the reference's own input
format works unchanged (iterator.js:16-20 newValidator(schema))."""

import pytest

from schemasaurus_spark import dsl, validate
from schemasaurus_spark.schema_json import (
    SchemaTranslationError, suite_from_json_schema,
)


SCHEMA = {
    "type": "object",
    "required": ["doc_id"],
    "additionalProperties": False,
    "properties": {
        "doc_id": {"type": "integer"},
        "lang": {"enum": ["en", "es"], "messages": {"enum": "bad lang!"}},
        "n_tok": {"type": "integer", "minimum": 1, "maximum": 100,
                  "exclusiveMaximum": True, "multipleOf": 1},
        "email": {"format": "email"},
        "name": {"minLength": 2, "maxLength": 10, "pattern": "^[a-z]"},
        "tokens": {"minItems": 1, "uniqueItems": True,
                   "items": {"minimum": 0}},
        "pair": {"items": [{"enum": ["a"]}, {"minimum": 5}],
                 "additionalItems": False},
        "score": {"oneOf": [{"minimum": 90}, {"maximum": 10}]},
        "alias": {"$ref": "#/definitions/shortstr"},
    },
    "dependencies": {
        "email": ["name"],
    },
    "definitions": {
        "shortstr": {"minLength": 1, "maxLength": 3},
    },
}


def test_translation_shape():
    s = suite_from_json_schema(SCHEMA, id_column="doc_id")
    assert isinstance(s.columns["doc_id"][0], dsl.NotNull)      # required[]
    assert isinstance(s.columns["lang"][0], dsl.Enum)
    assert s.columns["lang"][0].message == "bad lang!"
    kinds = [type(c).__name__ for c in s.columns["n_tok"]]
    assert kinds == ["TypeIs", "Minimum", "ExclusiveMaximum", "MultipleOf"]
    assert isinstance(s.columns["alias"][0], dsl.Ref)
    assert "shortstr" in s.definitions
    assert not s.allow_undeclared_columns
    assert s.row and isinstance(s.row[0][1], dsl.Dependency)


def test_translated_suite_validates(spark):
    s = suite_from_json_schema(SCHEMA, id_column="doc_id")
    df = spark.createDataFrame(
        [
            # clean row
            (1, "en", 50, "a@b.co", "alice", [1, 2], ["a", 9], 95, "ok"),
            # lang enum fail, n_tok exclusiveMaximum fail, tokens dup,
            # pair extra... no extra; alias too long (ref), email w/o name
            (2, "zz", 100, "a@b.co", None, [3, 3], ["b", 1], 50, "toolong"),
        ],
        "doc_id int, lang string, n_tok int, email string, name string, "
        "tokens array<int>, pair array<string>, score int, alias string")
    # pair is array<string>: minimum(5) on element 2 compares strings —
    # drop pair checks by removing the column from this frame's suite
    s2 = suite_from_json_schema(
        {**SCHEMA, "properties": {k: v for k, v in SCHEMA["properties"].items()
                                  if k != "pair"}}, id_column="doc_id")
    got = {(r["doc_id"], r["constraint_id"])
           for r in validate(df.drop("pair"), s2).violations().collect()}
    assert (2, "enum") in got                      # lang
    assert (2, "maximum.exclusive") in got         # n_tok == 100
    assert (2, "uniqueItems") in got               # [3,3]
    assert (2, "maxLength") in got                 # alias via $ref
    assert (2, "dependency") in got and (2, "required") in got  # email→name
    assert (2, "oneOf") not in got                 # score 50: in [10,90]... 
    # score 50 passes neither minimum>=90 nor... wait: maximum(10) fails,
    # minimum(90) fails -> oneOf.zero
    assert (2, "oneOf.zero") in got
    assert all(d != 1 for d, _ in got)             # clean row stays clean


def test_unknown_keyword_is_loud():
    with pytest.raises(SchemaTranslationError, match="maxContains"):
        suite_from_json_schema({"type": "object", "properties": {
            "x": {"maxContains": 3}}})


def test_conform_requires_registered_fn(spark):
    import pyspark.sql.functions as F

    sch = {"type": "object", "properties": {"v": {"conform": {"pos": True}}}}
    with pytest.raises(SchemaTranslationError, match="custom_fns"):
        suite_from_json_schema(sch)
    s = suite_from_json_schema(sch, id_column="v",
                               custom_fns={"pos": lambda c: c > 0})
    df = spark.createDataFrame([(5,), (-1,)], "v int")
    rows = validate(df, s).violations().collect()
    assert [(r["v"], r["constraint_id"]) for r in rows] == [(-1, "custom.pos")]


def test_round_trip_preserves_compiled_plan():
    """suite → JSON → suite reconstructs identical constraint dataclasses
    (same fingerprint ⇒ same compiled plan, resume-compatible)."""
    from schemasaurus_spark.schema_json import suite_to_json_schema

    suite = dsl.Suite(
        id_column="doc_id",
        columns={
            "doc_id": [dsl.NotNull(), dsl.TypeIs("integer")],
            "lang": [dsl.Enum(["en", "es"], message="bad")],
            "n": [dsl.Minimum(1), dsl.ExclusiveMaximum(100),
                  dsl.MultipleOf(2)],
            "s": [dsl.MinLength(1), dsl.Pattern("^a"), dsl.Format("email")],
            "arr": [dsl.MinItems(1), dsl.UniqueItems(),
                    dsl.Items([dsl.Minimum(0)])],
            "tup": [dsl.TupleItems([[dsl.Enum(["x"])]], additional=False)],
            "m": [dsl.MinProperties(1), dsl.KeyPattern(["^k"])],
            "c": [dsl.OneOf([[dsl.Minimum(9)], [dsl.Maximum(1)]]),
                  dsl.Not([dsl.Enum(["z"])])],
            "r": [dsl.Ref("short")],
        },
        row=[("a", dsl.Dependency(on="a", requires=["b"]))],
        definitions={"short": [dsl.MaxLength(3)]},
        messages={"minimum": "too small"},
        allow_undeclared_columns=False,
        name="rt",
    )
    js = suite_to_json_schema(suite)
    back = suite_from_json_schema(js, id_column="doc_id", name="rt")
    assert back.fingerprint() == suite.fingerprint()
    assert suite_to_json_schema(back) == js  # JSON form is a fixpoint


def test_nested_properties_flatten_to_dotted_columns():
    """Nested object properties recurse into dotted struct paths with
    node-scoped required lists (properties descent, processor.js:63-88)."""
    schema = {
        "type": "object",
        "required": ["meta"],
        "properties": {
            "doc_id": {"type": "integer"},
            "meta": {
                "type": "object",
                "required": ["lang"],
                "properties": {
                    "lang": {"enum": ["en", "es"]},
                    "geo": {
                        "type": "object",
                        "properties": {"cc": {"minLength": 2,
                                              "maxLength": 2}},
                    },
                },
            },
        },
    }
    s = suite_from_json_schema(schema, id_column="doc_id")
    assert set(s.columns) == {"doc_id", "meta", "meta.lang", "meta.geo",
                              "meta.geo.cc"}
    assert isinstance(s.columns["meta"][0], dsl.NotNull)          # root req
    assert isinstance(s.columns["meta.lang"][0], dsl.NotNull)     # node req
    assert isinstance(s.columns["meta.geo.cc"][0], dsl.MinLength)


def test_nested_properties_validate_on_struct_frame(spark):
    schema = {
        "type": "object",
        "properties": {
            "doc_id": {"type": "integer"},
            "meta": {"type": "object", "required": ["lang"],
                     "properties": {"lang": {"enum": ["en", "es"]}}},
        },
    }
    df = spark.createDataFrame(
        [(1, ("en",)), (2, ("xx",)), (3, (None,)), (4, None)],
        "doc_id int, meta struct<lang: string>")
    rows = validate(df, suite_from_json_schema(schema, id_column="doc_id")
                    ).violations().collect()
    got = sorted((r["doc_id"], r["constraint_id"], r["column"]) for r in rows)
    # doc 2: enum fail; doc 3: required (parent present, field null);
    # doc 4: null OPTIONAL struct → sub-schema not entered, nothing fires
    # (draft-4: required applies only when the parent object exists)
    assert got == [(2, "enum", "meta.lang"), (3, "required", "meta.lang")]


def test_items_object_schema_round_trip_and_validation(spark):
    """items: {properties: …, required: […]} ⇄ Items(fields=…) — the
    array<struct> element descent in the reference's native format."""
    from schemasaurus_spark.schema_json import suite_to_json_schema

    schema = {
        "type": "object",
        "properties": {
            "doc_id": {"type": "integer"},
            "spans": {"minItems": 1,
                      "items": {"required": ["s"],
                                "properties": {"s": {"minimum": 0},
                                               "t": {"pattern": "^x"}}}},
        },
    }
    s = suite_from_json_schema(schema, id_column="doc_id")
    js = suite_to_json_schema(s)
    back = suite_from_json_schema(js, id_column="doc_id")
    assert back.fingerprint() == s.fingerprint()
    assert suite_to_json_schema(back) == js

    df = spark.createDataFrame(
        [(1, [(0, "xa"), (2, "xb")]), (2, [(-1, "xa"), (None, "no")]), (3, [])],
        "doc_id int, spans array<struct<s: int, t: string>>")
    rows = validate(df, s).violations().collect()
    got = sorted((r["doc_id"], r["constraint_id"]) for r in rows)
    assert got == [(2, "items.s.minimum"), (2, "items.s.required"),
                   (2, "items.t.pattern"), (3, "minItems")]


def test_items_element_combinator_round_trip():
    """items element sub-schemas with combinators/refs survive JSON I/O."""
    from schemasaurus_spark.schema_json import suite_to_json_schema

    suite = dsl.Suite(
        id_column="i",
        columns={"a": [dsl.Items([dsl.AnyOf(([dsl.Ref("small")],
                                             [dsl.Minimum(100)]))])]},
        definitions={"small": [dsl.Maximum(10)]},
    )
    js = suite_to_json_schema(suite)
    assert js["properties"]["a"]["items"]["anyOf"][0]["$ref"] == \
        "#/definitions/small"
    back = suite_from_json_schema(js, id_column="i")
    assert suite_to_json_schema(back) == js


def test_normalizer_from_json_schema(spark):
    """newNormalizer(schema) analog: the same draft-4 document drives
    defaults → casts → pruning (normalizer.js:12-55)."""
    from schemasaurus_spark.normalizer import normalize
    from schemasaurus_spark.schema_json import normalizer_spec_from_json_schema

    schema = {
        "type": "object",
        "additionalProperties": False,
        "properties": {
            "doc_id": {"type": "integer"},
            "lang": {"type": "string", "default": "en"},
            "n": {"type": "number"},
            "flag": {"type": "boolean"},
            "meta": {"type": "object",
                     "properties": {"score": {"type": "integer",
                                              "default": 0}}},
        },
    }
    spec = normalizer_spec_from_json_schema(schema)
    df = spark.createDataFrame(
        [("7", None, "1.5", "on", (None,), "drop me")],
        "doc_id string, lang string, n string, flag string, "
        "meta struct<score: string>, extra string")
    out = normalize(df, spec)
    assert "extra" not in out.columns          # additionalProperties: false
    row = out.collect()[0]
    assert row["doc_id"] == 7                  # parseInt
    assert row["lang"] == "en"                 # default
    assert row["n"] == 1.5                     # parseFloat
    assert row["flag"] is True                 # 'on' truth table
    assert row["meta"]["score"] == 0           # nested default materialized


def test_normalizer_from_json_schema_no_prune_by_default(spark):
    """Without additionalProperties: false the reference keeps undeclared
    values — so do we."""
    from schemasaurus_spark.normalizer import normalize
    from schemasaurus_spark.schema_json import normalizer_spec_from_json_schema

    spec = normalizer_spec_from_json_schema(
        {"type": "object", "properties": {"a": {"type": "integer"}}})
    df = spark.createDataFrame([("3", "keep")], "a string, extra string")
    out = normalize(df, spec)
    assert out.columns == ["a", "extra"]
    assert out.collect()[0]["a"] == 3


def test_pattern_properties_value_schemas_round_trip(spark):
    """patternProperties value sub-schemas + additionalProperties schema
    form translate both ways and validate map entries (processor.js:90-111);
    violations carry the sub-code and a col[key] label."""
    from schemasaurus_spark.schema_json import suite_to_json_schema

    schema = {
        "type": "object",
        "properties": {
            "doc_id": {"type": "integer"},
            "attrs": {"patternProperties": {"^n_": {"minimum": 0}},
                      "additionalProperties": {"maxLength": 3}},
        },
    }
    s = suite_from_json_schema(schema, id_column="doc_id")
    js = suite_to_json_schema(s)
    back = suite_from_json_schema(js, id_column="doc_id")
    assert back.fingerprint() == s.fingerprint()
    assert suite_to_json_schema(back) == js

    df = spark.createDataFrame(
        [(1, {"n_a": "5", "note": "ok"}), (2, {"n_b": "-1", "note": "toolong"})],
        "doc_id int, attrs map<string,string>")
    # map values are strings here; minimum is DCE-skipped per element? No —
    # element predicates are type-agnostic expressions; "-1" < lit(0) uses
    # string/int comparison coercion, so use an int-valued map instead.
    df = spark.createDataFrame(
        [(1, {"n_a": 5}), (2, {"n_b": -1})], "doc_id int, attrs map<string,int>")
    suite2 = suite_from_json_schema(
        {"type": "object",
         "properties": {"doc_id": {"type": "integer"},
                        "attrs": {"patternProperties": {"^n_": {"minimum": 0}}}}},
        id_column="doc_id")
    rows = validate(df, suite2).violations().collect()
    assert [(r["doc_id"], r["constraint_id"], r["column"], r["value"])
            for r in rows] == [(2, "minimum", "attrs[n_b]", "-1")]


def test_keys_only_pattern_properties_still_key_pattern():
    schema = {"type": "object",
              "properties": {"m": {"patternProperties": {"^a": {}}}}}
    s = suite_from_json_schema(schema, id_column="m")
    assert isinstance(s.columns["m"][0], dsl.KeyPattern)


def test_normalizer_passthrough_keeps_map_and_struct_types(spark):
    """Passthrough specs on map/struct columns must not type their null
    branch as STRING (review fix: --schema-json --normalize crashed on the
    very map columns patternProperties validates)."""
    from schemasaurus_spark.normalizer import normalize
    from schemasaurus_spark.schema_json import normalizer_spec_from_json_schema

    doc = {"type": "object",
           "properties": {"attrs": {"patternProperties": {"^n_": {"minimum": 0}}},
                          "empty_obj": {"type": "object", "properties": {}}}}
    spec = normalizer_spec_from_json_schema(doc)
    df = spark.createDataFrame(
        [({"n_a": 1}, (7,)), (None, None)],
        "attrs map<string,int>, empty_obj struct<x: int>")
    out = normalize(df, spec)
    rows = out.collect()
    assert rows[0]["attrs"] == {"n_a": 1} and rows[0]["empty_obj"]["x"] == 7
    assert rows[1]["attrs"] is None


def test_items_inline_required_round_trips():
    """items: {required: true} (element NotNull) must survive JSON I/O
    (review fix: 'required' was stripped even without 'properties')."""
    from schemasaurus_spark.schema_json import suite_to_json_schema

    suite = dsl.Suite(id_column="i",
                      columns={"a": [dsl.Items([dsl.NotNull()])]})
    js = suite_to_json_schema(suite)
    assert js["properties"]["a"]["items"] == {"required": True}
    back = suite_from_json_schema(js, id_column="i", name=suite.name)
    assert back.fingerprint() == suite.fingerprint()


def test_items_notnull_plus_fields_required_is_loud():
    from schemasaurus_spark.schema_json import suite_to_json_schema

    suite = dsl.Suite(id_column="i", columns={"a": [
        dsl.Items([dsl.NotNull()], fields={"s": [dsl.NotNull()]})]})
    with pytest.raises(SchemaTranslationError, match="required"):
        suite_to_json_schema(suite)


def test_additional_properties_true_allows_unmatched_keys(spark):
    """additionalProperties: true explicitly PERMITS unmatched keys — it
    must not compile to the strict KeyPattern allowlist (review fix)."""
    doc = {"type": "object",
           "properties": {"m": {"patternProperties": {"^a": {}},
                                "additionalProperties": True}}}
    s = suite_from_json_schema(doc, id_column="m")
    df = spark.createDataFrame([({"zz": "v"},)], "m map<string,string>")
    assert validate(df, s).violations().count() == 0


# --- arbitrary JSON-pointer $ref resolution (references.js:7-27) ---------


def test_pointer_ref_into_properties(spark):
    """#/properties/... refs resolve against the document by inline
    expansion — a user porting a real draft-4 schema with non-definitions
    pointers hits this immediately (round-3 VERDICT missing #1)."""
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer", "minimum": 5},
            "b": {"$ref": "#/properties/a"},           # same constraints
            "obj": {"properties": {"leaf": {"minLength": 3}}},
            "c": {"$ref": "#/properties/obj/properties/leaf"},
            "arr": {"items": {"minimum": 0}},
            "d": {"$ref": "#/properties/arr/items"},
        },
    }
    s = suite_from_json_schema(schema, id_column="a")
    kinds_b = [type(c).__name__ for c in s.columns["b"]]
    assert kinds_b == ["TypeIs", "Minimum"]
    df = spark.createDataFrame(
        [(10, 3, "ok", "xy", -1, [1, 2])],
        "a int, b int, `obj.leaf` string, c string, d int, arr array<int>"
    ).selectExpr("a", "b", "named_struct('leaf', `obj.leaf`) as obj",
                 "c", "d", "arr")
    codes = {(r["column"], r["constraint_id"])
             for r in validate(df, s).violations().collect()}
    assert ("b", "minimum") in codes          # 3 < 5 via expanded ref
    assert ("c", "minLength") in codes        # "xy" < 3
    assert ("d", "minimum") in codes          # -1 < 0
    assert not any(col == "a" for col, _ in codes)


def test_pointer_ref_detilde(spark):
    """~0/~1 detilde in pointer segments, in the reference's replace order
    (references.js:8)."""
    schema = {
        "type": "object",
        "properties": {"v": {"$ref": "#/definitions/a~1b"}},
        "definitions": {"a/b": {"minimum": 3}},
    }
    s = suite_from_json_schema(schema, id_column="v")
    df = spark.createDataFrame([(1,)], "v int")
    codes = {r["constraint_id"]
             for r in validate(df, s).violations().collect()}
    assert codes == {"minimum"}


def test_pointer_ref_cycle_is_loud():
    schema = {
        "type": "object",
        "properties": {
            "x": {"$ref": "#/properties/y"},
            "y": {"$ref": "#/properties/x"},
        },
    }
    with pytest.raises(SchemaTranslationError, match="cyclic"):
        suite_from_json_schema(schema, id_column="x")


def test_remote_ref_still_raises():
    """Remote refs keep throwing, as the reference's defaultLoader does."""
    schema = {"type": "object",
              "properties": {"x": {"$ref": "http://x.y/s.json#/a"}}}
    with pytest.raises(SchemaTranslationError, match="remote"):
        suite_from_json_schema(schema, id_column="x")


def test_unresolvable_pointer_is_loud():
    schema = {"type": "object",
              "properties": {"x": {"$ref": "#/properties/nope/deeper"}}}
    with pytest.raises(SchemaTranslationError, match="Cannot find ref"):
        suite_from_json_schema(schema, id_column="x")


def test_nested_items_translation(spark):
    """items: {items: {...}} and items: {properties: {tags: {items: …}}}
    translate to arbitrary-depth Items descent (round-3 VERDICT #4)."""
    schema = {
        "type": "object",
        "properties": {
            "mat": {"items": {"items": {"minimum": 0}, "minItems": 1}},
            "spans": {"items": {
                "properties": {
                    "tags": {"minItems": 1, "items": {"minLength": 2}}},
            }},
        },
    }
    s = suite_from_json_schema(schema, id_column="mat")
    df = spark.createDataFrame(
        [([[1, -2], []], [([],)]), ([[3]], [(["ok"],)])],
        "mat array<array<int>>, spans array<struct<tags:array<string>>>")
    codes = {(r["column"], r["constraint_id"])
             for r in validate(df, s).violations().collect()}
    assert ("mat", "items.items") in codes        # inner -2 < 0
    assert ("mat", "items.minItems") in codes     # [] inner array
    assert ("spans", "items.tags.minItems") in codes


def test_remote_ref_loader_hook(spark):
    """ref_loader plays the reference's options.loader (compiler.js:143 →
    resolveRef(loader, …)): the remote part resolves through the hook,
    the fragment walks the REMOTE document, and refs inside the resolved
    target keep resolving against the ORIGINAL document."""
    remote_docs = {
        "http://x.example/common.json": {
            "defs": {"code": {"pattern": "^[A-Z]{3}$",
                              "$ref": "#/definitions/short"}},
        },
    }
    schema = {
        "type": "object",
        "properties": {
            "c": {"$ref": "http://x.example/common.json#/defs/code"},
        },
        "definitions": {"short": {"maxLength": 3}},
    }
    s = suite_from_json_schema(schema, id_column="c",
                               ref_loader=remote_docs.__getitem__)
    df = spark.createDataFrame([("ABC",), ("nope",)], "c string")
    got = {(r["c"], r["constraint_id"])
           for r in validate(df, s).violations().collect()}
    assert ("nope", "pattern") in got
    assert ("nope", "maxLength") in got   # nested ref hit the LOCAL defs
    assert not any(c == "ABC" for c, _ in got)

    # without a loader, remote refs still raise like defaultLoader
    with pytest.raises(SchemaTranslationError, match="remote"):
        suite_from_json_schema(schema, id_column="c")


def test_struct_additional_properties_schema_form(spark):
    """Round 5b: on a nested object node (STRUCT column), patternProperties
    value sub-schemas and the SCHEMA form of additionalProperties compile
    per static field — declared `properties` exempt from the additional
    policy (v4validator.js:287). Before the fix the whole PatternProperties
    constraint was silently dropped on struct dtypes."""
    schema = {
        "type": "object",
        "properties": {
            "obj": {
                "type": "object",
                "properties": {"declared": {}},
                "patternProperties": {"^n_": {"type": "integer",
                                              "minimum": 0}},
                "additionalProperties": {"type": "string"},
            },
        },
    }
    s = suite_from_json_schema(schema, id_column="rid")
    df = spark.createDataFrame(
        [(1, ("x", -5, "ok", None)),     # n_bad violates minimum
         (2, ("y", 3, None, 7))],        # extra=7 violates additional string
        "rid long, obj struct<declared string, n_bad long, "
        "extra1 string, extra2 long>")
    # field names drive matching: rename extra1/extra2 per-row is not
    # possible in one static schema, so stage both shapes as fields
    got = {(r["rid"], r["column"], r["constraint_id"])
           for r in validate(df, s).violations().collect()}
    assert (1, "obj.n_bad", "minimum") in got
    # element type probes carry the expected type name as the code (the
    # same convention as the map-entry path)
    assert (2, "obj.extra2", "string") in got
    # declared field and null fields never fire the additional policy
    assert not any(c.endswith(".declared") for _, c, _ in got)
    assert not any(r == 2 and c == "obj.n_bad" for r, c, _ in got)
