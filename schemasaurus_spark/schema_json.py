"""Draft-4 JSON Schema → Suite translation.

The reference's input IS a JSON-Schema document (``newValidator(schema)``,
``/root/reference/src/iterator.js:16-20``); this module lets a user hand the
ENGINE the same document: ``suite_from_json_schema(schema)`` translates a
draft-4 object schema into a :class:`~schemasaurus_spark.dsl.Suite`, so
switching from the reference requires no schema rewrite.

Mapping (keyword → DSL; reference semantics cited in dsl.py/compiler.py):

* root ``properties`` → ``Suite.columns``; ``required: [...]`` → NotNull
  prepended to each listed column (draft-4 required-array form)
* ``type`` (str or list) → TypeIs (``runtime=`` knob for string-staged
  ingest); ``enum``; ``minimum/maximum`` with draft-4 boolean
  ``exclusiveMinimum/exclusiveMaximum`` modifiers; ``multipleOf``;
  ``minLength/maxLength/pattern/format``
* ``minItems/maxItems/uniqueItems``; ``items`` dict → Items(...),
  ``items`` list → TupleItems(specs, additional=additionalItems)
* ``minProperties/maxProperties``; ``patternProperties`` keys → KeyPattern
* ``allOf/anyOf/oneOf`` → combinators over translated branch lists;
  ``not`` → Not
* ``$ref: "#/definitions/<name>"`` → Ref(name); root ``definitions``
  → Suite.definitions (cycles surface as SuiteCompileError at compile)
* ``dependencies`` {col: [names]} → Dependency(requires=...);
  {col: schema} → Dependency(constraints=[...]) over the sub-schema's
  properties
* ``messages`` {code: text} inside any property schema → per-constraint
  overrides for the codes it names; at the root → Suite.messages
* ``conform`` {name: true} → Conform resolved from ``custom_fns`` (JSON
  can't carry functions — the reference passes them via options.custom,
  v4validator.js:22)

Unsupported draft-4 corners raise ``SchemaTranslationError`` with the
offending keyword — loud, never silently dropped.
"""

from __future__ import annotations

from typing import Callable, Optional

from schemasaurus_spark import dsl


class SchemaTranslationError(ValueError):
    pass


_SCALAR_KEYWORDS = {
    "type", "enum", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "format", "minItems", "maxItems", "uniqueItems", "items",
    "additionalItems", "minProperties", "maxProperties",
    "patternProperties", "allOf", "anyOf", "oneOf", "not", "$ref",
    "conform", "messages", "required", "default", "description", "title",
}


def _ref_name(ref: str) -> str:
    prefix = "#/definitions/"
    if not ref.startswith(prefix):
        raise SchemaTranslationError(
            f"only '#/definitions/<name>' refs are supported, got {ref!r}")
    return ref[len(prefix):]


def _constraints_from(schema: dict, custom_fns: Optional[dict],
                      runtime_types: bool) -> list[dsl.Constraint]:
    """Translate one (property-level) schema dict into a constraint list,
    in the reference's deterministic keyword order."""
    unknown = set(schema) - _SCALAR_KEYWORDS
    if unknown:
        raise SchemaTranslationError(
            f"unsupported JSON-Schema keyword(s) {sorted(unknown)}")
    msgs: dict = schema.get("messages", {})

    def m(code):
        return msgs.get(code)

    out: list[dsl.Constraint] = []
    if schema.get("required") is True:  # draft-3-style inline required
        out.append(dsl.NotNull(message=m("required")))
    if "$ref" in schema:
        out.append(dsl.Ref(_ref_name(schema["$ref"])))
    if "type" in schema:
        t = schema["type"]
        out.append(dsl.TypeIs(t if isinstance(t, str) else list(t),
                              runtime=runtime_types))
    if "enum" in schema:
        out.append(dsl.Enum(list(schema["enum"]), message=m("enum")))
    if "minimum" in schema:
        if schema.get("exclusiveMinimum") is True:  # draft-4 boolean form
            out.append(dsl.ExclusiveMinimum(schema["minimum"],
                                            message=m("minimum.exclusive")))
        else:
            out.append(dsl.Minimum(schema["minimum"], message=m("minimum")))
    if "maximum" in schema:
        if schema.get("exclusiveMaximum") is True:
            out.append(dsl.ExclusiveMaximum(schema["maximum"],
                                            message=m("maximum.exclusive")))
        else:
            out.append(dsl.Maximum(schema["maximum"], message=m("maximum")))
    if "multipleOf" in schema:
        out.append(dsl.MultipleOf(schema["multipleOf"], message=m("multipleOf")))
    if "minLength" in schema:
        out.append(dsl.MinLength(schema["minLength"], message=m("minLength")))
    if "maxLength" in schema:
        out.append(dsl.MaxLength(schema["maxLength"], message=m("maxLength")))
    if "pattern" in schema:
        out.append(dsl.Pattern(schema["pattern"], message=m("pattern")))
    if "format" in schema:
        out.append(dsl.Format(schema["format"]))
    if "minItems" in schema:
        out.append(dsl.MinItems(schema["minItems"], message=m("minItems")))
    if "maxItems" in schema:
        out.append(dsl.MaxItems(schema["maxItems"], message=m("maxItems")))
    if schema.get("uniqueItems"):
        out.append(dsl.UniqueItems(message=m("uniqueItems")))
    if "items" in schema:
        it = schema["items"]
        if isinstance(it, dict):
            out.append(dsl.Items(_constraints_from(it, custom_fns,
                                                   runtime_types)))
        else:  # positional tuple form
            specs = [_constraints_from(s, custom_fns, runtime_types)
                     for s in it]
            out.append(dsl.TupleItems(
                specs, additional=schema.get("additionalItems", True)))
    if "minProperties" in schema:
        out.append(dsl.MinProperties(schema["minProperties"],
                                     message=m("minProperties")))
    if "maxProperties" in schema:
        out.append(dsl.MaxProperties(schema["maxProperties"],
                                     message=m("maxProperties")))
    if "patternProperties" in schema:
        out.append(dsl.KeyPattern(list(schema["patternProperties"]),
                                  message=m("additionalProperties")))
    for kw, cls in (("allOf", dsl.AllOf), ("anyOf", dsl.AnyOf),
                    ("oneOf", dsl.OneOf)):
        if kw in schema:
            branches = [_constraints_from(b, custom_fns, runtime_types)
                        for b in schema[kw]]
            out.append(cls(branches, message=m(kw)))
    if "not" in schema:
        out.append(dsl.Not(_constraints_from(schema["not"], custom_fns,
                                             runtime_types),
                           message=m("not")))
    if "conform" in schema:
        for name, enabled in schema["conform"].items():
            if not enabled:
                continue
            fn = (custom_fns or {}).get(name)
            if fn is None:
                raise SchemaTranslationError(
                    f"conform '{name}' needs a function in custom_fns "
                    f"(the reference's options.custom)")
            kind = "expr" if getattr(fn, "is_expr", True) else "pandas_fn"
            out.append(dsl.Conform(name=name, **{kind: fn}))
    return out


def suite_from_json_schema(
    schema: dict,
    id_column: str = "doc_id",
    custom_fns: Optional[dict[str, Callable]] = None,
    runtime_types: bool = False,
    name: str = "json_schema",
) -> dsl.Suite:
    """Translate a draft-4 object schema into a Suite (see module doc)."""
    if schema.get("type", "object") != "object":
        raise SchemaTranslationError(
            "root schema must be an object schema (the table row)")
    props: dict = schema.get("properties", {})
    required = set(schema.get("required", []))
    columns: dict[str, list] = {}
    for col, sub in props.items():
        cs = _constraints_from(sub, custom_fns, runtime_types)
        if col in required:
            cs = [dsl.NotNull(message=sub.get("messages", {}).get("required"))] + cs
        columns[col] = cs
    row: list[tuple] = []
    for on, dep in (schema.get("dependencies") or {}).items():
        if isinstance(dep, list):
            row.append((on, dsl.Dependency(on=on, requires=list(dep))))
        else:
            sub_props = dep.get("properties", {})
            cons = []
            req = set(dep.get("required", []))
            for target, tschema in sub_props.items():
                for c in _constraints_from(tschema, custom_fns, runtime_types):
                    cons.append((target, c))
            for target in req:
                cons.append((target, dsl.NotNull()))
            row.append((on, dsl.Dependency(on=on, constraints=cons)))
    definitions = {
        dname: _constraints_from(dschema, custom_fns, runtime_types)
        for dname, dschema in (schema.get("definitions") or {}).items()
    }
    return dsl.Suite(
        id_column=id_column,
        columns=columns,
        row=row,
        messages=dict(schema.get("messages") or {}),
        definitions=definitions,
        name=name,
        allow_undeclared_columns=schema.get("additionalProperties", True)
        is not False,
    )
