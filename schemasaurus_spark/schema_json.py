"""Draft-4 JSON Schema → Suite translation.

The reference's input IS a JSON-Schema document (``newValidator(schema)``,
``/root/reference/src/iterator.js:16-20``); this module lets a user hand the
ENGINE the same document: ``suite_from_json_schema(schema)`` translates a
draft-4 object schema into a :class:`~schemasaurus_spark.dsl.Suite`, so
switching from the reference requires no schema rewrite.

Mapping (keyword → DSL; reference semantics cited in dsl.py/compiler.py):

* root ``properties`` → ``Suite.columns``; ``required: [...]`` → NotNull
  prepended to each listed column (draft-4 required-array form); NESTED
  object properties recurse into dotted struct-column paths (``a.b.c``),
  with each object node's own keywords attached to the struct column and
  its ``required`` list scoped to that node (properties descent,
  processor.js:63-88)
* ``type`` (str or list) → TypeIs (``runtime=`` knob for string-staged
  ingest); ``enum``; ``minimum/maximum`` with draft-4 boolean
  ``exclusiveMinimum/exclusiveMaximum`` modifiers; ``multipleOf``;
  ``minLength/maxLength/pattern/format``
* ``minItems/maxItems/uniqueItems``; ``items`` dict → Items(...) — scalar
  keywords, combinators, and ``$ref`` nest as element sub-schemas, and an
  object element schema (``items: {properties: …, required: […]}``) maps
  to the array<struct> field descent ``Items(fields=…)``;
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
    "patternProperties", "additionalProperties",
    "allOf", "anyOf", "oneOf", "not", "$ref",
    "conform", "messages", "required", "default", "description", "title",
}


def _definitions_ref_name(ref: str) -> Optional[str]:
    """'#/definitions/<name>' (a flat name, no further pointer segments or
    escapes) → <name>; anything else → None (generic pointer path)."""
    prefix = "#/definitions/"
    if ref.startswith(prefix):
        name = ref[len(prefix):]
        if name and "/" not in name and "~" not in name and "%" not in name:
            return name
    return None


# %-escapes decodeURI leaves INTACT (JS spec: ; / ? : @ & = + $ , #).
_URI_RESERVED_ESCAPES = __import__("re").compile(
    r"%(23|24|26|2[Bb]|2[Cc]|2[Ff]|3[Aa]|3[Bb]|3[Dd]|3[Ff]|40)")


def _decode_uri(s: str) -> str:
    """JS ``decodeURI`` semantics: percent-decode (UTF-8 aware) but leave
    reserved-character escapes encoded. Implemented by shielding reserved
    escapes behind sentinels, running the stdlib decoder, then restoring."""
    from urllib.parse import unquote

    if "%" not in s:
        return s
    keep: list[str] = []

    def _protect(m):
        keep.append(m.group(0))
        return f"\x00\x01{len(keep) - 1}\x01\x00"

    shielded = _URI_RESERVED_ESCAPES.sub(_protect, s)
    out = unquote(shielded)
    for i, orig in enumerate(keep):
        out = out.replace(f"\x00\x01{i}\x01\x00", orig)
    return out


def resolve_json_pointer(root: dict, ref: str, loader=None):
    """Resolve any JSON-pointer ``$ref`` — the reference's ``resolveRef``
    (``/root/reference/src/int/references.js:7-27``): URI-decode, split on
    '#', de-tilde each '/'-segment (``~0``→``~``, ``~1``→``/``, applied in
    the reference's order), walk the document.

    A non-empty part before '#' is a REMOTE ref: ``loader(remote)`` must
    return the remote schema document (the reference's ``options.loader``,
    compiler.js:143); without a loader it raises, exactly like the
    reference's ``defaultLoader`` (references.js:3-5). A bare '#'-less ref
    is treated as remote too. Refs inside the resolved remote target keep
    resolving against the ORIGINAL document — the reference's ``step``
    keeps ``this.schemaRoot`` unchanged after a remote resolve.

    URI-decoding follows JS ``decodeURI`` (what references.js:12 calls),
    NOT ``decodeURIComponent``: escapes of RESERVED characters
    (``# $ & + , / : ; = ? @``) stay encoded, so ``a%23b`` remains a
    single fragment-safe name and ``%2F`` inside a pointer segment does
    not split it into two segments."""
    rem, sep, loc = _decode_uri(ref).partition("#")
    if rem or not sep:
        if loader is None:
            raise SchemaTranslationError(
                f"remote ref {ref!r} is not supported without a ref_loader "
                f"(the reference's defaultLoader throws the same way, "
                f"references.js:3-5)")
        node = loader(rem if rem else ref)
        if not isinstance(node, dict):
            raise SchemaTranslationError(
                f"ref_loader returned {type(node).__name__} for {rem!r}, "
                f"not a schema document")
    else:
        node = root
    for seg in loc.split("/"):
        if seg == "":
            continue
        seg = seg.replace("~0", "~").replace("~1", "/")
        try:
            node = node[int(seg)] if isinstance(node, list) else node[seg]
        except (KeyError, IndexError, ValueError, TypeError):
            raise SchemaTranslationError(
                f"Cannot find ref '{ref}' in schema")
    return node


def _js_num(v):
    """JSON numbers beyond int64 fold to IEEE doubles — JSON.parse (what
    the reference feeds v4validator.js) has no bignum type, so a schema
    bound like the official suite's ``maximum: 18446744073709551615``
    compares as a double there; int64-range ints stay exact."""
    if isinstance(v, int) and not isinstance(v, bool) \
            and not -(2 ** 63) <= v < 2 ** 63:
        return float(v)
    return v


def _constraints_from(schema: dict, custom_fns: Optional[dict],
                      runtime_types: bool, root: Optional[dict] = None,
                      stack: tuple = (), loader=None) -> list[dsl.Constraint]:
    """Translate one (property-level) schema dict into a constraint list,
    in the reference's deterministic keyword order.

    ``root`` is the enclosing draft-4 document: arbitrary JSON-pointer
    ``$ref``\\ s resolve against it by inline expansion (the reference
    resolves at compile time, compiler.js:142-144 + references.js);
    ``stack`` is the chain of refs currently being expanded — a revisit is
    a cyclic ref and raises (the reference only supports root recursion,
    compiler.js:136-141)."""
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
        ref = schema["$ref"]
        name = _definitions_ref_name(ref)
        if name is not None:
            # flat definitions ref → named DSL Ref (compile-time expansion
            # with its own cycle guard; named reuse keeps the suite small)
            out.append(dsl.Ref(name))
        elif root is not None:
            if ref in stack:
                raise SchemaTranslationError(
                    f"cyclic $ref chain {' -> '.join(stack + (ref,))} — "
                    f"recursive schemas have no columnar equivalent")
            target = resolve_json_pointer(root, ref, loader)
            if not isinstance(target, dict):
                raise SchemaTranslationError(
                    f"$ref {ref!r} resolves to {type(target).__name__}, "
                    f"not a schema object")
            out.extend(_constraints_from(target, custom_fns, runtime_types,
                                         root, stack + (ref,), loader))
        else:
            raise SchemaTranslationError(
                f"$ref {ref!r}: arbitrary JSON-pointer refs need the "
                f"enclosing document (translate via suite_from_json_schema)")
    if "type" in schema:
        t = schema["type"]
        out.append(dsl.TypeIs(t if isinstance(t, str) else list(t),
                              runtime=runtime_types))
    if "enum" in schema:
        out.append(dsl.Enum(list(schema["enum"]), message=m("enum")))
    if "minimum" in schema:
        if schema.get("exclusiveMinimum") is True:  # draft-4 boolean form
            out.append(dsl.ExclusiveMinimum(_js_num(schema["minimum"]),
                                            message=m("minimum.exclusive")))
        else:
            out.append(dsl.Minimum(_js_num(schema["minimum"]),
                                   message=m("minimum")))
    if "maximum" in schema:
        if schema.get("exclusiveMaximum") is True:
            out.append(dsl.ExclusiveMaximum(_js_num(schema["maximum"]),
                                            message=m("maximum.exclusive")))
        else:
            out.append(dsl.Maximum(_js_num(schema["maximum"]),
                                   message=m("maximum")))
    if "multipleOf" in schema:
        out.append(dsl.MultipleOf(_js_num(schema["multipleOf"]),
                                  message=m("multipleOf")))
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
            # an object element schema (items: {properties: …, required: […]})
            # becomes the array<struct> field descent (Items.fields) — the
            # reference's recursion into object sub-schemas, processor.js:31-64
            fields = None
            if "properties" in it:
                freq = it.get("required")
                freq = set(freq) if isinstance(freq, list) else set()
                fields = {}
                for fname, fschema in it["properties"].items():
                    fcs = _constraints_from(fschema, custom_fns,
                                                runtime_types, root, stack, loader)
                    if fname in freq:
                        fcs = [dsl.NotNull()] + fcs
                    fields[fname] = fcs
            # strip the required-ARRAY only alongside properties (it names
            # fields); the draft-3 inline `required: true` (element NotNull)
            # must survive into the scalar translation
            drop = ("properties", "required") if "properties" in it else (
                "properties",)
            it_scalar = {k: v for k, v in it.items() if k not in drop}
            out.append(dsl.Items(
                _constraints_from(it_scalar, custom_fns, runtime_types,
                                  root, stack, loader)
                if it_scalar else (),
                fields=fields))
        else:  # positional tuple form
            specs = [_constraints_from(s, custom_fns, runtime_types,
                                       root, stack, loader)
                     for s in it]
            addl_it = schema.get("additionalItems", True)
            if isinstance(addl_it, dict):
                # draft-4 SCHEMA form: extras each satisfy the sub-schema
                addl_it = _constraints_from(addl_it, custom_fns,
                                            runtime_types, root, stack,
                                            loader)
            out.append(dsl.TupleItems(specs, additional=addl_it))
    if "minProperties" in schema:
        out.append(dsl.MinProperties(schema["minProperties"],
                                     message=m("minProperties")))
    if "maxProperties" in schema:
        out.append(dsl.MaxProperties(schema["maxProperties"],
                                     message=m("maxProperties")))
    if "patternProperties" in schema or "additionalProperties" in schema:
        out.extend(pattern_properties_of(schema, custom_fns, runtime_types,
                                         root, stack, loader))
    for kw, cls in (("allOf", dsl.AllOf), ("anyOf", dsl.AnyOf),
                    ("oneOf", dsl.OneOf)):
        if kw in schema:
            branches = [_constraints_from(b, custom_fns, runtime_types,
                                          root, stack, loader)
                        for b in schema[kw]]
            out.append(cls(branches, message=m(kw)))
    if "not" in schema:
        out.append(dsl.Not(_constraints_from(schema["not"], custom_fns,
                                             runtime_types, root, stack, loader),
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


def _constraint_to_keywords(c: dsl.Constraint) -> dict:
    """Inverse of _constraints_from for the JSON-expressible constraints."""
    m = {"messages": {c.code: c.message}} if c.message else {}
    if isinstance(c, dsl.NotNull):
        return {"required": True, **m}
    if isinstance(c, dsl.TypeIs):
        return {"type": c.type}
    if isinstance(c, dsl.Enum):
        return {"enum": list(c.values), **m}
    if isinstance(c, dsl.Minimum):
        return {"minimum": c.value, **m}
    if isinstance(c, dsl.ExclusiveMinimum):
        return {"minimum": c.value, "exclusiveMinimum": True, **m}
    if isinstance(c, dsl.Maximum):
        return {"maximum": c.value, **m}
    if isinstance(c, dsl.ExclusiveMaximum):
        return {"maximum": c.value, "exclusiveMaximum": True, **m}
    if isinstance(c, dsl.MultipleOf):
        return {"multipleOf": c.value, **m}
    if isinstance(c, dsl.MinLength):
        return {"minLength": c.value, **m}
    if isinstance(c, dsl.MaxLength):
        return {"maxLength": c.value, **m}
    if isinstance(c, dsl.Pattern):
        return {"pattern": c.regex, **m}
    if isinstance(c, dsl.Format):
        return {"format": c.name}
    if isinstance(c, dsl.MinItems):
        return {"minItems": c.value, **m}
    if isinstance(c, dsl.MaxItems):
        return {"maxItems": c.value, **m}
    if isinstance(c, dsl.UniqueItems):
        return {"uniqueItems": True, **m}
    if isinstance(c, dsl.Items):
        d = (_merge([_constraint_to_keywords(s) for s in c.constraints])
             if c.constraints else {})
        if c.fields:
            fprops: dict = {}
            freq: list[str] = []
            for fname, fcs in c.field_items():
                fcs = list(fcs)
                if fcs and isinstance(fcs[0], dsl.NotNull):
                    freq.append(fname)
                    fcs = fcs[1:]
                fprops[fname] = _merge(
                    [_constraint_to_keywords(x) for x in fcs])
            if "required" in d:
                # element-level NotNull emitted `required: true`; a fields
                # required-list needs the same keyword — no JSON form holds
                # both on one object schema
                raise SchemaTranslationError(
                    "Items with BOTH an element NotNull and fields= has no "
                    "JSON form (the `required` keyword cannot be true and "
                    "a field list at once)")
            d["properties"] = fprops
            if freq:
                d["required"] = freq
        return {"items": d}
    if isinstance(c, dsl.TupleItems):
        addl = c.additional
        if isinstance(addl, tuple):  # schema form round-trips to a dict
            addl = _merge([_constraint_to_keywords(x) for x in addl])
        return {"items": [_merge([_constraint_to_keywords(x) for x in spec])
                          for spec in c.specs],
                "additionalItems": addl}
    if isinstance(c, dsl.MinProperties):
        return {"minProperties": c.value, **m}
    if isinstance(c, dsl.MaxProperties):
        return {"maxProperties": c.value, **m}
    if isinstance(c, dsl.StructClosed):
        # `allowed` is derived from the sibling `properties` (which the
        # enclosing object schema already carries) — only the policy and
        # the pattern allowlist need a JSON form
        d = {"additionalProperties": False}
        if c.patterns:
            d["patternProperties"] = {p: {} for p in c.patterns}
        return {**d, **m}
    if isinstance(c, dsl.KeyPattern):
        return {"patternProperties": {p: {} for p in c.patterns}, **m}
    if isinstance(c, dsl.PatternProperties):
        d: dict = {"patternProperties": {
            r: _merge([_constraint_to_keywords(x) for x in cs])
            for r, cs in c.spec_items()}}
        if c.additional is False:
            d["additionalProperties"] = False
        elif c.additional is not None:
            d["additionalProperties"] = _merge(
                [_constraint_to_keywords(x) for x in c.additional])
        return {**d, **m}
    if isinstance(c, dsl.AllOf):
        return {"allOf": [_merge([_constraint_to_keywords(x) for x in b])
                          for b in c.branches], **m}
    if isinstance(c, dsl.AnyOf):
        return {"anyOf": [_merge([_constraint_to_keywords(x) for x in b])
                          for b in c.branches], **m}
    if isinstance(c, dsl.OneOf):
        return {"oneOf": [_merge([_constraint_to_keywords(x) for x in b])
                          for b in c.branches], **m}
    if isinstance(c, dsl.Not):
        return {"not": _merge([_constraint_to_keywords(x)
                               for x in c.branch]), **m}
    if isinstance(c, dsl.Ref):
        return {"$ref": f"#/definitions/{c.name}"}
    if isinstance(c, dsl.Conform):
        return {"conform": {c.name or "anonymous": True}}
    raise SchemaTranslationError(
        f"{type(c).__name__} has no JSON-Schema form")


def _merge(dicts: list[dict]) -> dict:
    out: dict = {}
    for d in dicts:
        for k, v in d.items():
            if k == "messages":
                out.setdefault("messages", {}).update(v)
            elif k in out and out[k] != v:
                raise SchemaTranslationError(
                    f"conflicting values for keyword '{k}' in one schema")
            else:
                out[k] = v
    return out


def suite_to_json_schema(suite: dsl.Suite) -> dict:
    """Inverse translation for the JSON-expressible subset: a Suite built
    from suite_from_json_schema round-trips (same compiled plan). Conform
    functions emit {"conform": {name: true}} — the function itself travels
    via custom_fns, like the reference's options.custom."""
    props: dict = {}
    required: list[str] = []
    for col, constraints in suite.columns.items():
        # dotted struct paths rebuild as nested properties objects (inverse
        # of the from-JSON properties descent)
        parts = col.split(".")
        container, parent = props, None
        for p in parts[:-1]:
            parent = container.setdefault(p, {})
            container = parent.setdefault("properties", {})
        leaf = parts[-1]
        cs = list(constraints)
        if cs and isinstance(cs[0], dsl.NotNull):
            if parent is None:
                required.append(leaf)
            else:
                parent.setdefault("required", []).append(leaf)
            cs = cs[1:]
        container[leaf] = _merge([container.get(leaf, {})]
                                 + [_constraint_to_keywords(c) for c in cs])
    deps: dict = {}
    for on, c in suite.row:
        if not isinstance(c, dsl.Dependency):
            raise SchemaTranslationError(
                f"row constraint {type(c).__name__} has no JSON form")
        if c.requires:
            deps[c.on] = list(c.requires)
        else:
            sub_props: dict = {}
            sub_required: list[str] = []
            for target, sc in c.constraints:
                if isinstance(sc, dsl.NotNull):
                    sub_required.append(target)
                else:
                    sub_props[target] = _merge(
                        [sub_props.get(target, {}),
                         _constraint_to_keywords(sc)])
            d: dict = {"properties": sub_props}
            if sub_required:
                d["required"] = sub_required
            deps[c.on] = d
    out: dict = {"type": "object", "properties": props}
    if required:
        out["required"] = required
    if deps:
        out["dependencies"] = deps
    if suite.definitions:
        out["definitions"] = {
            n: _merge([_constraint_to_keywords(c) for c in cs])
            for n, cs in suite.definitions.items()
        }
    if suite.messages:
        out["messages"] = dict(suite.messages)
    if not suite.allow_undeclared_columns:
        out["additionalProperties"] = False
    return out


def normalizer_spec_from_json_schema(schema: dict):
    """``newNormalizer(schema)`` analog (``src/iterator.js:21-23``): the
    SAME draft-4 document drives normalization. ``properties`` declare
    columns (nested objects recurse to dotted paths), ``type`` picks the
    cast target (normalizer.js:31-55), ``default`` the coalesce value
    (js:12-16), and ``additionalProperties: false`` turns on pruning of
    undeclared columns (js:22-24) — the reference prunes only when the
    schema says so."""
    from schemasaurus_spark.normalizer import NormalizerSpec, col_spec

    if schema.get("type", "object") != "object":
        raise SchemaTranslationError(
            "root schema must be an object schema (the table row)")

    _TARGETS = {"string", "integer", "number", "boolean", "array"}

    def target_of(sub: dict) -> str:
        t = sub.get("type", "passthrough")
        if isinstance(t, (list, tuple)):  # union: first castable member
            t = next((x for x in t if x in _TARGETS), "passthrough")
        return t if t in _TARGETS else "passthrough"

    cols: list = []

    def walk(pr: dict, prefix: str) -> None:
        for name, sub in pr.items():
            path = prefix + name
            nested = sub.get("properties")
            if nested is not None:
                if nested:
                    # children declare the struct; _struct_expr rebuilds it
                    walk(nested, path + ".")
                else:  # object with no declared fields: keep as-is
                    cols.append(col_spec(path))
            elif "default" in sub:
                cols.append(col_spec(path, target_of(sub),
                                     default=sub["default"]))
            else:
                cols.append(col_spec(path, target_of(sub)))

    walk(schema.get("properties", {}), "")
    return NormalizerSpec(
        columns=cols,
        prune_additional=schema.get("additionalProperties") is False)


_OBJECT_FORM_KEYS = {"properties", "required", "dependencies"}


def is_object_form(schema: object) -> bool:
    """A branch that carries ONLY object-level keywords — mergeable into
    the enclosing object schema by conjunction."""
    return (isinstance(schema, dict) and bool(schema)
            and set(schema) <= _OBJECT_FORM_KEYS
            and (not isinstance(schema.get("required"), bool)))


def merge_object_allof(schema: dict) -> dict:
    """Fold ``allOf`` branches that are pure object schemas into the
    enclosing object schema. ``allOf`` is conjunction, so merging branch
    ``properties``/``required``/``dependencies`` into the parent is exactly
    the reference's behavior of walking every branch against the same
    object value (v4validator.js:104-121). A property named by both the
    parent and a branch (or two branches) keeps BOTH sub-schemas via a
    value-level ``allOf``. Branches mixing object and value keywords are
    left in place (they translate — or loudly fail — downstream)."""
    branches = schema.get("allOf")
    if not isinstance(branches, list):
        return schema
    mergeable = [b for b in branches if is_object_form(b)]
    if not mergeable:
        return schema
    out = {k: v for k, v in schema.items() if k != "allOf"}
    props = dict(out.get("properties", {}))
    required = list(out.get("required", []) or [])
    deps = dict(out.get("dependencies", {}) or {})
    for b in mergeable:
        for k, v in (b.get("properties") or {}).items():
            props[k] = {"allOf": [props[k], v]} if k in props else v
        for r in (b.get("required") or []):
            if r not in required:
                required.append(r)
        for k, v in (b.get("dependencies") or {}).items():
            if k in deps:
                raise SchemaTranslationError(
                    f"allOf branches declare conflicting dependencies for "
                    f"{k!r} — no single merged object form")
            deps[k] = v
    rest = [b for b in branches if not is_object_form(b)]
    if rest:
        out["allOf"] = rest
    if props:
        out["properties"] = props
    if required:
        out["required"] = required
    if deps:
        out["dependencies"] = deps
    return out


def pattern_properties_of(schema: dict, custom_fns=None, runtime_types=False,
                          root=None, stack=None, loader=None) -> list:
    """The patternProperties / additionalProperties constraints of ONE
    object node — shared by :func:`_constraints_from` (map/value nodes,
    where ``properties`` never appears) and the object walkers
    (:func:`suite_from_json_schema`'s nested descent and the official
    harness root), which strip ``properties`` before generic keyword
    translation but must still pass the declared names through as the
    ``allowed`` exemption (draft-4: ``additionalProperties`` applies to
    keys in neither ``properties`` nor any ``patternProperties`` match,
    v4validator.js:287).

    Policy (unchanged from round 3): value sub-schemas / an explicit
    additional policy use full draft-4 semantics (unmatched keys allowed
    unless the schema says otherwise — including explicit
    ``additionalProperties: true``); the bare keys-only form ({} value
    schemas, no additional keyword) keeps the legacy strict KeyPattern
    allowlist (conformance_map oracle-pinned)."""
    pp: dict = schema.get("patternProperties") or {}
    addl = schema.get("additionalProperties")
    msg = (schema.get("messages") or {}).get("additionalProperties")
    if any(pp.values()) or addl is not None:
        return [dsl.PatternProperties(
            specs=[(r, _constraints_from(s, custom_fns, runtime_types,
                                         root, stack, loader))
                   for r, s in pp.items()],
            additional=(False if addl is False else
                        _constraints_from(addl, custom_fns,
                                          runtime_types, root, stack, loader)
                        if isinstance(addl, dict) else None),
            allowed=list(schema.get("properties") or {}),
            message=msg)]
    if pp:
        return [dsl.KeyPattern(list(pp), message=msg)]
    return []


def struct_closed_from(schema: dict) -> dsl.StructClosed:
    """additionalProperties=false policy of an OBJECT schema node as a
    StructClosed: draft-4 exempts only properties / patternProperties
    matches (v4validator.js:287) — `required` names declare nothing."""
    return dsl.StructClosed(
        allowed=list(schema.get("properties") or {}),
        patterns=list(schema.get("patternProperties") or {}))


def suite_from_json_schema(
    schema: dict,
    id_column: str = "doc_id",
    custom_fns: Optional[dict[str, Callable]] = None,
    runtime_types: bool = False,
    name: str = "json_schema",
    ref_loader: Optional[Callable[[str], dict]] = None,
) -> dsl.Suite:
    """Translate a draft-4 object schema into a Suite (see module doc)."""
    if schema.get("type", "object") != "object":
        raise SchemaTranslationError(
            "root schema must be an object schema (the table row)")
    schema = merge_object_allof(schema)
    props: dict = schema.get("properties", {})
    required = set(schema.get("required", []))
    columns: dict[str, list] = {}

    def walk(pr: dict, req: set, prefix: str) -> None:
        """Nested object properties flatten to dotted struct-column paths —
        the columnar analog of the reference's properties descent
        (processor.js:63-88). An object node's own keywords (type, required
        presence, …) attach to the struct column itself."""
        for col, sub in pr.items():
            path = prefix + col
            head = ([dsl.NotNull(message=(sub.get("messages") or {})
                                 .get("required"))]
                    if col in req else [])
            sub = merge_object_allof(sub) if isinstance(sub, dict) else sub
            nested = sub.get("properties")
            if nested is not None:
                own = {k: v for k, v in sub.items()
                       if k not in ("properties", "required",
                                    "additionalProperties",
                                    "patternProperties")}
                cs = head + _constraints_from(own, custom_fns, runtime_types,
                                              root=schema, loader=ref_loader)
                # patternProperties value sub-schemas + the SCHEMA form of
                # additionalProperties compile per static struct field —
                # declared properties pass through as the allowed exemption
                # (they were dropped entirely on struct nodes before 5b)
                cs = cs + pattern_properties_of(
                    sub, custom_fns, runtime_types, root=schema,
                    loader=ref_loader)
                if sub.get("additionalProperties") is False:
                    # nested object node → STRUCT column: closed-ness is a
                    # static field check (dsl.StructClosed)
                    cs = cs + [struct_closed_from(sub)]
                if cs:
                    columns[path] = cs
                nreq = sub.get("required")
                walk(nested, set(nreq) if isinstance(nreq, list) else set(),
                     path + ".")
            else:
                columns[path] = head + _constraints_from(
                    sub, custom_fns, runtime_types, root=schema, loader=ref_loader)

    walk(props, required, "")
    for r in required - set(props):
        # a required name with no properties entry still demands presence
        # (v4validator.js required-array form fires independently of
        # `properties`); it becomes a declared column with only NotNull
        columns[r] = [dsl.NotNull(message=(schema.get("messages") or {})
                                  .get("required"))] + columns.get(r, [])
    row: list[tuple] = []
    for on, dep in (schema.get("dependencies") or {}).items():
        if isinstance(dep, list):
            row.append((on, dsl.Dependency(on=on, requires=list(dep))))
        else:
            sub_props = dep.get("properties", {})
            cons = []
            req = set(dep.get("required", []))
            for target, tschema in sub_props.items():
                for c in _constraints_from(tschema, custom_fns, runtime_types,
                                           root=schema, loader=ref_loader):
                    cons.append((target, c))
            for target in req:
                cons.append((target, dsl.NotNull()))
            row.append((on, dsl.Dependency(on=on, constraints=cons)))
    definitions = {
        dname: _constraints_from(dschema, custom_fns, runtime_types,
                                 root=schema, loader=ref_loader)
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
