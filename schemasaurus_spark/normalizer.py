"""Normalizer — reference parity with ``/root/reference/src/normalizer.js``.

The reference normalizer mutates a JSON value in place (defaults → casts →
pruning, selector order per ``src/compiler.js:76`` prototype-key iteration);
in Spark the whole mechanism collapses into ONE pure ``select`` of
cast/coalesced columns (README.md:291-312: "preprocess data before
validation"). No mutation plumbing (``ctx.replace``) is needed — transforms
are expressions.

Semantics table (normalizer.js:25-56 / test/normalizer_spec.js:80-90):

* ``[default]``        → ``coalesce(col, lit(default))``       (js:12-16)
* ``[additionalProperty]`` prune undeclared columns → ``select(*declared)``
  (js:22-24)
* ``type: string``     → ``cast(string)``                       (js:31-34)
* ``type: integer``    → trunc-parse (parseInt semantics: leading integer
  prefix of a numeric string; NaN → null)                       (js:35-38)
* ``type: number``     → ``cast(double)``                       (js:39-42)
* ``type: boolean``    → truth table: 'true'/'on' → true, 'false'/'off' →
  false, else JS truthiness (non-empty string / nonzero number) (js:43-50)
* ``type: array``      → wrap non-array as 1-element array      (js:51-55)
* null/missing passthrough: casts apply only to non-null values (js:27-30)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F, types as T


@dataclass(frozen=True)
class ColumnSpec:
    """Declared column: target type + optional default."""

    name: str
    type: str  # string|integer|number|boolean|array<...>|passthrough
    default: object = None
    has_default: bool = False


def col_spec(name: str, type_: str = "passthrough", **kw) -> ColumnSpec:
    if "default" in kw:
        return ColumnSpec(name, type_, kw["default"], True)
    return ColumnSpec(name, type_)


@dataclass
class NormalizerSpec:
    """Schema for normalization — analog of the schema doc handed to
    ``newNormalizer(schema)`` (``src/iterator.js:21-23``).

    ``prune_additional`` is the ``additionalProperties`` knob: True drops
    undeclared columns (normalizer.js:22-24)."""

    columns: Sequence[ColumnSpec] = field(default_factory=list)
    prune_additional: bool = True


def _parse_int(col: Column) -> Column:
    """JS parseInt semantics: leading integer prefix; else null."""
    s = F.trim(col.cast("string"))
    prefix = F.regexp_extract(s, r"^[+-]?\d+", 0)
    return F.when(prefix != "", prefix.cast("long")).otherwise(F.lit(None).cast("long"))


def _parse_bool(col: Column) -> Column:
    """normalizer.js truth table + JS truthiness fallback."""
    s = F.lower(F.trim(col.cast("string")))
    return (
        F.when(s.isin("true", "on"), F.lit(True))
        .when(s.isin("false", "off"), F.lit(False))
        # JS truthiness: empty string false, '0' is a non-empty string → true;
        # numeric 0 → false. We only see the string form post-cast, so match
        # the reference's Boolean(value) on the ORIGINAL type where we can.
        .otherwise(s != "")
    )


def _cast(col: Column, dtype, target: str) -> Column:
    if target == "string":
        return col.cast("string")
    if target == "integer":
        if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return col.cast("long")
        if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
            # parseInt(3.9) == 3 → cast truncates toward zero
            return col.cast("long")
        return _parse_int(col)
    if target == "number":
        # parseFloat semantics: malformed → null (try_cast, ANSI-safe)
        return col.try_cast("double")
    if target == "boolean":
        if isinstance(dtype, T.BooleanType):
            return col
        if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                              T.FloatType, T.DoubleType, T.DecimalType)):
            return col != 0  # JS truthiness for numbers
        return _parse_bool(col)
    if target.startswith("array"):
        if isinstance(dtype, T.ArrayType):
            return col
        elem = target[len("array<"):-1] if "<" in target else "string"
        return F.array(col.cast(elem))
    if target == "passthrough":
        return col
    raise ValueError(f"Unknown normalizer type '{target}'")


def normalize(df: DataFrame, spec: NormalizerSpec) -> DataFrame:
    """One projection: defaults land before casts (selector firing order
    ``[default]`` → ``[type]``, compiler.js:76 + normalizer.js)."""
    declared = []
    schema = {f.name: f.dataType for f in df.schema.fields}
    for cs in spec.columns:
        if cs.name in schema:
            col = F.col(cs.name)
            dtype = schema[cs.name]
        else:
            col = F.lit(None)
            dtype = None
        if cs.has_default:
            col = F.coalesce(col, F.lit(cs.default))
        col = F.when(col.isNotNull(), _cast(col, dtype, cs.type)).otherwise(
            _typed_null(cs.type)
        )
        declared.append(col.alias(cs.name))
    if not spec.prune_additional:
        extra = [F.col(c) for c in df.columns
                 if c not in {cs.name for cs in spec.columns}]
        declared.extend(extra)
    return df.select(*declared)


def _typed_null(target: str) -> Column:
    t = {
        "string": "string", "integer": "long", "number": "double",
        "boolean": "boolean", "passthrough": "string",
    }.get(target)
    if t is None and target.startswith("array"):
        t = target if "<" in target else "array<string>"
    return F.lit(None).cast(t or "string")
