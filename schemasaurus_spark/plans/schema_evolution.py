"""Schema-evolution checking between table snapshots.

A validation tier does not just check VALUES: the most common production
breakage is an upstream writer changing the SCHEMA mid-table (dropped
column, int→string, silently added required field). This module diffs two
Spark schemas recursively and classifies every change as safe or breaking
under Iceberg's published evolution rules (the storage layer the north
star targets): type changes are safe only for the lossless promotions
``int→long``, ``float→double``, and decimal precision widening at equal
scale; column adds are safe when nullable; drops, renames-in-place, other
type changes, and nullable→required tightenings are breaking.

Scale shape: ZERO data scans. Per-snapshot schemas come from the parquet
FOOTERS of each snapshot's ADDED files (`spark.read.parquet` schema
resolution — driver-side metadata, the same trick the lineage manifest
uses for record counts), and the diff itself is pure driver-side work over
field lists. Checking a 10^12-row table's schema history costs the same
as checking a 10-row table's.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

__all__ = ["SchemaChange", "schema_diff", "breaking_changes",
           "snapshot_schema_changes"]


@dataclass(frozen=True)
class SchemaChange:
    kind: str       # added | removed | type_changed | nullability_tightened
    column: str     # dotted path; [] = array element, {} = map value
    before: str | None
    after: str | None
    breaking: bool


def _safe_promotion(old: T.DataType, new: T.DataType) -> bool:
    """Iceberg's lossless type promotions (spec 'Schema Evolution')."""
    if isinstance(old, T.IntegerType) and isinstance(new, T.LongType):
        return True
    if isinstance(old, T.FloatType) and isinstance(new, T.DoubleType):
        return True
    if (isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType)
            and new.scale == old.scale and new.precision >= old.precision):
        return True
    return False


def _diff_type(path: str, old: T.DataType, new: T.DataType,
               out: list) -> None:
    if old == new:
        return
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        _diff_struct(path, old, new, out)
        return
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        _diff_type(f"{path}[]", old.elementType, new.elementType, out)
        return
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        if old.keyType != new.keyType:
            out.append(SchemaChange("type_changed", f"{path}{{key}}",
                                    old.keyType.simpleString(),
                                    new.keyType.simpleString(), True))
        _diff_type(f"{path}{{}}", old.valueType, new.valueType, out)
        return
    out.append(SchemaChange("type_changed", path, old.simpleString(),
                            new.simpleString(),
                            breaking=not _safe_promotion(old, new)))


def _diff_struct(prefix: str, old: T.StructType, new: T.StructType,
                 out: list) -> None:
    dot = f"{prefix}." if prefix else ""
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    for name, f in old_f.items():
        if name not in new_f:
            out.append(SchemaChange("removed", f"{dot}{name}",
                                    f.dataType.simpleString(), None, True))
    for name, f in new_f.items():
        if name not in old_f:
            # a new REQUIRED column can't be populated for existing rows
            out.append(SchemaChange("added", f"{dot}{name}", None,
                                    f.dataType.simpleString(),
                                    breaking=not f.nullable))
            continue
        o = old_f[name]
        _diff_type(f"{dot}{name}", o.dataType, f.dataType, out)
        if o.nullable and not f.nullable:
            out.append(SchemaChange("nullability_tightened", f"{dot}{name}",
                                    "nullable", "required", True))


def schema_diff(old: T.StructType, new: T.StructType) -> list[SchemaChange]:
    """Recursive field-by-name diff (structs, array elements, map
    key/value) — order changes are NOT changes (Spark resolves by name)."""
    out: list[SchemaChange] = []
    _diff_struct("", old, new, out)
    return out


def breaking_changes(changes: list[SchemaChange]) -> list[SchemaChange]:
    return [c for c in changes if c.breaking]


def snapshot_schema_changes(store, spark) -> list[tuple]:
    """Walk consecutive snapshots of a :class:`SnapshotStore` and diff the
    schemas of each snapshot's ADDED files (footer-only reads). Returns
    ``[(from_id, to_id, [SchemaChange, ...]), ...]`` for every pair whose
    schema changed — the check a validation job runs BEFORE trusting a
    merged read of the whole table."""
    snaps = store.snapshots()
    out = []
    prev_id, prev_schema = None, None
    for s in snaps:
        added = store.added_files(prev_id, s.id)
        if not added:
            prev_id = s.id
            continue
        schema = spark.read.parquet(*added).schema
        if prev_schema is not None:
            changes = schema_diff(prev_schema, schema)
            if changes:
                out.append((prev_id, s.id, changes))
        prev_id, prev_schema = s.id, schema
    return out
