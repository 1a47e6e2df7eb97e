"""schemasaurus_spark — a from-scratch PySpark-native schema + constraint
validation engine.

Re-expresses the core idea of the reference (AlexeyGrishin/schemasaurus:
compile a JSON-Schema once into a specialized straight-line validator,
``/root/reference/src/compiler.js:194-211``) as: compile a declarative
constraint DSL once into Catalyst ``Column`` expression trees (and, only for
the ``conform`` escape hatch, vectorized Arrow pandas UDFs), so per-row work
is whole-stage-codegen'd JVM code — never per-row Python.

Public API::

    from schemasaurus_spark import Suite, compile_suite, validate
    suite = Suite(id_column="doc_id", columns={...}, row=[...])
    result = validate(df, suite)          # -> ValidationResult
    result.violations()                   # (doc_id, constraint_id, column, value, arg, message)
    result.verdicts()                     # per-partition (partition_id, n_rows, n_violations, pass)
"""

from schemasaurus_spark.dsl import (
    AllOf,
    AnyOf,
    Conform,
    Dependency,
    Enum,
    ExclusiveMaximum,
    ExclusiveMinimum,
    Format,
    MaxItems,
    MaxLength,
    Maximum,
    MinItems,
    MinLength,
    Minimum,
    Items,
    KeyPattern,
    MaxProperties,
    MinProperties,
    MultipleOf,
    Not,
    NotNull,
    OneOf,
    Pattern,
    Ref,
    Suite,
    TupleItems,
    TypeIs,
    UniqueItems,
    register_constraint,
)
from schemasaurus_spark.compiler import compile_suite, ValidationPlan
from schemasaurus_spark.validate import validate, ValidationResult, make_value_validator
from schemasaurus_spark.engine import AggregateChecks, run_full_validation
from schemasaurus_spark.normalizer import NormalizerSpec, col_spec, normalize
from schemasaurus_spark.schema_json import suite_from_json_schema, suite_to_json_schema
from schemasaurus_spark.profiler import suggest_suite, SuggestResult

__all__ = [
    "AllOf", "AnyOf", "Conform", "Dependency", "Enum",
    "ExclusiveMaximum", "ExclusiveMinimum", "Format", "MaxItems",
    "MaxLength", "Maximum", "MinItems", "MinLength", "Minimum",
    "Items", "KeyPattern", "MaxProperties", "MinProperties",
    "MultipleOf", "Not", "NotNull", "OneOf", "Pattern", "Ref", "Suite",
    "TupleItems", "TypeIs", "UniqueItems", "register_constraint",
    "compile_suite", "ValidationPlan", "validate", "ValidationResult", "make_value_validator",
    "suggest_suite", "SuggestResult",
    "AggregateChecks", "run_full_validation",
    "NormalizerSpec", "col_spec", "normalize",
    "suite_from_json_schema", "suite_to_json_schema",
]

__version__ = "0.1.0"
