"""Schema evolution: union-by-name merge + type widening.

Spark-side equivalent of the reference's
``updateSchema().unionByNameWith(newSchema)`` flow
(IcebergTableOperator.java:136-151): diff the incoming batch schema against
the table schema, add new columns, widen types where safe, and report whether
anything actually changed (the reference commits only on real change,
IcebergTableOperator.java:143-150).
"""

from __future__ import annotations

from pyspark.sql import types as T

# safe widening lattice (documented semantics docs/iceberg.md:239-304:
# int->long, float->double, decimal precision growth)
_WIDEN: dict[tuple[str, str], T.DataType] = {
    ("integer", "long"): T.LongType(),
    ("float", "double"): T.DoubleType(),
}


class SchemaEvolutionError(ValueError):
    pass


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common widened type of a (table) and b (incoming)."""
    if a == b:
        return a
    ka, kb = a.typeName(), b.typeName()
    if (ka, kb) in _WIDEN:
        return _WIDEN[(ka, kb)]
    if (kb, ka) in _WIDEN:
        return _WIDEN[(kb, ka)]
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        integral = max(a.precision - a.scale, b.precision - b.scale)
        return T.DecimalType(min(38, integral + scale), scale)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        return merge_schemas(a, b)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType), True)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(
            _widen(a.keyType, b.keyType), _widen(a.valueType, b.valueType), True
        )
    raise SchemaEvolutionError(f"incompatible types {a} vs {b}")


def merge_schemas(table: T.StructType, incoming: T.StructType) -> T.StructType:
    """Union-by-name: table field order preserved, new fields appended.

    Matches Iceberg ``unionByNameWith`` semantics used by the reference:
    existing columns keep position, types widen, new columns are appended as
    optional.  Dropped source columns stay in the table (soft policy,
    docs/iceberg.md:254-262).
    """
    by_name = {f.name: f for f in incoming.fields}
    out: list[T.StructField] = []
    for f in table.fields:
        inc = by_name.pop(f.name, None)
        if inc is None:
            out.append(f)
        else:
            out.append(T.StructField(f.name, _widen(f.dataType, inc.dataType), f.nullable))
    for f in incoming.fields:
        if f.name in by_name:  # genuinely new, keep incoming order
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


def schema_added_fields(table: T.StructType, incoming: T.StructType) -> list[str]:
    existing = {f.name for f in table.fields}
    return [f.name for f in incoming.fields if f.name not in existing]


def schemas_equal(a: T.StructType, b: T.StructType) -> bool:
    return [(f.name, f.dataType) for f in a.fields] == [
        (f.name, f.dataType) for f in b.fields
    ]
