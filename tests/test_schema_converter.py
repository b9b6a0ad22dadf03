"""Schema-converter unit tests (mirror of JsonEventConverterTest.java:66-285)."""

import pytest
from pyspark.sql import types as T

from debezium_server_iceberg_spark.schema.converter import (
    DebeziumSchemaConverter,
    SchemaConversionError,
)


def conv(**kw):
    return DebeziumSchemaConverter(**kw)


def struct(*fields):
    return {"type": "struct", "fields": list(fields)}


def f(name, ftype, sem=None, **extra):
    d = {"field": name, "type": ftype, "optional": True}
    if sem:
        d["name"] = sem
    d.update(extra)
    return d


def test_primitive_mapping():
    s = conv().convert(
        struct(
            f("a", "int8"),
            f("b", "int16"),
            f("c", "int32"),
            f("d", "int64"),
            f("e", "float32"),
            f("g", "float64"),
            f("h", "boolean"),
            f("i", "string"),
            f("j", "bytes"),
        )
    )
    got = {x.name: x.dataType for x in s.struct.fields}
    assert got == {
        "a": T.IntegerType(),
        "b": T.IntegerType(),
        "c": T.IntegerType(),
        "d": T.LongType(),
        "e": T.FloatType(),
        "g": T.DoubleType(),
        "h": T.BooleanType(),
        "i": T.StringType(),
        "j": T.BinaryType(),
    }


def test_semantic_types():
    s = conv().convert(
        struct(
            f("u", "string", "io.debezium.data.Uuid"),
            f("d1", "int32", "io.debezium.time.Date"),
            f("d2", "string", "io.debezium.time.IsoDate"),
            f("t1", "int64", "io.debezium.time.Timestamp"),
            f("t2", "int64", "io.debezium.time.MicroTimestamp"),
            f("t3", "string", "io.debezium.time.ZonedTimestamp"),
            f("t4", "string", "io.debezium.time.IsoTimestamp"),
        )
    )
    got = {x.name: x.dataType for x in s.struct.fields}
    assert got["u"] == T.StringType()
    assert got["d1"] == T.DateType()
    assert got["d2"] == T.DateType()
    assert got["t1"] == T.TimestampNTZType()
    assert got["t2"] == T.TimestampNTZType()
    assert got["t3"] == T.TimestampType()
    assert got["t4"] == T.TimestampNTZType()


def test_time_types_stay_raw():
    # reference deliberately disables TIME (JsonSchemaConverter.java:293-301)
    s = conv().convert(
        struct(
            f("mt", "int64", "io.debezium.time.MicroTime"),
            f("zt", "string", "io.debezium.time.ZonedTime"),
        )
    )
    got = {x.name: x.dataType for x in s.struct.fields}
    assert got["mt"] == T.LongType()
    assert got["zt"] == T.StringType()


def test_ts_ms_columns_forced_timestamptz():
    s = conv().convert(struct(f("__ts_ms", "int64"), f("__source_ts_ms", "int64"), f("other", "int64")))
    got = {x.name: x.dataType for x in s.struct.fields}
    assert got["__ts_ms"] == T.TimestampType()
    assert got["__source_ts_ms"] == T.TimestampType()
    assert got["other"] == T.LongType()


def test_decimal_modes():
    dec = f("d", "bytes", "org.apache.kafka.connect.data.Decimal",
            parameters={"scale": "2", "connect.decimal.precision": "10"})
    assert conv().convert(struct(dec)).struct.fields[0].dataType == T.DoubleType()
    got = conv(decimal_handling_mode="precise").convert(struct(dec)).struct.fields[0].dataType
    assert got == T.DecimalType(10, 2)
    # missing/invalid params -> default 38,10 (JsonSchemaConverter.java:353-384)
    dec2 = f("d", "bytes", "org.apache.kafka.connect.data.Decimal", parameters={})
    got2 = conv(decimal_handling_mode="precise").convert(struct(dec2)).struct.fields[0].dataType
    assert got2 == T.DecimalType(38, 10)


def test_nested_struct_array_map():
    s = conv().convert(
        struct(
            f("g", "struct", fields=[f("wkb", "bytes"), f("srid", "int32")]),
            f("arr", "array", items=f("item", "int32")),
            f("m", "map", keys=f("k", "string"), values=f("v", "string")),
            f("arr2", "array", items=f("item", "array", items=f("i", "string"))),
        )
    )
    got = {x.name: x.dataType for x in s.struct.fields}
    assert got["g"] == T.StructType(
        [T.StructField("wkb", T.BinaryType()), T.StructField("srid", T.IntegerType())]
    )
    assert got["arr"] == T.ArrayType(T.IntegerType())
    assert got["m"] == T.MapType(T.StringType(), T.StringType())
    assert got["arr2"] == T.ArrayType(T.ArrayType(T.StringType()))


def test_key_fields_required_and_extracted():
    key = struct(f("id", "int32"))
    val = struct(f("id", "int32"), f("name", "string"))
    s = conv().convert(val, key)
    assert s.key_fields == ["id"]
    by = {x.name: x for x in s.struct.fields}
    assert by["id"].nullable is False
    assert by["name"].nullable is True


def test_composite_key():
    key = struct(f("id", "int32"), f("first_name", "string"))
    val = struct(f("id", "int32"), f("first_name", "string"), f("x", "string"))
    s = conv().convert(val, key)
    assert s.key_fields == ["id", "first_name"]


def test_pk_on_map_rejected():
    key = struct(f("m", "map", keys=f("k", "string"), values=f("v", "string")))
    val = struct(f("m", "map", keys=f("k", "string"), values=f("v", "string")))
    with pytest.raises(SchemaConversionError):
        conv().convert(val, key)


def test_unnested_with_keys_rejected():
    # JsonSchemaConverter.java:240-253
    key = struct(f("id", "int32"))
    val = struct(f("before", "struct", fields=[f("id", "int32")]),
                 f("after", "struct", fields=[f("id", "int32")]),
                 f("source", "struct", fields=[f("db", "string")]),
                 f("id", "int32"))
    with pytest.raises(SchemaConversionError):
        conv().convert(val, key)


def test_excluded_columns():
    s = conv(excluded_columns=["secret"]).convert(struct(f("id", "int32"), f("secret", "string")))
    assert [x.name for x in s.struct.fields] == ["id"]


def test_preserve_required():
    val = struct({**f("a", "string"), "optional": False}, f("b", "string"))
    s_def = conv().convert(val)
    assert all(x.nullable for x in s_def.struct.fields)
    s_pres = conv(preserve_required_property=True).convert(val)
    by = {x.name: x.nullable for x in s_pres.struct.fields}
    assert by == {"a": False, "b": True}


def test_unknown_type_falls_to_string():
    s = conv().convert(struct(f("w", "weirdtype")))
    assert s.struct.fields[0].dataType == T.StringType()


def test_variant_json_string_fallback_carrier():
    """variant mode default is real VariantType; variant_as_json_string=True
    selects the legacy JSON-text carrier (for engines without parquet
    Variant support)."""
    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.schema.converter import (
        DebeziumSchemaConverter,
    )

    schema = {
        "type": "struct",
        "fields": [
            {"field": "id", "type": "int64"},
            {
                "field": "meta",
                "type": "struct",
                "fields": [{"field": "tag", "type": "string"}],
            },
        ],
    }
    native = DebeziumSchemaConverter(nested_as_variant=True).convert(schema)
    assert isinstance(native.struct["meta"].dataType, T.VariantType)
    assert native.semantics["meta"] == "variant"

    legacy = DebeziumSchemaConverter(
        nested_as_variant=True, variant_as_json_string=True
    ).convert(schema)
    assert isinstance(legacy.struct["meta"].dataType, T.StringType)
    assert legacy.semantics["meta"] == "variant_json"
