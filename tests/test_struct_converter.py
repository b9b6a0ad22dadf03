"""Connect-Struct format path (S3): schema translation + typed-value events.

Ports the shape of the reference's StructEventConverterTest.java /
StructSchemaConverterTest.java cases (the DEBEZIUM_FORMAT_VALUE=connect half
of the format matrix) onto the PySpark engine."""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from debezium_server_iceberg_spark.schema.converter import (
    DebeziumSchemaConverter,
    SchemaConversionError,
)
from debezium_server_iceberg_spark.sources.connect_struct import (
    ConnectSchema as CS,
    StructEvent,
    StructSchemaConverter,
    parse_struct_events,
    struct_events_to_df,
)

DEST = "test.inventory.customers"


def _value_schema() -> CS:
    """The full type-matrix value schema of StructEventConverterTest.setUp
    (StructEventConverterTest.java:120-162)."""
    nested = CS.struct(
        [("nested_str", CS.primitive("string", optional=False)),
         ("nested_long", CS.primitive("int64", optional=False))],
        name="Nested",
    )
    return CS.struct(
        [
            ("id", CS.primitive("int32", optional=False)),
            ("col_int", CS.primitive("int32")),
            ("col_long", CS.primitive("int64")),
            ("col_float", CS.primitive("float32")),
            ("col_double", CS.primitive("float64")),
            ("col_bool", CS.primitive("boolean")),
            ("col_string", CS.primitive("string")),
            ("col_bytes", CS.primitive("bytes")),
            ("col_decimal", CS.primitive(
                "bytes", name="org.apache.kafka.connect.data.Decimal",
                parameters={"scale": "2", "connect.decimal.precision": "6"})),
            ("col_uuid", CS.primitive("string", name="io.debezium.data.Uuid")),
            ("col_date", CS.primitive("int32", name="io.debezium.time.Date")),
            ("col_time_micros", CS.primitive("int64", name="io.debezium.time.MicroTime")),
            ("col_ts_micros", CS.primitive("int64", name="io.debezium.time.MicroTimestamp")),
            ("col_ts_zoned", CS.primitive("string", name="io.debezium.time.ZonedTimestamp")),
            ("col_list", CS.array(CS.primitive("string"))),
            ("col_map", CS.map(CS.primitive("string"), CS.primitive("int32"))),
            ("col_struct", nested),
            ("__op", CS.primitive("string", optional=False)),
            ("__ts_ms", CS.primitive("int64", optional=False)),
        ],
        name="Value",
    )


def _key_schema() -> CS:
    return CS.struct([("id", CS.primitive("int32", optional=False))], name="Key")


def test_struct_schema_full_type_matrix():
    """Each Connect/logical type lands on the documented Spark type
    (StructSchemaConverter.java:330-438 mapping; TIME disabled -> long,
    UUID -> string, __ts_ms int64 forced to timestamptz)."""
    conv = DebeziumSchemaConverter(decimal_handling_mode="precise")
    inferred = StructSchemaConverter(conv).convert(_value_schema(), _key_schema())
    by_name = {f.name: f for f in inferred.struct.fields}

    assert inferred.key_fields == ["id"]
    assert by_name["id"].dataType == T.IntegerType() and not by_name["id"].nullable
    assert by_name["col_int"].dataType == T.IntegerType()
    assert by_name["col_long"].dataType == T.LongType()
    assert by_name["col_float"].dataType == T.FloatType()
    assert by_name["col_double"].dataType == T.DoubleType()
    assert by_name["col_bool"].dataType == T.BooleanType()
    assert by_name["col_string"].dataType == T.StringType()
    assert by_name["col_bytes"].dataType == T.BinaryType()
    assert by_name["col_decimal"].dataType == T.DecimalType(6, 2)
    assert by_name["col_uuid"].dataType == T.StringType()  # no UUID in Spark
    assert by_name["col_date"].dataType == T.DateType()
    assert by_name["col_time_micros"].dataType == T.LongType()  # TIME disabled
    assert by_name["col_ts_micros"].dataType == T.TimestampNTZType()
    assert by_name["col_ts_zoned"].dataType == T.TimestampType()
    assert by_name["col_list"].dataType == T.ArrayType(T.StringType(), True)
    assert by_name["col_map"].dataType == T.MapType(T.StringType(), T.IntegerType(), True)
    assert by_name["col_struct"].dataType == T.StructType(
        [T.StructField("nested_str", T.StringType(), True),
         T.StructField("nested_long", T.LongType(), True)]
    )
    assert by_name["__op"].dataType == T.StringType()
    assert by_name["__ts_ms"].dataType == T.TimestampType()  # forced tz


def _event(op: str, id_: int = 1) -> StructEvent:
    value = {
        "id": id_,
        "col_int": 123,
        "col_long": 456,
        "col_float": 12.34,
        "col_double": 56.78,
        "col_bool": True,
        "col_string": "hello world",
        "col_bytes": b"\x01\x02\x03",
        "col_decimal": Decimal("1234.56"),
        "col_uuid": "a3b8f4e2-0000-4000-8000-000000000001",
        "col_date": dt.date(2022, 5, 6),  # typed date -> int days on the wire
        "col_time_micros": 45789000000,
        "col_ts_micros": dt.datetime(2022, 5, 6, 12, 43, 9, tzinfo=dt.timezone.utc),
        "col_ts_zoned": "2022-05-06T14:43:09+02:00",
        "col_list": ["item1", "item2"],
        "col_map": {"key1": 1, "key2": 2},
        "col_struct": {"nested_str": "nested_string", "nested_long": 999},
        "__op": op,
        "__ts_ms": dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc),
    }
    return StructEvent(DEST, {"id": id_}, value, _key_schema(), _value_schema())


def test_struct_insert_event_values(spark):
    """Typed struct values survive wire serialization + columnar parse with
    the documented conversions (ports testConvertInsertEvent)."""
    conv = DebeziumSchemaConverter(decimal_handling_mode="precise")
    typed, inferred = parse_struct_events(spark, [_event("c")], conv)
    row = typed.collect()[0]

    assert row["id"] == 1
    assert row["col_int"] == 123 and row["col_long"] == 456
    assert row["col_bool"] is True and row["col_string"] == "hello world"
    assert bytes(row["col_bytes"]) == b"\x01\x02\x03"
    assert row["col_decimal"] == Decimal("1234.56")
    assert row["col_date"] == dt.date(2022, 5, 6)
    assert row["col_time_micros"] == 45789000000  # TIME stays long
    assert row["col_ts_micros"] == dt.datetime(2022, 5, 6, 12, 43, 9)
    # zoned ISO string with +02:00 offset -> same instant in UTC
    assert row["col_ts_zoned"] == dt.datetime(2022, 5, 6, 12, 43, 9)
    assert row["col_list"] == ["item1", "item2"]
    assert row["col_map"] == {"key1": 1, "key2": 2}
    assert row["col_struct"]["nested_str"] == "nested_string"
    assert row["col_struct"]["nested_long"] == 999
    assert row["__op"] == "c"


def test_struct_delete_event_flows(spark):
    """Delete events keep key + op through the same path
    (ports testConvertDeleteEvent)."""
    typed, _ = parse_struct_events(spark, [_event("c", 1), _event("d", 2)])
    ops = {r["id"]: r["__op"] for r in typed.collect()}
    assert ops == {1: "c", 2: "d"}


def test_struct_map_array_pk_rejected():
    """Map/array identifier fields are rejected exactly as in the JSON path
    (StructSchemaConverter.java:131-175)."""
    vschema = CS.struct(
        [("m", CS.map(CS.primitive("string"), CS.primitive("int32"))),
         ("__op", CS.primitive("string"))]
    )
    kschema = CS.struct([("m", CS.map(CS.primitive("string"), CS.primitive("int32")))])
    with pytest.raises(SchemaConversionError):
        StructSchemaConverter().convert(vschema, kschema)


def test_struct_events_upsert_through_consumer(spark, tmp_path):
    """The struct adapter's output is a drop-in handle_batch input: upsert a
    batch, then a second batch updating one key and deleting another — the
    connect half of IcebergChangeConsumerUpsertTest."""
    from debezium_server_iceberg_spark.config import EngineConfig
    from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer

    schema = CS.struct(
        [("id", CS.primitive("int32", optional=False)),
         ("name", CS.primitive("string")),
         ("__op", CS.primitive("string", optional=False)),
         ("__source_ts_ms", CS.primitive("int64", optional=False))],
    )
    key = CS.struct([("id", CS.primitive("int32", optional=False))])

    def ev(id_, name, op, ts):
        return StructEvent(
            "srv.db.users",
            {"id": id_},
            {"id": id_, "name": name, "__op": op, "__source_ts_ms": ts},
            key, schema,
        )

    cfg = EngineConfig()
    cfg.iceberg.warehouse = str(tmp_path / "wh")
    cfg.iceberg.upsert = True
    cfg.iceberg.upsert_keep_deletes = False
    cfg.iceberg.upsert_dedup_column = "__source_ts_ms"
    consumer = ChangeConsumer(cfg)

    b1 = [ev(1, "alice", "c", 100), ev(2, "bob", "c", 100), ev(3, "carol", "c", 100)]
    consumer.handle_batch(struct_events_to_df(spark, b1))
    b2 = [ev(2, "bobby", "u", 200), ev(3, None, "d", 200)]
    consumer.handle_batch(struct_events_to_df(spark, b2))

    got = {r["id"]: r["name"] for r in consumer.table_df(spark, "srv_db_users").collect()}
    assert got == {1: "alice", 2: "bobby"}
