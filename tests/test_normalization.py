"""Wire-value normalization (AbstractEventConverter.java:86-361 equivalents):
each Debezium semantic type's wire form must land as the right Spark value.
Mirrors the reference's type sweep (IcebergChangeConsumerTest.java:56-241,
JsonEventConverterTest decimal cases :66-285)."""

import base64
import datetime
import json

from pyspark.sql import types as T

from debezium_server_iceberg_spark.schema.converter import DebeziumSchemaConverter
from debezium_server_iceberg_spark.sources.debezium_json import (
    RAW_ENVELOPE_SCHEMA,
    infer_event_schema,
    parse_events,
)


def _envelope(fields: list[dict], payload: dict) -> dict:
    return {
        "destination": "d.t",
        "key": None,
        "value": json.dumps(
            {"schema": {"type": "struct", "fields": fields}, "payload": payload}
        ),
    }


def _roundtrip(spark, fields, payload, conv=None):
    ev = _envelope(fields, payload)
    inferred = infer_event_schema(ev["value"], None, conv or DebeziumSchemaConverter())
    df = parse_events(spark.createDataFrame([ev], RAW_ENVELOPE_SCHEMA), inferred)
    return inferred, df.collect()[0]


def test_temporal_wire_forms(spark):
    fields = [
        {"field": "d_days", "type": "int32", "name": "io.debezium.time.Date"},
        {"field": "d_iso", "type": "string", "name": "io.debezium.time.IsoDate"},
        {"field": "ts_ms", "type": "int64", "name": "io.debezium.time.Timestamp"},
        {"field": "ts_us", "type": "int64", "name": "io.debezium.time.MicroTimestamp"},
        {"field": "ts_ns", "type": "int64", "name": "io.debezium.time.NanoTimestamp"},
        {"field": "ts_isos", "type": "string", "name": "io.debezium.time.IsoTimestamp"},
        {"field": "ts_z", "type": "string", "name": "io.debezium.time.ZonedTimestamp"},
    ]
    payload = {
        "d_days": 19723,                       # 2024-01-01
        "d_iso": "2024-01-02",
        "ts_ms": 1704153600123,                # 2024-01-02T00:00:00.123
        "ts_us": 1704153600123456,
        "ts_ns": 1704153600123456789,
        "ts_isos": "2024-01-02T03:04:05.678901",
        "ts_z": "2024-01-02T03:04:05.678901+02:00",
    }
    inferred, row = _roundtrip(spark, fields, payload)
    types = {f.name: f.dataType for f in inferred.struct.fields}
    assert types["d_days"] == T.DateType() and types["d_iso"] == T.DateType()
    assert types["ts_ms"] == T.TimestampNTZType()
    assert types["ts_z"] == T.TimestampType()
    assert row["d_days"] == datetime.date(2024, 1, 1)
    assert row["d_iso"] == datetime.date(2024, 1, 2)
    assert row["ts_ms"] == datetime.datetime(2024, 1, 2, 0, 0, 0, 123000)
    assert row["ts_us"] == datetime.datetime(2024, 1, 2, 0, 0, 0, 123456)
    assert row["ts_ns"] == datetime.datetime(2024, 1, 2, 0, 0, 0, 123456)  # ns -> µs
    assert row["ts_isos"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 678901)
    # zoned: stored tz-aware, session tz UTC -> 01:04 UTC wall clock
    assert row["ts_z"] == datetime.datetime(2024, 1, 2, 1, 4, 5, 678901)


def test_ts_ms_metadata_columns_forced_timestamptz(spark):
    fields = [
        {"field": "id", "type": "int64"},
        {"field": "__ts_ms", "type": "int64"},
        {"field": "__source_ts_ms", "type": "int64"},
    ]
    inferred, row = _roundtrip(
        spark, fields, {"id": 1, "__ts_ms": 1704153600000, "__source_ts_ms": 1704153600000}
    )
    types = {f.name: f.dataType for f in inferred.struct.fields}
    assert types["__ts_ms"] == T.TimestampType()
    assert types["__source_ts_ms"] == T.TimestampType()
    assert row["__ts_ms"] == datetime.datetime(2024, 1, 2, 0, 0)


def test_decimal_wire_forms_string_and_base64(spark):
    dec_field = {
        "field": "amount",
        "type": "bytes",
        "name": "org.apache.kafka.connect.data.Decimal",
        "parameters": {"scale": "2", "connect.decimal.precision": "10"},
    }
    conv = DebeziumSchemaConverter(decimal_handling_mode="precise")
    # plain number-string wire form
    inferred, row = _roundtrip(spark, [dec_field], {"amount": "1234.56"}, conv)
    assert inferred.struct["amount"].dataType == T.DecimalType(10, 2)
    assert str(row["amount"]) == "1234.56"
    # base64 two's-complement bytes wire form: 123456 scale 2 -> 1234.56
    b64 = base64.b64encode((123456).to_bytes(3, "big", signed=True)).decode()
    _, row2 = _roundtrip(spark, [dec_field], {"amount": b64}, conv)
    assert str(row2["amount"]) == "1234.56"


def test_decimal_double_mode_default(spark):
    dec_field = {
        "field": "amount",
        "type": "bytes",
        "name": "org.apache.kafka.connect.data.Decimal",
        "parameters": {"scale": "2", "connect.decimal.precision": "10"},
    }
    inferred, row = _roundtrip(spark, [dec_field], {"amount": "99.50"})
    assert inferred.struct["amount"].dataType == T.DoubleType()
    assert row["amount"] == 99.5


def test_binary_and_uuid_wire_forms(spark):
    fields = [
        {"field": "blob", "type": "bytes"},
        {"field": "uid", "type": "string", "name": "io.debezium.data.Uuid"},
    ]
    raw = b"\x01\x02\xff"
    payload = {
        "blob": base64.b64encode(raw).decode(),
        "uid": "0189aa6b-1111-7abc-8def-0123456789ab",
    }
    inferred, row = _roundtrip(spark, fields, payload)
    assert inferred.struct["blob"].dataType == T.BinaryType()
    assert bytes(row["blob"]) == raw
    # UUID: canonical string carrier (documented divergence, SURVEY §7)
    assert inferred.struct["uid"].dataType == T.StringType()
    assert row["uid"] == payload["uid"]


def test_time_types_stay_raw(spark):
    fields = [
        {"field": "t_us", "type": "int64", "name": "io.debezium.time.MicroTime"},
        {"field": "t_z", "type": "string", "name": "io.debezium.time.ZonedTime"},
    ]
    inferred, row = _roundtrip(
        spark, fields, {"t_us": 3723000000, "t_z": "01:02:03Z"}
    )
    # the reference itself disables TIME: long/string carriers
    assert inferred.struct["t_us"].dataType == T.LongType()
    assert inferred.struct["t_z"].dataType == T.StringType()
    assert row["t_us"] == 3723000000 and row["t_z"] == "01:02:03Z"


def test_map_type_hstore_roundtrip(spark):
    """hstore-style map field (IcebergChangeConsumerTest hstore coverage):
    map<string,string> schema conversion + columnar parse."""
    fields = [
        {"field": "id", "type": "int64"},
        {
            "field": "attrs",
            "type": "map",
            "keys": {"type": "string"},
            "values": {"type": "string"},
        },
    ]
    inferred, row = _roundtrip(
        spark, fields, {"id": 1, "attrs": {"color": "red", "size": "xl"}}
    )
    assert inferred.struct["attrs"].dataType == T.MapType(
        T.StringType(), T.StringType(), True
    )
    assert row["attrs"] == {"color": "red", "size": "xl"}


def test_map_with_struct_key_rejected(spark):
    import pytest

    from debezium_server_iceberg_spark.schema.converter import (
        SchemaConversionError,
    )

    fields = [
        {
            "field": "bad",
            "type": "map",
            "keys": {"type": "struct", "fields": []},
            "values": {"type": "string"},
        }
    ]
    ev = _envelope(fields, {})
    with pytest.raises(SchemaConversionError, match="primitive"):
        infer_event_schema(ev["value"], None, DebeziumSchemaConverter())
