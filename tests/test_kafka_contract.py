"""Kafka transport contract (S1): a DataFrame with Kafka's wire schema maps
through ``kafka_to_envelope`` into exactly the raw-envelope shape
``handle_batch`` consumes — proving the documented selectExpr mapping with a
synthesized source (the connector jar itself isn't present here)."""

import json

from pyspark.sql import types as T

from debezium_server_iceberg_spark.sources.debezium_json import (
    RAW_ENVELOPE_SCHEMA,
    kafka_to_envelope,
)

# the Kafka source schema as the spark-sql-kafka connector emits it
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def _envelope(payload: dict, fields: list[dict]) -> bytes:
    return json.dumps(
        {"schema": {"type": "struct", "fields": fields}, "payload": payload}
    ).encode()


def test_kafka_wire_maps_to_envelope_and_ingests(spark, tmp_path):
    vfields = [
        {"field": "id", "type": "int32", "optional": False},
        {"field": "name", "type": "string", "optional": True},
        {"field": "__op", "type": "string", "optional": True},
        {"field": "__source_ts_ms", "type": "int64", "optional": True},
    ]
    kfields = [{"field": "id", "type": "int32", "optional": False}]

    import datetime as dt

    def krow(topic, id_, name, op, offset):
        return (
            _envelope({"id": id_}, kfields),
            _envelope(
                {"id": id_, "name": name, "__op": op, "__source_ts_ms": 1000 + offset},
                vfields,
            ),
            topic,
            0,
            offset,
            dt.datetime(2024, 1, 1),
            0,
        )

    kafka_df = spark.createDataFrame(
        [
            krow("srv.db.users", 1, "alice", "c", 0),
            krow("srv.db.users", 2, "bob", "c", 1),
            # a heartbeat topic row and a null-value tombstone must survive
            # the mapping (filtered downstream, not here)
            (None, None, "__debezium-heartbeat.srv", 0, 2, dt.datetime(2024, 1, 1), 0),
        ],
        KAFKA_WIRE_SCHEMA,
    )

    raw = kafka_to_envelope(kafka_df)
    # exact contract: same column names, all strings, destination first
    assert [f.name for f in raw.schema.fields] == [f.name for f in RAW_ENVELOPE_SCHEMA.fields]
    assert all(isinstance(f.dataType, T.StringType) for f in raw.schema.fields)

    # and the mapped rows feed the real consumer end to end
    from debezium_server_iceberg_spark.config import EngineConfig
    from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer

    cfg = EngineConfig()
    cfg.iceberg.warehouse = str(tmp_path / "wh")
    cfg.iceberg.upsert = True
    cfg.iceberg.upsert_dedup_column = "__source_ts_ms"
    cfg.debezium.heartbeat_prefix = "__debezium-heartbeat"
    consumer = ChangeConsumer(cfg)
    result = consumer.handle_batch(raw)

    # the heartbeat topic never becomes a table
    assert result.tables_written == {"srv.db.users": 2}
    got = {r["id"]: r["name"] for r in consumer.table_df(spark, "srv_db_users").collect()}
    assert got == {1: "alice", 2: "bob"}
