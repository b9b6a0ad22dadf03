"""End-to-end soak: the sf0.001 orders table streamed through the full
consumer as three CDC waves (snapshot / updates / deletes), final table
checked against an independently computed expected state."""

import json

from pyspark.sql import functions as F

from debezium_server_iceberg_spark.config import EngineConfig
from debezium_server_iceberg_spark.sources.debezium_json import RAW_ENVELOPE_SCHEMA
from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer

SF = "/root/testdata/sf0.001"
DEST = "srv.public.orders"


def _wave(spark, orders, op, ts, keys_pred=None, price_mult=1.0):
    src = orders if keys_pred is None else orders.filter(keys_pred)
    value = F.to_json(
        F.struct(
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            (F.col("o_totalprice") * price_mult).alias("o_totalprice"),
            F.lit(op).alias("__op"),
            F.lit(ts).alias("__source_ts_ms"),
        )
    )
    schema_doc = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"field": "o_orderkey", "type": "int64", "optional": False},
                {"field": "o_orderstatus", "type": "string"},
                {"field": "o_totalprice", "type": "double"},
                {"field": "__op", "type": "string"},
                {"field": "__source_ts_ms", "type": "int64"},
            ],
        }
    )
    key_doc = json.dumps(
        {"type": "struct", "fields": [{"field": "o_orderkey", "type": "int64", "optional": False}]}
    )
    return src.select(
        F.lit(DEST).alias("destination"),
        F.concat(
            F.lit('{"schema":' + key_doc + ',"payload":'),
            F.to_json(F.struct(F.col("o_orderkey"))),
            F.lit("}"),
        ).alias("key"),
        F.concat(
            F.lit('{"schema":' + schema_doc + ',"payload":'), value, F.lit("}")
        ).alias("value"),
    )


def test_full_cdc_soak_three_waves(spark, warehouse):
    cfg = EngineConfig()
    cfg.iceberg.warehouse = warehouse
    cfg.iceberg.upsert_dedup_column = "__source_ts_ms"
    c = ChangeConsumer(cfg)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_orders = orders.count()

    df = lambda w: spark.createDataFrame(w.collect(), RAW_ENVELOPE_SCHEMA)  # noqa: E731
    c.handle_batch(df(_wave(spark, orders, "r", 0)), epoch_id=0)
    c.handle_batch(
        df(_wave(spark, orders, "u", 1, F.col("o_orderkey") % 7 == 0, price_mult=1.25)),
        epoch_id=1,
    )
    c.handle_batch(
        df(_wave(spark, orders, "d", 2, F.col("o_orderkey") % 11 == 0)), epoch_id=2
    )

    table = c.table_df(spark, "srv_public_orders")
    # keep-deletes (default): deleted keys survive flagged __op='d'
    assert table.count() == n_orders
    live = table.filter(F.col("__op") != "d")
    dead = table.filter(F.col("__op") == "d")
    expect_dead = orders.filter(F.col("o_orderkey") % 11 == 0).count()
    assert dead.count() == expect_dead

    # updated rows carry the 1.25x price; untouched rows the original
    joined = table.alias("t").join(
        orders.alias("o"), F.col("t.o_orderkey") == F.col("o.o_orderkey")
    )
    mism = joined.filter(
        (
            (F.col("t.o_orderkey") % 7 == 0)
            & (F.col("t.o_orderkey") % 11 != 0)
            & (
                F.abs(F.col("t.o_totalprice") - F.col("o.o_totalprice") * 1.25)
                > 1e-6
            )
        )
        | (
            (F.col("t.o_orderkey") % 7 != 0)
            & (F.col("t.o_orderkey") % 11 != 0)
            & (F.abs(F.col("t.o_totalprice") - F.col("o.o_totalprice")) > 1e-6)
        )
    )
    assert mism.count() == 0
    assert live.count() == n_orders - expect_dead
