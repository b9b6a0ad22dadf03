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


import random as _random

import pytest as _pytest


@_pytest.mark.parametrize("fv", ["2", "3"])
@_pytest.mark.parametrize("seed", [11, 47])
def test_random_batch_lifecycle_matches_model(spark, tmp_path, fv, seed):
    """Model-based soak: random CDC batch sequences applied through the
    real merge path (v2 equality / v3 position deletes) with compaction
    and delete-materialization mixed in must equal a plain dict replay of
    upsert/delete semantics; on v3 the row-id uniqueness invariant must
    hold throughout."""
    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.lakehouse.table import (
        ROW_ID_COL,
        LakeTable,
    )
    from debezium_server_iceberg_spark.operators.dedup import dedup_batch
    from debezium_server_iceberg_spark.operators.merge import merge_into

    rng = _random.Random(seed)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    t = LakeTable.create(
        str(tmp_path / f"t{fv}"), schema, identifier_fields=["id"],
        properties={"format-version": fv},
    )
    model: dict[int, str] = {}
    for batch_no in range(5):
        rows = []
        for i in range(rng.randint(1, 12)):
            key = rng.randint(0, 15)
            op = rng.choice(["c", "u", "u", "d"])
            val = f"b{batch_no}v{i}"
            rows.append((key, val, op, batch_no * 100 + i))
        src = spark.createDataFrame(
            rows, "id long, val string, __op string, __source_ts_ms long"
        )
        deduped = dedup_batch(src, ["id"], dedup_column="__source_ts_ms")
        merge_into(t, deduped, keep_deletes=False)
        # replay the same semantics on the model: last event per key wins
        last = {}
        for key, val, op, ts in rows:
            if key not in last or ts >= last[key][2]:
                last[key] = (val, op, ts)
        for key, (val, op, _) in last.items():
            if op == "d":
                model.pop(key, None)
            else:
                model[key] = val
        if batch_no == 2:
            t.compact(spark, target_file_bytes=512 * 1024 * 1024, min_input_files=2)
        if batch_no == 3:
            t.materialize_deletes(spark)
        got = {r.id: r.val for r in t.to_df(spark).collect()}
        assert got == model, f"batch {batch_no} diverged"
        if fv == "3":
            ids = [r[ROW_ID_COL] for r in t.to_df(spark, lineage=True).collect()]
            assert len(ids) == len(set(ids)) and None not in ids
