"""Partition-spec evolution: metadata-only change, mixed-layout tables.

Iceberg semantics (public spec): evolving the partition spec never rewrites
data — old files keep the layout and manifest partition values they were
written with; new writes use the new spec; planners must treat old-spec
files as unprunable under the new spec; rewrite (compact) migrates them.
"""

import datetime

import pytest
from pyspark.sql import functions as F, types as T

from debezium_server_iceberg_spark.lakehouse import LakeCatalog
from debezium_server_iceberg_spark.operators.merge import merge_into

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

TS1 = datetime.datetime(2024, 1, 15, 10, 0, 0)
TS2 = datetime.datetime(2024, 2, 20, 11, 0, 0)


def test_spec_evolution_mixed_layout_read(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "ev1", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a", TS1)], SCHEMA))
    assert t.metadata().partition_spec == []
    t.update_partition_spec("month(ts)")
    assert [p.name for p in t.metadata().partition_spec] == ["_p_month_ts"]
    t.append(spark.createDataFrame([(2, "b", TS2)], SCHEMA))
    # both layouts scan together
    assert sorted(r.id for r in t.to_df(spark).collect()) == [1, 2]
    parts = {f.path: f.partition for f in t.current_files()}
    vals = sorted(str(p) for p in parts.values())
    assert any("_p_month_ts" in str(p) for p in parts.values())
    assert any(p == {} for p in parts.values()), vals  # old file: old (empty) spec


def test_merge_updates_key_in_old_spec_file(spark, warehouse):
    # old-spec file is unprunable under the new spec: a copy-on-write merge
    # must still find and update a key that lives in it
    t = LakeCatalog(warehouse).create_table(
        "ns", "ev2", SCHEMA, identifier_fields=["id"],
        partition_spec="bucket(2, id)",
    )
    t.append(spark.createDataFrame([(1, "a", TS1), (2, "b", TS1)], SCHEMA))
    t.update_partition_spec("month(ts)")
    src = spark.createDataFrame(
        [(1, "A", TS2, "u")],
        T.StructType(SCHEMA.fields + [T.StructField("__op", T.StringType(), True)]),
    )
    merge_into(t, src, mode="copy-on-write")
    rows = {r.id: r.name for r in t.to_df(spark).collect()}
    assert rows == {1: "A", 2: "b"}  # updated in place, no duplicate key


def test_compact_migrates_old_files_to_current_spec(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "ev3", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a", TS1)], SCHEMA))
    t.append(spark.createDataFrame([(2, "b", TS2)], SCHEMA))
    t.update_partition_spec("month(ts)")
    assert t.compact(spark, min_input_files=2) == 2
    parts = [f.partition for f in t.current_files()]
    assert parts and all("_p_month_ts" in p for p in parts)
    assert {p["_p_month_ts"] for p in parts} == {"2024-01", "2024-02"}
    assert sorted(r.id for r in t.to_df(spark).collect()) == [1, 2]


def test_spec_evolution_validates_columns(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "ev4", SCHEMA)
    with pytest.raises(Exception, match="not in schema"):
        t.update_partition_spec("month(nope)")
