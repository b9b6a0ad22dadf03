"""On-disk layout versioning: the bucket-hash stamp and the write-timezone
declaration (ADVICE r8).

Bucket partition values are hash ordinals, so the hash function is part of
the physical layout; temporal partition values are wall-clock renderings,
so the timezone is too.  Tables stamp both at creation
(``engine.bucket-hash`` / ``engine.write-timezone``); planners and the
Iceberg exporter must refuse to interpret values written under a different
stamp instead of silently pruning/merging/exporting wrong.
"""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.lakehouse import LakeCatalog
from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
    export_iceberg_table,
    java_avro_records,
    read_iceberg_table,
)
from debezium_server_iceberg_spark.lakehouse.table import (
    BUCKET_HASH_PROP,
    WRITE_TZ_PROP,
    _engine_partition_value,
    _prune_files_by_filter,
    _tz_sensitive_fields,
    bucket_hash_trusted,
    table_write_tz,
)
from debezium_server_iceberg_spark.lakehouse.transforms import PartitionField
from debezium_server_iceberg_spark.operators.merge import merge_into


def _bucket_table(spark, tmp_path, n=40):
    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "id long, v string"
    )
    t = cat.create_table(
        "ns", "bt", df.schema, identifier_fields=["id"],
        partition_spec="bucket(4, id)",
    )
    t.append(df)
    return t


def test_create_stamps_layout_properties(spark, tmp_path):
    t = _bucket_table(spark, tmp_path)
    meta = t.metadata()
    assert meta.properties[BUCKET_HASH_PROP] == "murmur3"
    assert meta.properties[WRITE_TZ_PROP] == "UTC"
    assert bucket_hash_trusted(meta) and table_write_tz(meta) == "UTC"


def test_unstamped_bucket_fields_are_unprunable(spark, tmp_path):
    """A foreign (or missing) bucket-hash stamp means the on-disk bucket
    ordinals came from a different hash: recomputing murmur3 against them
    would prune files that DO contain matching keys.  Untrusted tables
    keep every file; results stay exact via the residual filter."""
    t = _bucket_table(spark, tmp_path)
    meta, files = t.metadata(), t.current_files()
    kept = _prune_files_by_filter(meta, files, {"id": 17})
    assert 0 < len(kept) < len(files)  # trusted stamp: pruning active

    t.update_properties(**{BUCKET_HASH_PROP: "xxhash64"})
    meta2 = t.metadata()
    assert not bucket_hash_trusted(meta2)
    assert _prune_files_by_filter(meta2, files, {"id": 17}) == files
    got = sorted(r["id"] for r in t.to_df(spark, row_filter={"id": 17}).collect())
    assert got == [17]


def test_merge_correct_on_unstamped_bucket_table(spark, tmp_path):
    """CoW merge partition pruning must not compare murmur3 values of
    source rows against foreign-hash path values: with the stamp removed
    the bucket field drops out of the pruning tuple, and the merge still
    lands every update exactly once."""
    t = _bucket_table(spark, tmp_path)
    t.update_properties(**{BUCKET_HASH_PROP: "xxhash64"})
    upd = spark.createDataFrame(
        [(7, "UPD", "u"), (23, "UPD", "u")], "id long, v string, __op string"
    )
    merge_into(t, upd, mode="copy-on-write")
    rows = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert len(rows) == 40 and rows[7] == "UPD" and rows[23] == "UPD"


def test_unstamped_bucket_table_exports_degraded(spark, tmp_path):
    """The exporter must not publish foreign-hash ordinals as Iceberg
    murmur3 bucket values — external engines would prune wrongly.  Files
    of an unstamped bucket table route to the unpartitioned-spec manifest
    (never pruned) and the chain read stays exact."""
    t = _bucket_table(spark, tmp_path, n=16)
    t.update_properties(**{BUCKET_HASH_PROP: "xxhash64"})
    dest = str(tmp_path / "pub")
    md = json.load(open(export_iceberg_table(t, dest)))
    list_recs = [json.loads(s) for s in java_avro_records(
        spark, md["snapshots"][-1]["manifest-list"])]
    unpart = [s["spec-id"] for s in md["partition-specs"] if not s["fields"]]
    assert unpart, "an unpartitioned spec id must back the degraded files"
    data_lists = [r for r in list_recs if r.get("content", 0) == 0]
    assert data_lists and all(
        r["partition_spec_id"] == unpart[0] for r in data_lists
    )
    got = sorted(r["id"] for r in read_iceberg_table(spark, dest).collect())
    assert got == list(range(16))


def test_temporal_write_refuses_foreign_session_tz(spark, tmp_path):
    """Temporal partition values are session-tz wall clocks; writing the
    same table under two zones would mix encodings in one directory tree.
    The write path refuses when the session timezone differs from the
    table's declared write timezone."""
    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1 + i % 3, 2, 6)) for i in range(6)],
        "id long, ts timestamp",
    )
    t = cat.create_table(
        "ns", "tt", df.schema, identifier_fields=["id"],
        partition_spec="month(ts)",
    )
    t.append(df)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="write timezone"):
            t.append(df)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    t.append(df.withColumn("id", F.col("id") + 100))  # same tz again: fine
    assert t.to_df(spark).count() == 12

    # date / timestamp_ntz sources are wall clocks already — tz-free
    df2 = spark.createDataFrame([(1, dt.date(2024, 1, 2))], "id long, d date")
    t2 = cat.create_table(
        "ns", "dt", df2.schema, identifier_fields=["id"],
        partition_spec="month(d)",
    )
    assert _tz_sensitive_fields(t2.metadata()) == []
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        t2.append(df2)  # must NOT raise
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert t2.to_df(spark).count() == 1


def test_engine_partition_value_timezones():
    """Filter instants resolve through the session timezone and render in
    the table's write timezone; DST-ambiguous/nonexistent wall clocks stay
    conservative (NotImplemented keeps the file)."""
    day = PartitionField("ts", "day")
    naive = dt.datetime(2024, 3, 9, 23, 30)
    # same zone both sides: wall clock passes through untouched
    assert _engine_partition_value(day, naive, "timestamp") == "2024-03-09"
    assert _engine_partition_value(
        day, naive, "timestamp", "America/New_York", "America/New_York"
    ) == "2024-03-09"
    # NY evening is already the next UTC day
    assert _engine_partition_value(
        day, naive, "timestamp", "America/New_York", "UTC"
    ) == "2024-03-10"
    # aware value: session tz irrelevant, renders in table tz
    aware = dt.datetime(2024, 3, 10, 1, 30, tzinfo=dt.timezone.utc)
    assert _engine_partition_value(
        day, aware, "timestamp", "America/New_York", "UTC"
    ) == "2024-03-10"
    # ntz columns: naive wall clock as stored, zones never apply
    assert _engine_partition_value(
        day, naive, "timestamp_ntz", "America/New_York", "UTC"
    ) == "2024-03-09"
    # DST spring-forward gap (2:30 never exists in NY on 2024-03-10)
    gap = dt.datetime(2024, 3, 10, 2, 30)
    assert _engine_partition_value(
        day, gap, "timestamp", "America/New_York", "UTC"
    ) is NotImplemented
    # DST fall-back ambiguity (1:30 happens twice in NY on 2024-11-03)
    amb = dt.datetime(2024, 11, 3, 1, 30)
    assert _engine_partition_value(
        day, amb, "timestamp", "America/New_York", "UTC"
    ) is NotImplemented

    # bucket on ltz timestamps hashes the INSTANT: a naive NY wall clock
    # and its UTC equivalent land in the same bucket
    b = PartitionField("ts", "bucket", 8)
    ny = dt.datetime(2024, 6, 1, 12, 0)
    utc_equiv = dt.datetime(2024, 6, 1, 16, 0)
    assert _engine_partition_value(
        b, ny, "timestamp", "America/New_York"
    ) == _engine_partition_value(b, utc_equiv, "timestamp", "UTC")


def test_nonutc_declared_tz_table_exports_degraded(spark, tmp_path):
    """Iceberg temporal transform values are defined on UTC; a table whose
    wall clocks render in another declared zone cannot export them
    faithfully — its files publish under the unpartitioned spec."""
    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1 + i % 3, 2, 6)) for i in range(6)],
        "id long, ts timestamp",
    )
    t = cat.create_table(
        "ns", "ny", df.schema, identifier_fields=["id"],
        partition_spec="month(ts)",
        properties={WRITE_TZ_PROP: "America/New_York"},
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        t.append(df)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    dest = str(tmp_path / "pub")
    md = json.load(open(export_iceberg_table(t, dest)))
    list_recs = [json.loads(s) for s in java_avro_records(
        spark, md["snapshots"][-1]["manifest-list"])]
    unpart = [s["spec-id"] for s in md["partition-specs"] if not s["fields"]]
    assert unpart and all(
        r["partition_spec_id"] == unpart[0]
        for r in list_recs if r.get("content", 0) == 0
    )
    got = sorted(r["id"] for r in read_iceberg_table(spark, dest).collect())
    assert got == list(range(6))
