"""Real Iceberg v2 metadata export: spec conformance + independent reads.

Validation layers (strongest available in this jar-less environment):
1. the Avro manifest/manifest-list files are decoded by the REAL Apache
   Avro Java library (org.apache.avro 1.12 on Spark's classpath) — a
   third-party, spec-authoritative byte-level check of our writer;
2. the exported table is re-read through the standard metadata chain only
   (version-hint -> metadata.json -> manifest list -> manifests -> parquet)
   and must equal the engine-native read;
3. metadata.json carries every TableMetadataV2 required field;
4. when a full external reader (pyiceberg) is ever present, it runs too.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.lakehouse import LakeCatalog
from debezium_server_iceberg_spark.lakehouse.avro_io import read_container
from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
    export_iceberg_table,
    iceberg_schema_to_spark,
    java_avro_records,
    read_iceberg_table,
    spark_schema_to_iceberg,
)


def _make_table(spark, warehouse, rows=25):
    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [
            (i, f"name{i}", float(i) * 1.5, i % 2 == 0)
            for i in range(rows)
        ],
        "id long, name string, score double, flag boolean",
    )
    t = cat.create_table("ice", "orders_mirror", df.schema, identifier_fields=["id"])
    t.append(df.filter("id < 10"))
    t.append(df.filter("id >= 10"))
    return t, df


def test_export_and_independent_metadata_chain_read(spark, warehouse, tmp_path):
    t, df = _make_table(spark, warehouse)
    dest = str(tmp_path / "iceberg_tbl")
    md_path = export_iceberg_table(t, dest)
    assert os.path.exists(md_path)

    got = read_iceberg_table(spark, dest)
    assert got.schema == df.schema
    assert sorted(r["id"] for r in got.collect()) == list(range(25))
    a = {r["id"]: (r["name"], r["score"], r["flag"]) for r in got.collect()}
    b = {r["id"]: (r["name"], r["score"], r["flag"]) for r in t.to_df(spark).collect()}
    assert a == b


def test_manifests_decode_with_real_apache_avro(spark, warehouse, tmp_path):
    """Layer 1: Apache Avro itself (Java, via py4j) parses our containers."""
    t, _ = _make_table(spark, warehouse)
    dest = str(tmp_path / "ice2")
    export_iceberg_table(t, dest)
    md = json.load(open(os.path.join(dest, "metadata", "v1.metadata.json")))
    snap = md["snapshots"][0]

    list_recs = java_avro_records(spark, snap["manifest-list"])
    assert len(list_recs) == 1
    parsed = json.loads(list_recs[0])
    assert parsed["added_files_count"] == 2
    assert parsed["added_rows_count"] == 25
    # the two engine commits keep DISTINCT sequence numbers (delete
    # applicability depends on this ordering); the snapshot sits at the max
    assert parsed["content"] == 0 and parsed["sequence_number"] == 2
    assert parsed["min_sequence_number"] == 1

    entry_recs = [json.loads(s) for s in java_avro_records(spark, parsed["manifest_path"])]
    assert len(entry_recs) == 2
    assert all(e["status"] == 1 for e in entry_recs)
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entry_recs)
    assert sum(e["data_file"]["record_count"] for e in entry_recs) == 25
    for e in entry_recs:
        assert os.path.exists(e["data_file"]["file_path"])
        assert e["data_file"]["file_size_in_bytes"] == os.path.getsize(
            e["data_file"]["file_path"]
        )

    # and our own reader agrees with Apache Avro's decode
    _, ours, meta = read_container(parsed["manifest_path"])
    assert meta["format-version"] == "2" and meta["content"] == "data"
    assert [e["data_file"]["file_path"] for e in ours] == [
        e["data_file"]["file_path"] for e in entry_recs
    ]


def test_metadata_json_has_v2_required_fields(spark, warehouse, tmp_path):
    t, _ = _make_table(spark, warehouse, rows=5)
    dest = str(tmp_path / "ice3")
    export_iceberg_table(t, dest)
    md = json.load(open(os.path.join(dest, "metadata", "v1.metadata.json")))
    for field in (
        "format-version", "table-uuid", "location", "last-sequence-number",
        "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
        "partition-specs", "default-spec-id", "last-partition-id",
        "sort-orders", "default-sort-order-id", "snapshots",
        "current-snapshot-id", "refs",
    ):
        assert field in md, field
    assert md["format-version"] == 2
    schema = md["schemas"][0]
    ids = [f["id"] for f in schema["fields"]]
    assert ids == sorted(set(ids))  # unique, ordered pre-assignment
    assert schema["identifier-field-ids"] == [1]  # id column
    # identifier fields must be required
    id_field = next(f for f in schema["fields"] if f["name"] == "id")
    assert id_field["required"] is True
    snap = md["snapshots"][0]
    assert snap["summary"]["operation"] == "append"
    assert os.path.exists(snap["manifest-list"])
    hint = open(os.path.join(dest, "metadata", "version-hint.text")).read()
    assert hint == "1"


def test_schema_conversion_roundtrip_nested():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("dec", T.DecimalType(18, 4), True),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("tag", T.StringType(), True),
                        T.StructField("rank", T.IntegerType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("arr", T.ArrayType(T.DoubleType(), True), True),
            T.StructField("kv", T.MapType(T.StringType(), T.LongType(), True), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("ts", T.TimestampNTZType(), True),
        ]
    )
    ice, last_id = spark_schema_to_iceberg(schema, ["id"])
    assert last_id >= 11  # nested ids allocated
    back = iceberg_schema_to_spark(ice)
    assert back == schema


@pytest.mark.parametrize("style", ["equality", "position"])
def test_export_mor_deletes_roundtrip(spark, warehouse, tmp_path, style):
    """Tables with outstanding merge-on-read delete files export them as a
    content=1 delete manifest (spec form: reserved field ids for position
    deletes, equality_ids for equality deletes) and the metadata-chain
    read applies them."""
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(6)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", f"mor_{style}", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame([(1, "u", "u")], "id long, v string, __op string")
    merge_into(t, upd, mode="merge-on-read", delete_style=style)
    assert t.current_deletes() and t.current_deletes()[0].content == style
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    assert got[1] == "u" and len(got) == 6
    # the superseded row must be delete-filtered, not just shadowed
    native = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert got == native


def test_export_delete_manifest_decodes_with_real_avro(spark, warehouse, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(6)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "mor_avro", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame([(2, "u", "u")], "id long, v string, __op string")
    merge_into(t, upd, mode="merge-on-read", delete_style="equality")
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    meta_dir = os.path.join(dest, "metadata")
    dm = [p for p in os.listdir(meta_dir) if p.endswith("-m1.avro")]
    assert len(dm) == 1
    recs = java_avro_records(spark, os.path.join(meta_dir, dm[0]))
    assert len(recs) == 1
    rec = json.loads(recs[0])
    assert rec["data_file"]["content"] == 2          # EQUALITY_DELETES
    assert rec["data_file"]["equality_ids"] == [1]   # id column's field id
    # position-delete parquet columns carry the spec's reserved field ids
    import pyarrow.parquet as pq

    eq_path = rec["data_file"]["file_path"]
    sch = pq.read_schema(eq_path)
    assert sch.field(0).metadata[b"PARQUET:field_id"] == b"1"


def test_export_same_commit_equality_delete_spares_new_data(spark, warehouse, tmp_path):
    """Engine sequence ordering survives the export: an equality delete
    from commit N must not remove data ADDED in commit N (strict
    data.seq < delete.seq), even though both export in one publish."""
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(4)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "mor_seq", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    # upsert of an EXISTING key: same commit writes the new row AND the
    # equality delete for it — the delete must only hit the old version
    upd = spark.createDataFrame([(0, "new", "u")], "id long, v string, __op string")
    merge_into(t, upd, mode="merge-on-read", delete_style="equality")
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    assert got == {0: "new", 1: "v1", 2: "v2", 3: "v3"}


def test_export_republish_carries_delete_files(spark, warehouse, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(5)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "mor_repub", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    merge_into(
        t,
        spark.createDataFrame([(1, "u1", "u")], "id long, v string, __op string"),
        mode="merge-on-read", delete_style="equality",
    )
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    # second engine commit, second publish: old delete file is EXISTING
    merge_into(
        t,
        spark.createDataFrame([(2, "u2", "u")], "id long, v string, __op string"),
        mode="merge-on-read", delete_style="equality",
    )
    export_iceberg_table(t, dest)
    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    assert got == {0: "v0", 1: "u1", 2: "u2", 3: "v3", 4: "v4"}
    # time travel to the first publish still applies only the first delete
    with open(os.path.join(dest, "metadata", "version-hint.text")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(dest, "metadata", f"v{v}.metadata.json")) as fh:
        doc = json.load(fh)
    first_snap = doc["snapshots"][0]["snapshot-id"]
    old = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest, first_snap).collect()}
    assert old[1] == "u1" and old[2] == "v2"


def test_export_refuses_unsupported_partition_source_type(spark, warehouse, tmp_path):
    """Transforms the spec can't express on a source type (truncate on a
    double) are refused with the degrade escape hatch named — never
    silently approximated.  Supported transforms export faithfully (see
    test_transform_partitioned_export_faithful)."""
    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame([(1, 2.5)], "id long, score double")
    t = cat.create_table(
        "ice", "part_t", df.schema, identifier_fields=["id"],
        partition_spec="truncate(2, score)",
    )
    t.append(df)
    with pytest.raises(ValueError, match="degrade_partitions"):
        export_iceberg_table(t, str(tmp_path / "x"))


def test_pyiceberg_reads_export_if_available(spark, warehouse, tmp_path):
    """Full third-party reader — runs only when pyiceberg is installed
    (absent in this container; the layer-1 Apache Avro check still runs)."""
    pyiceberg = pytest.importorskip("pyiceberg.table")
    t, _ = _make_table(spark, warehouse, rows=8)
    dest = str(tmp_path / "ice4")
    md_path = export_iceberg_table(t, dest)
    from pyiceberg.io.pyarrow import PyArrowFileIO

    tbl = pyiceberg.StaticTable.from_metadata(md_path, {"py-io-impl": PyArrowFileIO})
    assert tbl.scan().to_arrow().num_rows == 8


def test_consumer_publish_iceberg(spark, warehouse, tmp_path):
    """Consumer-level publish: upserted (MoR) table is materialized and
    exported; the metadata-chain read equals the engine-native read."""
    from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer
    from debezium_server_iceberg_spark.config import EngineConfig
    from tests.fixtures import make_event
    from debezium_server_iceberg_spark.sources.debezium_json import RAW_ENVELOPE_SCHEMA

    cfg = EngineConfig()
    cfg.iceberg.warehouse = warehouse
    c = ChangeConsumer(cfg)
    rows = [make_event("s.db.items", {"id": i, "v": f"v{i}"}, ["id"], "c", i) for i in range(8)]
    c.handle_batch(spark.createDataFrame(rows, RAW_ENVELOPE_SCHEMA), epoch_id=0)
    upd = [make_event("s.db.items", {"id": 3, "v": "updated"}, ["id"], "u", 99)]
    c.handle_batch(spark.createDataFrame(upd, RAW_ENVELOPE_SCHEMA), epoch_id=1)

    dest = str(tmp_path / "published")
    md = c.publish_iceberg(spark, "s_db_items", dest)
    assert md.endswith("v1.metadata.json")
    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    native = {r["id"]: r["v"] for r in c.table_df(spark, "s_db_items").collect()}
    assert got == native and got[3] == "updated" and len(got) == 8


def test_incremental_publish_appends_snapshots(spark, warehouse, tmp_path):
    """Re-publishing to the same dest mirrors Iceberg commit history:
    v2.metadata.json carries both snapshots, carried-over files are
    EXISTING at their original sequence number, time travel works, and
    the version hint flips only after the new metadata is complete."""
    cat = LakeCatalog(warehouse)
    df1 = spark.createDataFrame([(i, f"a{i}") for i in range(10)], "id long, v string")
    t = cat.create_table("ice", "inc", df1.schema, identifier_fields=["id"])
    t.append(df1)
    dest = str(tmp_path / "inc_tbl")
    export_iceberg_table(t, dest)

    df2 = spark.createDataFrame([(i, f"b{i}") for i in range(10, 16)], "id long, v string")
    t.append(df2)
    md2 = export_iceberg_table(t, dest)
    assert md2.endswith("v2.metadata.json")

    md = json.load(open(md2))
    assert len(md["snapshots"]) == 2
    s1, s2 = md["snapshots"]
    assert s2["sequence-number"] == 2 and md["last-sequence-number"] == 2
    assert s2["summary"]["operation"] == "append"
    assert int(s2["summary"]["added-records"]) == 6
    assert int(s2["summary"]["total-records"]) == 16
    assert md["table-uuid"] == json.load(
        open(os.path.join(dest, "metadata", "v1.metadata.json"))
    )["table-uuid"]
    assert md["metadata-log"][0]["metadata-file"].endswith("v1.metadata.json")

    # manifest-entry statuses: first publish's files EXISTING at seq 1
    list_recs = [json.loads(s) for s in java_avro_records(spark, s2["manifest-list"])]
    assert list_recs[0]["added_files_count"] >= 1
    assert list_recs[0]["existing_files_count"] >= 1
    entries = [
        json.loads(s)
        for s in java_avro_records(spark, list_recs[0]["manifest_path"])
    ]
    assert {e["status"] for e in entries} == {0, 1}
    assert all(
        e["sequence_number"] == 1 for e in entries if e["status"] == 0
    )

    # current read sees everything; time travel sees only publish 1
    assert read_iceberg_table(spark, dest).count() == 16
    assert read_iceberg_table(spark, dest, snapshot_id=s1["snapshot-id"]).count() == 10


def test_incremental_publish_after_rewrite_is_overwrite(spark, warehouse, tmp_path):
    """A compaction between publishes removes previously-live files; the
    next published snapshot must say 'overwrite', not 'append'."""
    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
    t = cat.create_table("ice", "inc_ow", df.schema, identifier_fields=["id"])
    t.append(df.filter("id < 10"))
    t.append(df.filter("id >= 10"))
    dest = str(tmp_path / "ow_tbl")
    export_iceberg_table(t, dest)
    assert t.compact(spark, min_input_files=2) >= 2
    md = json.load(open(export_iceberg_table(t, dest)))
    assert md["snapshots"][-1]["summary"]["operation"] == "overwrite"
    assert read_iceberg_table(spark, dest).count() == 20


def test_identity_partitioned_export(spark, warehouse, tmp_path):
    """Identity-partitioned tables export with typed per-file partition
    values in the manifests and a real partition-spec in the metadata;
    non-identity transforms are refused, not approximated."""
    from debezium_server_iceberg_spark.lakehouse import parse_partition_spec

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(30)],
        "id long, grp string, score double",
    )
    t = cat.create_table(
        "ice", "part_t", df.schema, identifier_fields=["id"],
        partition_spec=parse_partition_spec("grp"),
    )
    t.append(df)
    dest = str(tmp_path / "part_tbl")
    md = json.load(open(export_iceberg_table(t, dest)))
    spec = md["partition-specs"][0]["fields"]
    assert spec == [
        {"name": "grp", "transform": "identity",
         "source-id": next(f["id"] for f in md["schemas"][0]["fields"] if f["name"] == "grp"),
         "field-id": 1000}
    ]
    # Apache Avro decodes typed partition values per file
    list_recs = [json.loads(s) for s in java_avro_records(spark, md["snapshots"][0]["manifest-list"])]
    entries = [json.loads(s) for s in java_avro_records(spark, list_recs[0]["manifest_path"])]
    assert {e["data_file"]["partition"]["grp"] for e in entries} == {"g0", "g1", "g2"}
    assert read_iceberg_table(spark, dest).count() == 30



def test_export_carries_sort_order(spark, warehouse, tmp_path):
    t, _ = _make_table(spark, warehouse, rows=4)  # identifier_fields=["id"] -> sort order
    md = json.load(open(export_iceberg_table(t, str(tmp_path / "so"))))
    assert md["default-sort-order-id"] == 1
    so = md["sort-orders"][0]["fields"]
    id_fid = next(f["id"] for f in md["schemas"][0]["fields"] if f["name"] == "id")
    assert so == [
        {"transform": "identity", "source-id": id_fid,
         "direction": "asc", "null-order": "nulls-first"}
    ]


def test_export_schema_evolution_across_publishes(spark, warehouse, tmp_path):
    """A re-publish after engine schema evolution appends a NEW schema id
    (old snapshots keep theirs — Iceberg's multi-schema metadata), and
    time travel reads each snapshot with its own schema."""
    from pyspark.sql import types as T

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t = cat.create_table("ice", "evo_t", df.schema, identifier_fields=["id"])
    t.append(df)
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)

    wide = T.StructType(
        list(df.schema.fields) + [T.StructField("extra", T.LongType(), True)]
    )
    t.update_schema(wide)
    df2 = spark.createDataFrame([(3, "c", 30)], "id long, v string, extra long")
    t.append(df2)
    export_iceberg_table(t, dest)

    md = json.load(
        open(os.path.join(dest, "metadata", "v2.metadata.json"))
    )
    ids = sorted(s["schema-id"] for s in md["schemas"])
    assert ids == [0, 1]
    assert md["current-snapshot-id"] == md["snapshots"][-1]["snapshot-id"]
    assert md["snapshots"][0]["schema-id"] == 0
    assert md["snapshots"][-1]["schema-id"] == 1
    # stable field ids: the evolved schema keeps id/v at 1/2, extra at 3
    new_schema = next(s for s in md["schemas"] if s["schema-id"] == 1)
    assert [(f["name"], f["id"]) for f in new_schema["fields"]] == [
        ("id", 1), ("v", 2), ("extra", 3),
    ]
    # current read sees the new column; time travel reads the old schema
    cur = read_iceberg_table(spark, dest)
    assert "extra" in cur.columns and cur.count() == 3
    old = read_iceberg_table(
        spark, dest, md["snapshots"][0]["snapshot-id"]
    )
    assert old.columns == ["id", "v"] and old.count() == 2


def test_export_republish_same_schema_reuses_id(spark, warehouse, tmp_path):
    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t = cat.create_table("ice", "same_t", df.schema, identifier_fields=["id"])
    t.append(df)
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    export_iceberg_table(t, dest)
    md = json.load(open(os.path.join(dest, "metadata", "v2.metadata.json")))
    assert [s["schema-id"] for s in md["schemas"]] == [0]


def test_export_refuses_field_id_reuse(spark, warehouse, tmp_path):
    """Non-additive engine evolution (drop+add reusing a position) would
    alias an old Iceberg field id to a different column — the export
    refuses instead of emitting conflicting schemas."""
    from pyspark.sql import types as T

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t = cat.create_table("ice", "conflict_t", df.schema, identifier_fields=["id"])
    t.append(df)
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    renamed = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("w", T.StringType())]
    )
    t.update_schema(renamed)
    with pytest.raises(ValueError, match="reuses field id"):
        export_iceberg_table(t, dest)


def test_export_degraded_partitions_unpartitioned_spec(spark, warehouse, tmp_path):
    """Specs the converter refuses (truncate on double) export as an
    UNPARTITIONED Iceberg spec when opted in — contents exact, pruning
    degraded, true layout recorded in a table property."""
    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "id long, score double"
    )
    t = cat.create_table(
        "ice", "degr_t", df.schema, identifier_fields=["id"],
        partition_spec="truncate(4, score)",
    )
    t.append(df)
    dest = str(tmp_path / "x")
    with pytest.raises(ValueError, match="degrade_partitions"):
        export_iceberg_table(t, dest)
    export_iceberg_table(t, dest, degrade_partitions=True)
    md = json.load(open(os.path.join(dest, "metadata", "v1.metadata.json")))
    assert md["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert md["properties"]["engine.partition-spec"] == "truncate(4, score)"
    got = sorted(r["id"] for r in read_iceberg_table(spark, dest).collect())
    assert got == list(range(12))


def test_reader_handles_uri_form_paths(spark, warehouse, tmp_path):
    """Real Iceberg writers record file: / s3: URIs in manifests and
    position-delete files; the reader must normalize both sides of the
    delete joins, or deleted rows silently resurface."""
    from debezium_server_iceberg_spark.lakehouse.avro_io import write_container
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(6)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "uri_t", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame([(4, "u", "u")], "id long, v string, __op string")
    merge_into(t, upd, mode="merge-on-read", delete_style="position")
    dest = str(tmp_path / "x")
    export_iceberg_table(t, dest)
    baseline = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    assert baseline[4] == "u" and len(baseline) == 6

    # rewrite every manifest entry's file_path into file:// URI form
    meta_dir = os.path.join(dest, "metadata")
    md = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    _, manifests, _ = read_container(md["snapshots"][-1]["manifest-list"])
    for m in manifests:
        schema, entries, meta_kv = read_container(m["manifest_path"])
        for e in entries:
            e["data_file"]["file_path"] = "file://" + e["data_file"]["file_path"]
        os.remove(m["manifest_path"])
        write_container(m["manifest_path"], schema, entries, metadata=meta_kv)

    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    assert got == baseline


def test_transform_partitioned_export_faithful(spark, warehouse, tmp_path):
    """bucket + month + truncate specs export with REAL Iceberg transform
    partition values: the spec names the transforms, each file carries the
    typed value (murmur3 bucket ordinal / months-since-epoch / width
    multiple), and a from-spec pruner (plan_iceberg_scan) uses them to
    eliminate files — the whole point of publishing partitioned metadata."""
    import datetime as dt

    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        plan_iceberg_scan,
    )
    from debezium_server_iceberg_spark.lakehouse.murmur3 import (
        iceberg_bucket_py, murmur3_long,
    )

    cat = LakeCatalog(warehouse)
    rows = [
        (i, dt.datetime(2023 + i % 2, 1 + i % 12, 5, 12, 0), i * 10)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, amount long")
    t = cat.create_table(
        "ice", "tr_t", df.schema, identifier_fields=["id"],
        partition_spec="bucket(4, id), month(ts), truncate(100, amount)",
    )
    t.append(df)
    dest = str(tmp_path / "pub")
    md = json.load(open(export_iceberg_table(t, dest)))

    spec = md["partition-specs"][md["default-spec-id"]]["fields"]
    assert [f["transform"] for f in spec] == ["bucket[4]", "month", "truncate[100]"]
    assert [f["name"] for f in spec] == ["id_bucket", "ts_month", "amount_trunc"]
    assert [f["field-id"] for f in spec] == [1000, 1001, 1002]

    # per-file values: recompute from each data file's actual contents
    plan = plan_iceberg_scan(dest)
    import pyarrow.parquet as pq

    checked = 0
    for m in [json.loads(s) for s in java_avro_records(
            spark, md["snapshots"][-1]["manifest-list"])]:
        if m.get("content", 0) != 0:
            continue
        for e in [json.loads(s) for s in java_avro_records(spark, m["manifest_path"])]:
            part = e["data_file"]["partition"]
            tbl = pq.read_table(e["data_file"]["file_path"], columns=["id", "ts", "amount"])
            for i in range(tbl.num_rows):
                rid = tbl.column("id")[i].as_py()
                ts = tbl.column("ts")[i].as_py()
                amt = tbl.column("amount")[i].as_py()
                assert part["id_bucket"] == iceberg_bucket_py(murmur3_long(rid), 4)
                assert part["ts_month"] == (ts.year - 1970) * 12 + ts.month - 1
                assert part["amount_trunc"] == (amt // 100) * 100
                checked += 1
    assert checked == 40

    # pruning: filter to one month — fewer files planned, same rows as a
    # full-scan row filter
    want_month = (2023 - 1970) * 12 + 0  # 2023-01
    pruned_plan = plan_iceberg_scan(
        dest, partition_filter={"ts_month": want_month}
    )
    assert len(pruned_plan["data_files"]) < len(plan["data_files"])
    assert pruned_plan["pruned_files"] > 0
    got = read_iceberg_table(
        spark, dest, partition_filter={"ts_month": want_month}
    ).filter("year(ts) = 2023 and month(ts) = 1")
    exp = read_iceberg_table(spark, dest).filter(
        "year(ts) = 2023 and month(ts) = 1"
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in exp.collect()
    )
    # bucket pruning round-trips a point lookup
    b = iceberg_bucket_py(murmur3_long(7), 4)
    got7 = read_iceberg_table(
        spark, dest, partition_filter={"id_bucket": b}
    ).filter("id = 7")
    assert [r["id"] for r in got7.collect()] == [7]


def test_spec_evolution_export_lineage(spark, warehouse, tmp_path):
    """Engine partition-spec evolution publishes as Iceberg spec LINEAGE:
    old-layout files move to a manifest under an unpartitioned spec id
    (conservatively scanned, never wrongly pruned), new-layout files carry
    the new spec's values, and re-publishes keep every spec listed."""
    cat = LakeCatalog(warehouse)
    df1 = spark.createDataFrame(
        [(i, f"g{i % 2}", i) for i in range(10)], "id long, grp string, n long"
    )
    t = cat.create_table(
        "ice", "ev_t", df1.schema, identifier_fields=["id"],
        partition_spec="grp",
    )
    t.append(df1)
    dest = str(tmp_path / "pub")
    md1 = json.load(open(export_iceberg_table(t, dest)))
    assert [f["name"] for f in md1["partition-specs"][md1["default-spec-id"]]["fields"]] == ["grp"]

    t.update_partition_spec("bucket(2, id)")
    df2 = spark.createDataFrame(
        [(i, f"g{i % 2}", i) for i in range(10, 20)], "id long, grp string, n long"
    )
    t.append(df2)
    md2 = json.load(open(export_iceberg_table(t, dest)))

    specs = {s["spec-id"]: s["fields"] for s in md2["partition-specs"]}
    cur = specs[md2["default-spec-id"]]
    assert [f["transform"] for f in cur] == ["bucket[2]"]
    # old identity spec and the unpartitioned spec both remain listed
    assert any(f and f[0]["name"] == "grp" for f in specs.values())
    assert [] in specs.values()
    # field ids never reused across specs
    all_fids = [f["field-id"] for s in specs.values() for f in s]
    assert len(all_fids) == len(set(all_fids))

    # the old-layout files live in a manifest stamped with the
    # unpartitioned spec id; every row still readable
    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        plan_iceberg_scan,
    )
    unpart_id = next(k for k, v in specs.items() if v == [])
    mrows = [json.loads(s) for s in java_avro_records(
        spark, md2["snapshots"][-1]["manifest-list"])]
    spec_ids = {m["partition_spec_id"] for m in mrows if m.get("content", 0) == 0}
    assert unpart_id in spec_ids and md2["default-spec-id"] in spec_ids
    assert read_iceberg_table(spark, dest).count() == 20
    # pruning on the NEW spec never drops old-layout files
    from debezium_server_iceberg_spark.lakehouse.murmur3 import (
        iceberg_bucket_py, murmur3_long,
    )
    b = iceberg_bucket_py(murmur3_long(3), 2)
    got = read_iceberg_table(spark, dest, partition_filter={"id_bucket": b})
    assert {r["id"] for r in got.collect()} >= ({3} | set(range(10)))


def test_export_path_with_space_delete_joins(spark, warehouse, tmp_path):
    """A warehouse/dest path containing a space exercises the URI
    percent-encoding fix: _metadata.file_path is URI-escaped while
    manifests record plain paths — without symmetric decoding the
    equality-delete join drops every row and position deletes silently
    skip (ADVICE r7)."""
    from debezium_server_iceberg_spark.operators.merge import merge_into

    wh = str(tmp_path / "ware house")
    cat = LakeCatalog(wh)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(8)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "sp_t", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame(
        [(2, "upd", "u"), (5, "gone", "d")], "id long, v string, __op string"
    )
    merge_into(t, upd, mode="merge-on-read", delete_style="equality")
    assert t.current_deletes(), "precondition: live equality-delete files"
    dest = str(tmp_path / "pub lished")
    export_iceberg_table(t, dest)
    got = sorted(
        (r["id"], r["v"]) for r in read_iceberg_table(spark, dest).collect()
    )
    native = sorted((r["id"], r["v"]) for r in t.to_df(spark).collect())
    # multiset compare: a broken path join resurrects the OLD versions of
    # ids 2 and 5 (duplicates a dict compare would mask)
    assert got == native
    assert (2, "v2") not in got and (5, "v5") not in got
    assert (2, "upd") in got


def test_export_path_with_plus_delete_joins(spark, warehouse, tmp_path):
    """A path containing '+' hits the form-vs-URI decoding asymmetry:
    _metadata.file_path leaves literal '+' unencoded, but try_url_decode
    is FORM decoding ('+' -> space).  Without pre-escaping, the two sides
    of the delete join normalize differently — deletes silently skip and
    lineage joins drop rows (ADVICE r8)."""
    from debezium_server_iceberg_spark.operators.merge import merge_into

    wh = str(tmp_path / "ware+house")
    cat = LakeCatalog(wh)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(8)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "plus_t", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame(
        [(2, "upd", "u"), (5, "gone", "d")], "id long, v string, __op string"
    )
    merge_into(t, upd, mode="merge-on-read", delete_style="equality")
    assert t.current_deletes(), "precondition: live equality-delete files"
    dest = str(tmp_path / "pub+lished")
    export_iceberg_table(t, dest)
    got = sorted(
        (r["id"], r["v"]) for r in read_iceberg_table(spark, dest).collect()
    )
    native = sorted((r["id"], r["v"]) for r in t.to_df(spark).collect())
    assert got == native
    assert (2, "v2") not in got and (5, "v5") not in got
    assert (2, "upd") in got  # keep_deletes default retains (5, "gone")


def test_v3_lineage_export_roundtrip(spark, warehouse, tmp_path):
    """format-version 3 engine tables publish v3 metadata: next-row-id,
    per-file first_row_id in manifests, and the chain reader's
    lineage=True derives _row_id/_last_updated_sequence_number that match
    the engine's own lineage read — including materialized values after
    compaction (which win over derivation)."""
    from debezium_server_iceberg_spark.lakehouse.table import (
        LAST_SEQ_COL, ROW_ID_COL,
    )
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(12)], "id long, v string"
    )
    t = cat.create_table(
        "ice", "v3_t", df.schema, identifier_fields=["id"],
        properties={"format-version": "3"},
    )
    t.append(df.filter("id < 6"))
    t.append(df.filter("id >= 6"))
    dest = str(tmp_path / "pub")
    md = json.load(open(export_iceberg_table(t, dest)))
    assert md["format-version"] == 3
    assert md["next-row-id"] == 12
    assert md["snapshots"][-1]["first-row-id"] == 0
    list_recs = [json.loads(s) for s in java_avro_records(
        spark, md["snapshots"][-1]["manifest-list"])]
    ents = [json.loads(s) for s in java_avro_records(
        spark, list_recs[0]["manifest_path"])]
    assert sorted(e["data_file"]["first_row_id"] for e in ents) == [0, 6]

    def _lineage_map(d):
        return {r["id"]: (r[ROW_ID_COL], r[LAST_SEQ_COL]) for r in d.collect()}

    chain = _lineage_map(read_iceberg_table(spark, dest, lineage=True))
    native = _lineage_map(t.to_df(spark, lineage=True))
    assert chain == native and len(chain) == 12

    # upsert via EQUALITY deletes stays v3-exportable
    merge_into(
        t,
        spark.createDataFrame([(3, "X", "u")], "id long, v string, __op string"),
        delete_style="equality",
    )
    md2 = json.load(open(export_iceberg_table(t, dest)))
    assert md2["format-version"] == 3
    chain2 = _lineage_map(read_iceberg_table(spark, dest, lineage=True))
    assert chain2 == _lineage_map(t.to_df(spark, lineage=True))
    assert chain2[3][1] == 3  # fresh sequence on the upserted row

    # compaction materializes lineage INTO the files; chain read must
    # prefer the materialized values over first_row_id + position
    t.compact(spark, target_file_bytes=512 * 1024 * 1024)
    md3 = json.load(open(export_iceberg_table(t, dest)))
    assert md3["format-version"] == 3
    chain3 = _lineage_map(read_iceberg_table(spark, dest, lineage=True))
    assert chain3 == _lineage_map(t.to_df(spark, lineage=True)) == chain2


def test_v3_export_with_position_deletes_writes_deletion_vectors(
    spark, warehouse, tmp_path
):
    """v3 forbids position-delete FILES: live engine position deletes
    publish as puffin deletion-vector-v1 blobs (one DV per referenced
    data file), the export stays format-version 3 WITH row lineage, and
    the metadata-chain read applies the vectors."""
    from debezium_server_iceberg_spark.lakehouse.puffin import (
        read_puffin_footer,
    )
    from debezium_server_iceberg_spark.lakehouse.table import ROW_ID_COL
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(6)], "id long, v string, __op string"
    )
    t = cat.create_table(
        "ice", "v3_pos", df.schema, identifier_fields=["id"],
        properties={"format-version": "3"},
    )
    merge_into(t, df, mode="merge-on-read")
    merge_into(
        t,
        spark.createDataFrame([(2, "u", "u")], "id long, v string, __op string"),
        mode="merge-on-read",
        delete_style="position",
    )
    assert any(d.content == "position" for d in t.current_deletes())
    dest = str(tmp_path / "pub")
    md = json.load(open(export_iceberg_table(t, dest)))
    assert md["format-version"] == 3              # no more v2 fallback
    got = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    assert got[2] == "u" and len(got) == 6
    # lineage read works through the DV-applied scan
    lin = read_iceberg_table(spark, dest, lineage=True)
    assert lin.filter(F.col(ROW_ID_COL).isNull()).count() == 0

    # manifest entries: content=1, PUFFIN format, per-file blob coords
    list_recs = [json.loads(s) for s in java_avro_records(
        spark, md["snapshots"][-1]["manifest-list"])]
    dmani = [r for r in list_recs if r.get("content") == 1]
    assert len(dmani) == 1
    ents = [json.loads(s) for s in java_avro_records(
        spark, dmani[0]["manifest_path"])]
    dv_ents = [e for e in ents
               if e["data_file"]["file_format"] == "PUFFIN"]
    assert dv_ents and all(
        e["data_file"]["content"] == 1
        and e["data_file"]["referenced_data_file"]
        and e["data_file"]["content_offset"] is not None
        and e["data_file"]["content_size_in_bytes"] > 0
        for e in dv_ents
    )
    # spec rule: at most one DV per data file
    refs = [e["data_file"]["referenced_data_file"] for e in dv_ents]
    assert len(refs) == len(set(refs))
    # the puffin footer agrees with the manifest coordinates
    footer = read_puffin_footer(dv_ents[0]["data_file"]["file_path"])
    assert {b["properties"]["referenced-data-file"]
            for b in footer["blobs"]} == set(refs)

    # republish with an UNCHANGED delete set: same content-addressed
    # puffin, entries carried as EXISTING
    t.append(
        spark.createDataFrame([(100, "x", "r")], "id long, v string, __op string")
    )
    md2 = json.load(open(export_iceberg_table(t, dest)))
    assert md2["snapshots"][-1]["summary"]["operation"] == "append"
    list2 = [json.loads(s) for s in java_avro_records(
        spark, md2["snapshots"][-1]["manifest-list"])]
    ents2 = [json.loads(s) for s in java_avro_records(
        spark, [r for r in list2 if r.get("content") == 1][0]["manifest_path"])]
    dv2 = [e for e in ents2 if e["data_file"]["file_format"] == "PUFFIN"]
    assert dv2 and all(e["status"] == 0 for e in dv2)
    assert {e["data_file"]["file_path"] for e in dv2} == {
        dv_ents[0]["data_file"]["file_path"]
    }

    # a NEW position delete produces a replacement puffin (union DVs)
    merge_into(
        t,
        spark.createDataFrame([(4, "u2", "u")], "id long, v string, __op string"),
        mode="merge-on-read",
        delete_style="position",
    )
    md3 = json.load(open(export_iceberg_table(t, dest)))
    got3 = {r["id"]: r["v"] for r in read_iceberg_table(spark, dest).collect()}
    native3 = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert got3 == native3 and got3[4] == "u2" and got3[2] == "u"
    list3 = [json.loads(s) for s in java_avro_records(
        spark, md3["snapshots"][-1]["manifest-list"])]
    ents3 = [json.loads(s) for s in java_avro_records(
        spark, [r for r in list3 if r.get("content") == 1][0]["manifest_path"])]
    paths3 = {e["data_file"]["file_path"] for e in ents3
              if e["data_file"]["file_format"] == "PUFFIN"}
    assert paths3 and paths3 != {dv_ents[0]["data_file"]["file_path"]}

    # time travel: the FIRST snapshot still reads through its own puffin
    got1 = {r["id"]: r["v"] for r in read_iceberg_table(
        spark, dest, snapshot_id=md["current-snapshot-id"]).collect()}
    assert got1[2] == "u" and got1[4] == "v4" and 100 not in got1

    # engine v2 tables keep exporting position deletes as parquet
    t2 = cat.create_table(
        "ice", "v2_pos", df.schema, identifier_fields=["id"],
    )
    merge_into(t2, df, mode="merge-on-read")
    merge_into(
        t2,
        spark.createDataFrame([(1, "u", "u")], "id long, v string, __op string"),
        mode="merge-on-read",
        delete_style="position",
    )
    dest2 = str(tmp_path / "pub2")
    md_v2 = json.load(open(export_iceberg_table(t2, dest2)))
    assert md_v2["format-version"] == 2
    got_v2 = {r["id"]: r["v"]
              for r in read_iceberg_table(spark, dest2).collect()}
    assert got_v2[1] == "u" and len(got_v2) == 6


def test_export_path_with_literal_percent_sequence(spark, tmp_path):
    """A directory literally named with a %hex sequence ('my%20dir'): the
    URI side escapes the '%' to %2520 and must decode exactly once, the
    plain manifest side must NOT decode — one-sided decoding would turn
    'my%20dir' into 'my dir' on one side and every delete join would
    silently miss (review r8)."""
    from debezium_server_iceberg_spark.operators.merge import merge_into

    wh = str(tmp_path / "my%20dir")
    cat = LakeCatalog(wh)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(6)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "pct_t", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame(
        [(3, "upd", "u")], "id long, v string, __op string"
    )
    merge_into(t, upd, mode="merge-on-read", delete_style="equality")
    assert t.current_deletes()
    dest = str(tmp_path / "pub%25out")
    export_iceberg_table(t, dest)
    got = sorted((r["id"], r["v"]) for r in read_iceberg_table(spark, dest).collect())
    native = sorted((r["id"], r["v"]) for r in t.to_df(spark).collect())
    assert got == native
    assert (3, "v3") not in got and (3, "upd") in got


def test_duckdb_foreign_reads_export_data_plane(spark, warehouse, tmp_path):
    """DuckDB as a FOREIGN reader of the exported table's DATA PLANE:
    the scan is planned from the exported metadata only
    (plan_iceberg_scan), then every data byte is read by DuckDB —
    data files and position-delete files via read_parquet with
    file_row_number — and the spec's (file_path, pos) anti-join runs
    in SQL.  The result must equal the engine-native read.  DuckDB
    shares zero code with this repo's parquet writer or Spark's
    reader, so this validates the physical data plane the way the
    (env-blocked) pyiceberg test would, minus the metadata parser."""
    import duckdb

    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        plan_iceberg_scan,
    )
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(8)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "duck_mor", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame(
        [(1, "u1", "u"), (3, "gone", "d")], "id long, v string, __op string"
    )
    merge_into(
        t, upd, mode="merge-on-read", delete_style="position",
        keep_deletes=False,  # hard delete: id 3 must vanish via the
        # position-delete file the foreign reader applies
    )
    dest = str(tmp_path / "ice_out")
    export_iceberg_table(t, dest)

    plan = plan_iceberg_scan(dest)
    data_paths = [p for p, _s, _r in plan["data_files"]]
    pos_paths = [p for p, _ in plan["pos_deletes"]]
    assert data_paths and pos_paths, "fixture must produce MoR pos deletes"

    def _lit(paths):
        return "[" + ", ".join("'" + p.replace("'", "''") + "'" for p in paths) + "]"

    con = duckdb.connect()
    # normalize scheme/slashes on both sides (manifests may record plain
    # absolute paths; filename=true echoes the argument verbatim)
    rows = con.execute(f"""
        WITH data AS (
          SELECT id, v,
                 '/' || regexp_replace(filename, '^([a-zA-Z]+:)?/+', '') AS fp,
                 file_row_number AS pos
          FROM read_parquet({_lit(data_paths)},
                            filename=true, file_row_number=true)
        ), dels AS (
          SELECT '/' || regexp_replace(file_path, '^([a-zA-Z]+:)?/+', '') AS fp,
                 pos
          FROM read_parquet({_lit(pos_paths)})
        )
        SELECT id, v FROM data
        ANTI JOIN dels USING (fp, pos)
        ORDER BY id
    """).fetchall()
    got = {r[0]: r[1] for r in rows}
    native = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert got == native
    assert got[1] == "u1" and 3 not in got and len(got) == 7


def test_duckdb_foreign_reads_equality_deletes(spark, warehouse, tmp_path):
    """Foreign-reader check of EQUALITY deletes incl. the sequence rule:
    an equality delete removes key matches only in data files with a
    STRICTLY LOWER data sequence number.  DuckDB reads data + delete
    parquet and evaluates the rule in SQL from the planned
    (path, data_sequence) pairs; result must equal the native read —
    the same-commit data file carrying the new row version must
    survive its own delete."""
    import duckdb

    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        plan_iceberg_scan,
    )
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame(
        [(i, f"v{i}", "r") for i in range(6)], "id long, v string, __op string"
    )
    t = cat.create_table("ice", "duck_eq", df.schema, identifier_fields=["id"])
    merge_into(t, df, mode="merge-on-read")
    upd = spark.createDataFrame(
        [(2, "u2", "u"), (4, "u4", "u")], "id long, v string, __op string"
    )
    merge_into(t, upd, mode="merge-on-read", delete_style="equality")
    dest = str(tmp_path / "ice_eq")
    export_iceberg_table(t, dest)

    plan = plan_iceberg_scan(dest)
    eq = plan["eq_deletes"]
    assert eq, "fixture must produce equality deletes"
    # (path, delete sequence, [field ids]) per the plan contract
    eq_paths = [e[0] for e in eq]
    eq_seqs = {e[0]: int(e[1]) for e in eq}
    assert all(isinstance(e[2], (list, tuple)) for e in eq)

    def _lit(paths):
        return "[" + ", ".join("'" + p.replace("'", "''") + "'" for p in paths) + "]"

    con = duckdb.connect()
    data_seq = ", ".join(
        f"('{p.replace(chr(39), chr(39)*2)}', {int(s)})"
        for p, s, _r in plan["data_files"]
    )
    del_seq = ", ".join(
        f"('{p.replace(chr(39), chr(39)*2)}', {int(sq)})" for p, sq in eq_seqs.items()
    )
    rows = con.execute(f"""
        WITH dseq(fp, seq) AS (VALUES {data_seq}),
        data AS (
          SELECT d.id, d.v, s.seq
          FROM read_parquet({_lit([p for p, _s, _r in plan["data_files"]])},
                            filename=true) d
          JOIN dseq s ON d.filename = s.fp
        ), eseq(fp, dseq) AS (VALUES {del_seq}),
        dels AS (
          SELECT e.id, s.dseq
          FROM read_parquet({_lit(eq_paths)}, filename=true) e
          JOIN eseq s ON e.filename = s.fp
        )
        SELECT id, v FROM data d
        WHERE NOT EXISTS (
          SELECT 1 FROM dels x WHERE x.id = d.id AND d.seq < x.dseq
        )
        ORDER BY id
    """).fetchall()
    got = {r[0]: r[1] for r in rows}
    native = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert got == native
    assert got[2] == "u2" and got[4] == "u4" and len(got) == 6


def test_minhash_index_table_exports_and_foreign_reads(spark, warehouse, tmp_path):
    """The persistent dedup indexes are ordinary LakeTables, so the W17
    export/publication path works on them unmodified — closing the loop
    the xxhash64-vs-murmur3 decision opened: pbucket is a DATA column
    under an identity() transform, which the spec exports verbatim (the
    hash function behind the column is invisible to readers; spec
    murmur3 only matters for bucket(N, col) TRANSFORMS).  A foreign
    reader reproduces the stored relation and prunes by the exported
    partition values."""
    import duckdb

    from debezium_server_iceberg_spark.functions.incremental import MinHashIndex
    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        plan_iceberg_scan,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    idx = MinHashIndex.create(LakeCatalog(warehouse), "idx", "mh_export")
    idx.add_batch(docs).collect()
    idx.maintain(spark, min_input_files=2)

    dest = str(tmp_path / "ice_idx")
    md_path = export_iceberg_table(idx.table, dest)
    doc = json.load(open(md_path))
    spec = next(
        s for s in doc["partition-specs"] if s["spec-id"] == doc["default-spec-id"]
    )
    assert [f["transform"] for f in spec["fields"]] == ["identity"]
    pname = spec["fields"][0]["name"]

    plan_all = plan_iceberg_scan(dest)
    assert len(plan_all["data_files"]) > 1
    native = idx.table.to_df(spark)
    bucket = native.select("pbucket").distinct().limit(1).collect()[0][0]
    plan_pruned = plan_iceberg_scan(
        dest, partition_filter={pname: [bucket, str(bucket)]}
    )
    assert plan_pruned["pruned_files"] > 0  # foreign-side pruning works
    assert len(plan_pruned["data_files"]) < len(plan_all["data_files"])

    paths = [p for p, _s, _r in plan_all["data_files"]]
    lit = "[" + ", ".join("'" + p.replace("'", "''") + "'" for p in paths) + "]"
    con = duckdb.connect()
    got = sorted(
        con.execute(
            f"SELECT doc, band, band_val FROM read_parquet({lit})"
        ).fetchall()
    )
    want = sorted(
        (r["doc"], r["band"], r["band_val"])
        for r in native.select("doc", "band", "band_val").collect()
    )
    assert got == want and got
