"""Real Apache Iceberg v2 metadata for engine-written tables.

The reference's core contract is tables ANY engine can read through
standard Iceberg metadata (IcebergChangeConsumer.java:100-102; its tests
read the produced tables back with Spark SQL, BaseSparkTest.java:49-71,
170-178).  The engine's native store is the JSON-manifest lakehouse format
(``table.py``); this module publishes a table's current snapshot as a
genuine Iceberg v2 table — ``v1.metadata.json`` + Avro manifest list +
Avro manifest per the public Iceberg table spec — so external readers
(Spark+iceberg-runtime, Trino, DuckDB's iceberg extension, pyiceberg)
can load it with no knowledge of this engine.

What makes this *verifiable in this environment* (no iceberg runtime jar,
no network): the Avro container files are written by the dependency-free
codec in ``avro_io.py`` and validated byte-for-byte by the REAL Apache
Avro Java library already on Spark's classpath
(``org.apache.avro.file.DataFileReader`` via py4j, tests in
``tests/test_iceberg_export.py``), and ``read_iceberg_table`` re-reads the
table through the metadata chain alone — version-hint → metadata.json →
manifest list → manifests → parquet — exactly the walk an external engine
performs.

Scope: append-only snapshots (no merge-on-read delete files — export asks
for ``materialize_deletes`` first rather than silently dropping
semantics) of unpartitioned or identity-partitioned tables (transform
partitions are refused, not approximated).  Re-publishing to the same
destination appends real snapshots — history, sequence numbers,
metadata-log, time travel.  Variant columns are refused (v2 has no
variant).
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuidlib

from pyspark.sql import DataFrame, SparkSession, types as T

from .avro_io import read_container, write_container
from .table import LakeTable

# ---------------------------------------------------------------- schema


_PRIMITIVES = {
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def spark_schema_to_iceberg(
    schema: T.StructType, identifier_fields: list[str] | None = None
) -> tuple[dict, int]:
    """Spark StructType -> Iceberg schema JSON (spec 'Schemas' section).
    Returns (schema_json, last_column_id).  Field ids are assigned
    pre-order, parents before children — the same fresh-assignment walk
    Iceberg's own schema converters do."""
    counter = {"id": 0}

    def nid() -> int:
        counter["id"] += 1
        return counter["id"]

    def conv(dt: T.DataType) -> object:
        name = dt.typeName()
        if name in _PRIMITIVES:
            return _PRIMITIVES[name]
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision}, {dt.scale})"
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                fid = nid()
                fields.append(
                    {
                        "id": fid,
                        "name": f.name,
                        "required": not f.nullable,
                        "type": conv(f.dataType),
                    }
                )
            return {"type": "struct", "fields": fields}
        if isinstance(dt, T.ArrayType):
            eid = nid()
            return {
                "type": "list",
                "element-id": eid,
                "element": conv(dt.elementType),
                "element-required": not dt.containsNull,
            }
        if isinstance(dt, T.MapType):
            kid, vid = nid(), nid()
            return {
                "type": "map",
                "key-id": kid,
                "key": conv(dt.keyType),
                "value-id": vid,
                "value": conv(dt.valueType),
                "value-required": not dt.valueContainsNull,
            }
        raise ValueError(
            f"type {name!r} has no Iceberg v2 representation (variant needs v3)"
        )

    top: dict[str, int] = {}
    fields = []
    for f in schema.fields:
        fid = nid()
        top[f.name] = fid
        fields.append(
            {
                "id": fid,
                "name": f.name,
                # identifier fields must be required in Iceberg
                "required": (not f.nullable) or f.name in (identifier_fields or []),
                "type": conv(f.dataType),
            }
        )
    out = {"type": "struct", "schema-id": 0, "fields": fields}
    ids = [top[c] for c in identifier_fields or [] if c in top]
    if ids:
        out["identifier-field-ids"] = ids
    return out, counter["id"]


def iceberg_schema_to_spark(schema_json: dict) -> T.StructType:
    """The reverse walk, used by the independent read path."""

    def conv(t) -> T.DataType:
        if isinstance(t, str):
            if t.startswith("decimal"):
                p, s = t[t.index("(") + 1 : t.index(")")].split(",")
                return T.DecimalType(int(p), int(s))
            return {
                "long": T.LongType(),
                "int": T.IntegerType(),
                "string": T.StringType(),
                "double": T.DoubleType(),
                "float": T.FloatType(),
                "boolean": T.BooleanType(),
                "date": T.DateType(),
                "timestamptz": T.TimestampType(),
                "timestamp": T.TimestampNTZType(),
                "binary": T.BinaryType(),
                "uuid": T.StringType(),
            }[t]
        if t["type"] == "struct":
            return T.StructType(
                [
                    T.StructField(f["name"], conv(f["type"]), not f["required"])
                    for f in t["fields"]
                ]
            )
        if t["type"] == "list":
            return T.ArrayType(conv(t["element"]), not t["element-required"])
        if t["type"] == "map":
            return T.MapType(
                conv(t["key"]), conv(t["value"]), not t["value-required"]
            )
        raise ValueError(f"unknown iceberg type {t!r}")

    return conv(schema_json)


# --------------------------------------------------- manifest avro schemas


def _opt(t) -> list:
    return ["null", t]


def _field(name: str, ftype, field_id: int, default_null: bool = False) -> dict:
    f = {"name": name, "type": ftype, "field-id": field_id}
    if default_null:
        f["default"] = None
    return f


MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _field("manifest_path", "string", 500),
        _field("manifest_length", "long", 501),
        _field("partition_spec_id", "int", 502),
        _field("content", "int", 517),
        _field("sequence_number", "long", 515),
        _field("min_sequence_number", "long", 516),
        _field("added_snapshot_id", "long", 503),
        _field("added_files_count", "int", 504),
        _field("existing_files_count", "int", 505),
        _field("deleted_files_count", "int", 506),
        _field("added_rows_count", "long", 512),
        _field("existing_rows_count", "long", 513),
        _field("deleted_rows_count", "long", 514),
    ],
}


def manifest_entry_schema(partition_fields: list[dict] | None = None) -> dict:
    """v2 manifest_entry Avro schema.  ``partition_fields`` are the r102
    fields for a partitioned spec (empty record when unpartitioned)."""
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            _field("content", "int", 134),
            _field("file_path", "string", 100),
            _field("file_format", "string", 101),
            _field(
                "partition",
                {"type": "record", "name": "r102", "fields": partition_fields or []},
                102,
            ),
            _field("record_count", "long", 103),
            _field("file_size_in_bytes", "long", 104),
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            _field("status", "int", 0),
            _field("snapshot_id", _opt("long"), 1, default_null=True),
            _field("sequence_number", _opt("long"), 3, default_null=True),
            _field("file_sequence_number", _opt("long"), 4, default_null=True),
            _field("data_file", data_file, 2),
        ],
    }


# ------------------------------------------------------------------ export


def export_iceberg_table(table: LakeTable, dest: str) -> str:
    """Publish ``table``'s current snapshot as an Iceberg v2 table rooted at
    ``dest`` (metadata-only: data file paths point at the engine's parquet
    files in place, the same absolute-path model Iceberg itself uses).

    Re-publishing to the same ``dest`` is INCREMENTAL, mirroring Iceberg's
    own commit history: the new metadata file (``v{N+1}.metadata.json``)
    carries the previous snapshots (their manifest lists are immutable on
    disk), appends one new snapshot at the next sequence number, records
    the superseded metadata file in ``metadata-log``, and bumps
    ``version-hint.text`` last — so an external reader mid-publish still
    loads a complete table, and time travel across publishes works.
    Returns the path of the written metadata file."""
    meta = table.metadata()
    if table.current_deletes():
        raise ValueError(
            "table has merge-on-read delete files; materialize_deletes() first"
        )
    files = table.current_files()
    schema_json, last_col = spark_schema_to_iceberg(
        meta.schema, meta.identifier_fields
    )

    # identity partition specs export with typed per-file partition values
    # (transforms would need typed transform-result reconstruction from the
    # engine's path-encoded values — refused rather than approximated)
    spec_fields_json: list[dict] = []
    part_avro_fields: list[dict] = []
    part_readers: list[tuple[str, str, type]] = []  # (engine key, name, conv)
    for i, pf in enumerate(meta.partition_spec):
        if pf.transform != "identity":
            raise ValueError(
                f"iceberg export supports identity partitions only, got "
                f"{pf.transform!r} on {pf.source!r}"
            )
        src = next(f for f in schema_json["fields"] if f["name"] == pf.source)
        if src["type"] not in ("int", "long", "string"):
            raise ValueError(
                f"identity partition on {src['type']!r} column not exportable"
            )
        spec_fields_json.append(
            {
                "name": pf.source,
                "transform": "identity",
                "source-id": src["id"],
                "field-id": 1000 + i,
            }
        )
        part_avro_fields.append(
            _field(pf.source, _opt(src["type"]), 1000 + i, default_null=True)
        )
        part_readers.append(
            (pf.name, pf.source, int if src["type"] in ("int", "long") else str)
        )

    meta_dir = os.path.join(dest, "metadata")
    os.makedirs(meta_dir, exist_ok=True)

    # ---- incremental publish: load the previous export, if any
    prev_doc, prev_version = None, 0
    hint_path = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint_path):
        with open(hint_path) as fh:
            prev_version = int(fh.read().strip())
        with open(os.path.join(meta_dir, f"v{prev_version}.metadata.json")) as fh:
            prev_doc = json.load(fh)

    now_ms = int(time.time() * 1000)
    commit_uuid = uuidlib.uuid4().hex
    prev_snapshots = list(prev_doc["snapshots"]) if prev_doc else []
    seq = (prev_doc["last-sequence-number"] + 1) if prev_doc else 1
    snapshot_id = max(
        int(meta.current_snapshot_id or 1),
        max((s["snapshot-id"] for s in prev_snapshots), default=0) + 1,
    )
    # append-only when every previously live file is still live; otherwise
    # the snapshot logically replaces the table contents
    prev_seq_by_path: dict[str, int] = {}
    prev_snap_by_path: dict[str, int] = {}
    if prev_snapshots:
        _, prev_manifests, _ = read_container(prev_snapshots[-1]["manifest-list"])
        for m in prev_manifests:
            _, prev_entries, _ = read_container(m["manifest_path"])
            for e in prev_entries:
                if e["status"] != 2:  # not DELETED
                    p = e["data_file"]["file_path"]
                    prev_seq_by_path[p] = e.get("sequence_number") or 1
                    prev_snap_by_path[p] = e.get("snapshot_id") or snapshot_id
    cur_paths = {os.path.abspath(f.path) for f in files}
    operation = (
        "append" if set(prev_seq_by_path) <= cur_paths else "overwrite"
    )

    # ---- manifest: carried-over files EXISTING with their original seq,
    # new files ADDED at the new seq (Iceberg manifest-entry semantics)
    entry_schema = manifest_entry_schema(part_avro_fields)
    entries = []
    n_added = added_rows = 0
    for f in files:
        p = os.path.abspath(f.path)
        carried = p in prev_seq_by_path
        if not carried:
            n_added += 1
            added_rows += int(f.rows)
        part_values = {
            name: (None if f.partition.get(key) is None else conv(f.partition[key]))
            for key, name, conv in part_readers
        }
        entries.append(
            {
                "status": 0 if carried else 1,  # EXISTING / ADDED
                "snapshot_id": prev_snap_by_path.get(p, snapshot_id),
                "sequence_number": prev_seq_by_path.get(p, seq),
                "file_sequence_number": prev_seq_by_path.get(p, seq),
                "data_file": {
                    "content": 0,
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": part_values,
                    "record_count": int(f.rows),
                    "file_size_in_bytes": int(f.bytes or os.path.getsize(f.path)),
                },
            }
        )
    manifest_path = os.path.join(meta_dir, f"{commit_uuid}-m0.avro")
    manifest_len = write_container(
        manifest_path,
        entry_schema,
        entries,
        metadata={
            "schema": json.dumps(schema_json),
            "schema-id": "0",
            "partition-spec": json.dumps(spec_fields_json),
            "partition-spec-id": "0",
            "format-version": "2",
            "content": "data",
        },
    )

    # ---- manifest list
    list_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{commit_uuid}.avro"
    )
    min_seq = min((e["sequence_number"] for e in entries), default=seq)
    total_rows = sum(int(f.rows) for f in files)
    write_container(
        list_path,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": os.path.abspath(manifest_path),
                "manifest_length": manifest_len,
                "partition_spec_id": 0,
                "content": 0,  # data
                "sequence_number": seq,
                "min_sequence_number": min_seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": n_added,
                "existing_files_count": len(files) - n_added,
                "deleted_files_count": 0,
                "added_rows_count": added_rows,
                "existing_rows_count": total_rows - added_rows,
                "deleted_rows_count": 0,
            }
        ],
        metadata={"format-version": "2"},
    )

    # ---- table metadata (TableMetadataV2 required fields)
    # ascending identity sort order on the table's declared sort columns
    # (the reference's key-ascending write order, JsonSchemaConverter.java:262-280)
    field_ids = {f["name"]: f["id"] for f in schema_json["fields"]}
    sort_fields = [
        {
            "transform": "identity",
            "source-id": field_ids[c],
            "direction": "asc",
            "null-order": "nulls-first",
        }
        for c in meta.sort_order
        if c in field_ids
    ]
    new_snapshot = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "summary": {
            "operation": operation,
            "added-data-files": str(n_added),
            "added-records": str(added_rows),
            "total-records": str(total_rows),
            "total-data-files": str(len(files)),
            "total-delete-files": "0",
        },
        "manifest-list": os.path.abspath(list_path),
        "schema-id": 0,
    }
    snapshot_log = (list(prev_doc["snapshot-log"]) if prev_doc else []) + [
        {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
    ]
    metadata_log = list(prev_doc["metadata-log"]) if prev_doc else []
    if prev_doc:
        metadata_log.append(
            {
                "timestamp-ms": prev_doc["last-updated-ms"],
                "metadata-file": os.path.join(
                    meta_dir, f"v{prev_version}.metadata.json"
                ),
            }
        )
    doc = {
        "format-version": 2,
        "table-uuid": (
            prev_doc["table-uuid"]
            if prev_doc
            else meta.table_uuid or str(uuidlib.uuid4())
        ),
        "location": os.path.abspath(dest),
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": last_col,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields_json}],
        "last-partition-id": 999 + len(spec_fields_json),
        "default-sort-order-id": 1 if sort_fields else 0,
        "sort-orders": (
            [{"order-id": 1, "fields": sort_fields}]
            if sort_fields
            else [{"order-id": 0, "fields": []}]
        ),
        "properties": dict(meta.properties),
        "current-snapshot-id": snapshot_id,
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
        "snapshots": prev_snapshots + [new_snapshot],
        "snapshot-log": snapshot_log,
        "metadata-log": metadata_log,
    }
    version = prev_version + 1
    md_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(md_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    # hint write is last: readers mid-publish load the previous complete
    # version (Iceberg's version-hint protocol)
    tmp = os.path.join(meta_dir, f".hint.{commit_uuid}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, hint_path)
    return md_path


# ------------------------------------------------------- independent read


def read_iceberg_table(
    spark: SparkSession, location: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read an Iceberg table by walking ONLY its standard metadata —
    version-hint → vN.metadata.json → snapshot's manifest list →
    manifests → live data files — the exact sequence any external Iceberg
    reader performs (HadoopTables model).  No engine-native manifest is
    touched, so a passing read proves the exported metadata is complete
    and self-consistent.  ``snapshot_id`` time-travels to a historical
    publish."""
    meta_dir = os.path.join(location, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        version = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as fh:
        doc = json.load(fh)
    if doc["format-version"] not in (1, 2):
        raise ValueError(f"unsupported format-version {doc['format-version']}")
    schema_json = next(
        s for s in doc["schemas"] if s["schema-id"] == doc["current-schema-id"]
    )
    want = snapshot_id if snapshot_id is not None else doc["current-snapshot-id"]
    snap = next(s for s in doc["snapshots"] if s["snapshot-id"] == want)
    _, manifests, _ = read_container(snap["manifest-list"])
    paths: list[str] = []
    for m in manifests:
        if m.get("content", 0) != 0:
            raise ValueError("delete manifests not supported by this reader")
        _, entries, _ = read_container(m["manifest_path"])
        for e in entries:
            if e["status"] in (0, 1):  # EXISTING / ADDED (2 = DELETED)
                paths.append(e["data_file"]["file_path"])
    spark_schema = iceberg_schema_to_spark(schema_json)
    if not paths:
        return spark.createDataFrame([], spark_schema)
    return spark.read.schema(spark_schema).parquet(*paths)


def java_avro_records(spark: SparkSession, path: str) -> list[str]:
    """Decode an Avro container with the REAL Apache Avro Java library on
    Spark's classpath (org.apache.avro 1.12 via py4j) — an independent,
    spec-authoritative validation of files written by ``avro_io``.
    Returns each record rendered as a JSON string by Avro itself."""
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    out = []
    try:
        while reader.hasNext():
            out.append(str(reader.next()))
    finally:
        reader.close()
    return out
