"""ACID parquet table format with snapshot metadata (the engine's sink layer).

The reference writes Apache Iceberg tables; no Iceberg runtime exists in this
environment, so the same *capabilities* are re-expressed natively on Spark +
parquet + an atomic JSON metadata log, Iceberg-style:

- data files written by Spark (distributed, partitioned via hidden-partition
  transforms), never mutated in place;
- each commit produces a new immutable snapshot = manifest of data files with
  per-file row counts, partition values, and key-column bounds;
- the atomic point is an ``os.replace`` of ``version-hint.text`` after writing
  ``v{N}.metadata.json`` with O_EXCL (optimistic concurrency — two writers
  racing on the same version: one loses and retries), mirroring Iceberg's
  Hadoop-catalog commit and the reference's commit protocols
  (IcebergTableOperator.java:218-228, IcebergOffsetBackingStore.java:219-223).

Capability parity map (reference file:line -> here):
- table auto-create w/ schema+PK+partition+sort  IcebergChangeConsumer.java:321-389
- append commit (AppendFiles)                    IcebergTableOperator.java:224-228
- delta commit (RowDelta: remove+add atomically) IcebergTableOperator.java:218-224
- overwrite commit (OverwriteFiles alwaysTrue)   IcebergOffsetBackingStore.java:219-223
- schema evolution union-by-name                 IcebergTableOperator.java:136-151
- rolling target file size                        IcebergTableWriterFactory.java:42-46
- snapshot history / time travel                 Iceberg metadata (free here)

Scale notes: manifests carry file-level partition values + key bounds so the
MERGE path prunes untouched files before any Spark job runs; stats are
computed distributed (one narrow aggregation over freshly written files, not
a driver loop). At 1000-executor scale the only driver-side state is the
file list — same as Iceberg's planning model.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid as uuidlib
from dataclasses import dataclass, field as dc_field
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .transforms import PartitionField

_HINT = "version-hint.text"

# layout-versioning table properties (see LakeTable.create)
BUCKET_HASH_PROP = "engine.bucket-hash"
BUCKET_HASH = "murmur3"          # Iceberg-spec bucket hash since r8
WRITE_TZ_PROP = "engine.write-timezone"


def bucket_hash_trusted(meta: "TableMetadata") -> bool:
    """True iff this table's bucket partition values are the current
    (Iceberg murmur3) hash — i.e. safe to recompute for pruning/export."""
    return meta.properties.get(BUCKET_HASH_PROP) == BUCKET_HASH


def table_write_tz(meta: "TableMetadata") -> str:
    """The timezone this table's temporal partition values render in."""
    return meta.properties.get(WRITE_TZ_PROP, "UTC")


def _tz_sensitive_fields(meta: "TableMetadata") -> "list[PartitionField]":
    """Partition fields whose on-disk value depends on a timezone: temporal
    transforms (and identity) over an ltz timestamp source.  date and
    timestamp_ntz sources render the stored wall clock — tz-independent."""
    src = {f.name: f.dataType.simpleString() for f in meta.schema.fields}
    return [
        pf
        for pf in meta.partition_spec
        if src.get(pf.source) == "timestamp"
        and pf.transform in ("year", "month", "day", "hour", "identity")
    ]

# Iceberg v3 row-lineage reserved column names (spec: Row Lineage)
ROW_ID_COL = "_row_id"
LAST_SEQ_COL = "_last_updated_sequence_number"


class CommitConflict(RuntimeError):
    pass


@dataclass
class DataFile:
    path: str                      # absolute path
    rows: int
    partition: dict[str, Any] = dc_field(default_factory=dict)
    bounds: dict[str, list] = dc_field(default_factory=dict)  # col -> [min,max]
    bytes: int = 0                 # on-disk size (0 = unknown, pre-stat manifests)
    seq: int = 0                   # data sequence number (snapshot id at add time)
    # Iceberg v3 row lineage: the table-wide row id of this file's first row
    # (manifest-inherited `first_row_id`); rows materialize
    # `_row_id = first_row_id + position`. None on pre-v3 files.
    first_row_id: int | None = None

    def to_dict(self) -> dict:
        d = {
            "path": self.path,
            "rows": self.rows,
            "partition": self.partition,
            "bounds": self.bounds,
            "bytes": self.bytes,
            "seq": self.seq,
        }
        if self.first_row_id is not None:
            d["first_row_id"] = self.first_row_id
        return d

    @staticmethod
    def from_dict(d: dict) -> "DataFile":
        return DataFile(
            d["path"], d["rows"], d.get("partition", {}), d.get("bounds", {}),
            d.get("bytes", 0), d.get("seq", 0), d.get("first_row_id")
        )


@dataclass
class DeleteFile:
    """Merge-on-read delete file, two contents:

    - ``content='equality'`` (Iceberg v2 semantics): a parquet file of key
      tuples that logically removes every matching row in data files with a
      LOWER sequence number — the reference's equality-delta writer
      (IcebergTableWriterFactory.java:97-108 equalityFieldIds,
      BaseDeltaTaskWriter.java:60-71 deleteKey-then-write).
    - ``content='position'`` (v3 deletion-vector semantics,
      IcebergConfig.java:106-108 default + PartitioningDVWriter in
      BaseDeltaTaskWriter.java:74-88): a parquet file of
      ``(file_name, pos)`` rows naming exact row positions to skip.  The
      read side does positional anti-joins (cheap integer compare per row)
      instead of key-tuple anti-joins; data file names are globally unique
      (``_uniquify_staged``), so name+pos identifies a row forever."""

    path: str
    rows: int
    seq: int                       # applies to data files with data.seq < seq
    equality_cols: list[str] = dc_field(default_factory=list)
    bounds: dict[str, list] = dc_field(default_factory=dict)
    bytes: int = 0
    content: str = "equality"

    def to_dict(self) -> dict:
        return {
            "path": self.path,
            "rows": self.rows,
            "seq": self.seq,
            "equality_cols": self.equality_cols,
            "bounds": self.bounds,
            "bytes": self.bytes,
            "content": self.content,
        }

    @staticmethod
    def from_dict(d: dict) -> "DeleteFile":
        return DeleteFile(
            d["path"], d["rows"], d["seq"], d.get("equality_cols", []),
            d.get("bounds", {}), d.get("bytes", 0), d.get("content", "equality")
        )


@dataclass
class Snapshot:
    snapshot_id: int
    timestamp_ms: int
    operation: str                 # append | delta | overwrite
    manifest: str                  # manifest file name (relative to metadata/)
    summary: dict[str, Any] = dc_field(default_factory=dict)
    parent_id: int | None = None   # lineage pointer (None = first snapshot)


@dataclass
class TableMetadata:
    table_uuid: str
    location: str
    schema_json: dict
    identifier_fields: list[str]
    partition_spec: list[PartitionField]
    sort_order: list[str]
    properties: dict[str, str]
    snapshots: list[Snapshot]
    current_snapshot_id: int | None
    version: int
    # named refs (Iceberg table-metadata ``refs`` map): name ->
    # {"snapshot_id": int, "type": "tag" | "branch"}.  "main" is implicit
    # (= current_snapshot_id) and never stored here.
    refs: dict[str, dict] = dc_field(default_factory=dict)
    # Iceberg v3 row lineage: the next unassigned table-wide row id
    # (table-metadata `next-row-id`); bumped by each commit's added rows.
    next_row_id: int = 0

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)


class LakeTable:
    """Handle on one table directory. Stateless between calls (always re-reads
    the committed metadata), so concurrent handles behave like Iceberg table
    refreshes."""

    def __init__(self, location: str) -> None:
        self.location = location
        self.meta_dir = os.path.join(location, "metadata")
        self.data_dir = os.path.join(location, "data")
        #: optional publication gate called INSIDE every commit, between
        #: writing the candidate metadata file and swinging the
        #: version-hint (the local atomic point): ``hook(table,
        #: candidate_meta, new_version)``.  If it raises, the candidate
        #: file is removed and the commit does NOT advance — this is how
        #: ``publish_mode=per_commit`` makes an external catalog row the
        #: authoritative commit point (lakehouse/catalog_commit.py).
        self.commit_hook = None

    # ------------------------------------------------------------- create

    @staticmethod
    def create(
        location: str,
        schema: T.StructType,
        identifier_fields: list[str] | None = None,
        partition_spec: "list[PartitionField] | str | None" = None,
        sort_order: list[str] | None = None,
        properties: dict[str, str] | None = None,
    ) -> "LakeTable":
        if isinstance(partition_spec, str):
            from .transforms import parse_partition_spec

            partition_spec = parse_partition_spec(
                partition_spec, {f.name for f in schema.fields}
            )
        t = LakeTable(location)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        if os.path.exists(os.path.join(t.meta_dir, _HINT)):
            raise FileExistsError(f"table already exists at {location}")
        ids = identifier_fields or []
        # sort order = ascending key columns, skipping absent ones
        # (JsonSchemaConverter.java:262-280)
        names = {f.name for f in schema.fields}
        so = [c for c in (sort_order if sort_order is not None else ids) if c in names]
        props = dict(properties or {})
        # on-disk layout versioning: bucket partition values are hashes, so
        # the hash function is part of the layout.  Tables created by this
        # engine stamp it; a table WITHOUT the stamp was written by a build
        # whose bucket hash differed (pre-murmur3 xxhash64), and its bucket
        # values must never be interpreted as murmur3 ordinals — planners
        # treat unstamped bucket fields as unprunable and the Iceberg
        # exporter routes their files to the unpartitioned-spec manifest.
        # compact() rewrites under the current engine, after which
        # update_properties(**{BUCKET_HASH_PROP: BUCKET_HASH}) re-arms them.
        props.setdefault(BUCKET_HASH_PROP, BUCKET_HASH)
        # temporal partition values ("2024-05", "2024-05-03-07") are WALL
        # CLOCKS of ltz timestamps, so the rendering timezone is part of the
        # layout too.  Writes require the session timezone to match this
        # declared value (refusal beats silently mixing encodings in one
        # directory tree); planners convert filter instants into this zone.
        props.setdefault(WRITE_TZ_PROP, "UTC")
        meta = TableMetadata(
            table_uuid=str(uuidlib.uuid4()),
            location=location,
            schema_json=schema.jsonValue(),
            identifier_fields=ids,
            partition_spec=partition_spec or [],
            sort_order=so,
            properties=props,
            snapshots=[],
            current_snapshot_id=None,
            version=0,
        )
        t._write_metadata(meta, expected_version=None)
        return t

    @staticmethod
    def exists(location: str) -> bool:
        return os.path.exists(os.path.join(location, "metadata", _HINT))

    # ------------------------------------------------------------ metadata

    def metadata(self) -> TableMetadata:
        with open(os.path.join(self.meta_dir, _HINT)) as fh:
            version = int(fh.read().strip())
        with open(os.path.join(self.meta_dir, f"v{version:05d}.metadata.json")) as fh:
            d = json.load(fh)
        snaps = [
            Snapshot(
                s["snapshot_id"], s["timestamp_ms"], s["operation"], s["manifest"],
                s.get("summary", {}), s.get("parent_id"),
            )
            for s in d["snapshots"]
        ]
        return TableMetadata(
            table_uuid=d["table_uuid"],
            location=d["location"],
            schema_json=d["schema"],
            identifier_fields=d["identifier_fields"],
            partition_spec=[PartitionField.from_dict(p) for p in d["partition_spec"]],
            sort_order=d["sort_order"],
            properties=d["properties"],
            snapshots=snaps,
            current_snapshot_id=d["current_snapshot_id"],
            version=version,
            refs=d.get("refs", {}),
            next_row_id=d.get("next_row_id", 0),
        )

    def _write_metadata(self, meta: TableMetadata, expected_version: int | None) -> None:
        new_version = 0 if expected_version is None else expected_version + 1
        d = {
            "format_version": 1,
            "table_uuid": meta.table_uuid,
            "location": meta.location,
            "schema": meta.schema_json,
            "identifier_fields": meta.identifier_fields,
            "partition_spec": [p.to_dict() for p in meta.partition_spec],
            "sort_order": meta.sort_order,
            "properties": meta.properties,
            "snapshots": [
                {
                    "snapshot_id": s.snapshot_id,
                    "timestamp_ms": s.timestamp_ms,
                    "operation": s.operation,
                    "manifest": s.manifest,
                    "summary": s.summary,
                    "parent_id": s.parent_id,
                }
                for s in meta.snapshots
            ],
            "current_snapshot_id": meta.current_snapshot_id,
            "refs": meta.refs,
            "next_row_id": meta.next_row_id,
        }
        path = os.path.join(self.meta_dir, f"v{new_version:05d}.metadata.json")
        # O_EXCL: optimistic-concurrency loser gets FileExistsError
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError as e:
            raise CommitConflict(f"version {new_version} already committed") from e
        with os.fdopen(fd, "w") as fh:
            json.dump(d, fh)
        if self.commit_hook is not None:
            # publication gate (publish_mode=per_commit): export the
            # CANDIDATE state and CAS the external catalog pointer
            # BEFORE the local atomic point.  A conflict (another
            # writer owns the catalog row) propagates and the commit
            # does not advance — the candidate file is removed so the
            # version slot stays free for a later legitimate commit.
            try:
                self.commit_hook(self, meta, new_version)
            except Exception:
                try:
                    os.unlink(path)
                except OSError:
                    pass
                raise
        tmp = os.path.join(self.meta_dir, f".hint.{uuidlib.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(new_version))
        os.replace(tmp, os.path.join(self.meta_dir, _HINT))  # ATOMIC POINT

    def _lineage_on(self, meta: TableMetadata | None = None) -> bool:
        """v3 tables track row lineage (spec: mandatory from format v3).
        Pass an already-loaded ``meta`` to skip the metadata re-read."""
        meta = meta if meta is not None else self.metadata()
        return int(meta.properties.get("format-version", "2")) >= 3

    def update_properties(self, retries: int = 5, **props) -> None:
        """Metadata-only property update (Iceberg's UpdateProperties): CAS
        through the same optimistic-concurrency commit as data writes."""
        for attempt in range(retries):
            meta = self.metadata()
            meta.properties.update({k: str(v) for k, v in props.items()})
            try:
                self._write_metadata(meta, expected_version=meta.version)
                return
            except CommitConflict:
                if attempt == retries - 1:
                    raise
                time.sleep(0.05 * (attempt + 1))

    # ------------------------------------------------------------ manifests

    def _manifest_entry(self, meta: TableMetadata, snapshot_id: int | None = None) -> dict:
        sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
        if sid is None:
            return {"files": [], "delete_files": []}
        snap = next(s for s in meta.snapshots if s.snapshot_id == sid)
        with open(os.path.join(self.meta_dir, snap.manifest)) as fh:
            d = json.load(fh)
        return {"files": d["files"], "delete_files": d.get("delete_files", [])}

    def _manifest_files(self, meta: TableMetadata, snapshot_id: int | None = None) -> list[DataFile]:
        return [DataFile.from_dict(f) for f in self._manifest_entry(meta, snapshot_id)["files"]]

    def _manifest_deletes(self, meta: TableMetadata, snapshot_id: int | None = None) -> list[DeleteFile]:
        return [
            DeleteFile.from_dict(f)
            for f in self._manifest_entry(meta, snapshot_id)["delete_files"]
        ]

    def current_files(self) -> list[DataFile]:
        return self._manifest_files(self.metadata())

    def files_at(self, ref: str = "main") -> list[DataFile]:
        """Data files at a ref head; an unknown ref falls back to main's
        head (the base a branch auto-created on write would start from)."""
        meta = self.metadata()
        if ref == "main":
            sid = meta.current_snapshot_id
        else:
            r = meta.refs.get(ref)
            sid = r["snapshot_id"] if r else meta.current_snapshot_id
        return self._manifest_files(meta, sid)

    def current_deletes(self) -> list[DeleteFile]:
        return self._manifest_deletes(self.metadata())

    def _commit_snapshot(
        self,
        operation: str,
        add: list[DataFile],
        remove_paths: set[str],
        summary: dict[str, Any] | None = None,
        new_schema: T.StructType | None = None,
        retries: int = 5,
        add_deletes: list[DeleteFile] | None = None,
        drop_deletes: bool = False,
        branch: str = "main",
    ) -> None:
        """Generic commit: new manifest = (current - removed) + added.

        Delete-file lifecycle: equality-delete files are carried forward
        snapshot to snapshot (unless ``drop_deletes`` or overwrite), new ones
        get seq = the new snapshot id, and any delete file that no longer has
        a live data file older than itself is pruned (it can never match).

        ``branch``: commit on a named branch ref instead of main (Iceberg's
        branch writes / WAP pattern) — the new snapshot's base is the branch
        head and only that ref advances; main is untouched."""
        for attempt in range(retries):
            meta = self.metadata()
            if branch == "main":
                base_sid = meta.current_snapshot_id
            else:
                ref = meta.refs.get(branch)
                if ref is None:
                    # auto-create at the main head on first write (the
                    # spark.wap.branch behavior)
                    base_sid = meta.current_snapshot_id
                elif ref.get("type") != "branch":
                    raise ValueError(f"{branch!r} is a tag; no branch with that name")
                else:
                    base_sid = ref["snapshot_id"]
            current = self._manifest_files(meta, base_sid)
            cur_deletes = self._manifest_deletes(meta, base_sid)
            files = (
                add
                if operation == "overwrite"
                else [f for f in current if f.path not in remove_paths] + add
            )
            # max-based, not head+1: branch snapshots share one id space, and
            # seq ordering (delete-file applicability) only needs ids to be
            # monotone along each lineage — which max+1 preserves everywhere
            sid = max((s.snapshot_id for s in meta.snapshots), default=0) + 1
            # freshly added files get this snapshot's sequence number
            for f in add:
                f.seq = sid
            # v3 row lineage: assign each added file its first_row_id from
            # the table's next-row-id counter (Iceberg v3 manifest
            # inheritance).  Assigned inside the retry loop so a conflicting
            # concurrent commit can't hand out overlapping id ranges.
            if int(meta.properties.get("format-version", "2")) >= 3:
                rid = meta.next_row_id
                for f in add:
                    f.first_row_id = rid
                    rid += f.rows
                meta.next_row_id = rid
            deletes = [] if (drop_deletes or operation == "overwrite") else list(cur_deletes)
            for d in add_deletes or []:
                d.seq = sid
                deletes.append(d)
            # prune dead delete files: nothing older than them is live
            deletes = [d for d in deletes if any(f.seq < d.seq for f in files)]
            manifest_name = f"manifest-{sid:08d}-{uuidlib.uuid4().hex[:8]}.json"
            with open(os.path.join(self.meta_dir, manifest_name), "w") as fh:
                json.dump(
                    {
                        "files": [f.to_dict() for f in files],
                        "delete_files": [d.to_dict() for d in deletes],
                    },
                    fh,
                )
            snap = Snapshot(
                snapshot_id=sid,
                timestamp_ms=int(time.time() * 1000),
                operation=operation,
                manifest=manifest_name,
                summary=dict(
                    summary or {},
                    added_files=len(add),
                    removed_files=len(remove_paths) if operation != "overwrite" else len(current),
                    total_files=len(files),
                    total_rows=sum(f.rows for f in files),
                    added_delete_files=len(add_deletes or []),
                    total_delete_files=len(deletes),
                    total_delete_rows=sum(d.rows for d in deletes),
                ),
                parent_id=base_sid,
            )
            meta.snapshots.append(snap)
            if branch == "main":
                meta.current_snapshot_id = sid
            else:
                meta.refs[branch] = {"snapshot_id": sid, "type": "branch"}
            if new_schema is not None:
                meta.schema_json = new_schema.jsonValue()
            try:
                self._write_metadata(meta, expected_version=meta.version)
                return
            except CommitConflict:
                if attempt == retries - 1:
                    raise
                meta.snapshots.pop()
                time.sleep(0.05 * (attempt + 1))

    # ------------------------------------------------------------ write ops

    def _stage_write(
        self,
        df: DataFrame,
        meta: TableMetadata,
        target_partitions: int | None = None,
        preserve_layout: bool = False,
        preserve_lineage: bool = False,
    ) -> list[DataFile]:
        """Write df's rows as new data files (not yet committed); return stats.

        Physical layout: partition-transform columns are computed as hidden
        ``_p_*`` columns and written via ``partitionBy`` (directory-encoded,
        not stored in the files). Sort order applied within partitions
        (the reference's WRITE ORDERED BY, JsonSchemaConverter.java:262-280).
        """
        schema = meta.schema
        table_cols = [f.name for f in schema.fields]
        # simpleString, not typeName: decimal needs its (p,s) for the
        # spec bucket hash ("decimal(18,2)" vs bare "decimal")
        src_types = {f.name: f.dataType.simpleString() for f in schema.fields}
        if _tz_sensitive_fields(meta):
            # temporal transform expressions (date_format/year) render ltz
            # timestamps in the SESSION timezone; the table's directory tree
            # is declared in WRITE_TZ_PROP.  A mismatched write would mix
            # two wall-clock encodings under one partition field — refuse.
            sess_tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
            want = table_write_tz(meta)
            if sess_tz != want:
                raise ValueError(
                    f"session timezone {sess_tz!r} != table write timezone "
                    f"{want!r} for a temporally-partitioned table; set "
                    f"spark.sql.session.timeZone={want!r} (or create the "
                    f"table with properties={{{WRITE_TZ_PROP!r}: "
                    f"{sess_tz!r}}})"
                )
        out = df
        pcols: list[str] = []
        for pf in meta.partition_spec:
            out = out.withColumn(pf.name, pf.column(src_types.get(pf.source)))
            pcols.append(pf.name)
        key_cols = [c for c in meta.identifier_fields if c in out.columns]
        cached = None
        single_file = False
        if preserve_layout:
            # caller (clustered rewrite) already shaped partitioning + order
            pass
        elif pcols:
            out = out.repartition(*[F.col(c) for c in pcols])
        elif key_cols:
            # range-cluster unpartitioned keyed tables by identifier fields:
            # each file then covers a narrow key range, so the MERGE
            # planner's min/max bounds pruning actually eliminates files
            # (the WRITE ORDERED BY effect, JsonSchemaConverter.java:262-280).
            n_parts = target_partitions or _auto_write_partitions(out, meta)
            # the single-file fast path additionally requires 4x headroom
            # between the PLAN estimate and the target file size: Catalyst
            # estimates undershoot badly after selective filters/anti-joins,
            # and while the post-write footer check re-splits an oversize
            # file, the mis-estimated write itself would have funneled the
            # whole frame through ONE task first.  With est*4 <= target, a
            # 4x undershoot still lands within one target file; anything
            # wider takes the ranged path, whose persist+materialize step
            # sizes the fan-out from the TRUE cached bytes.  A caller-
            # EXPLICIT target_partitions=1 keeps the fast path (the caller
            # knows its data).
            target_fs = int(
                meta.properties.get(
                    "write.target-file-size-bytes", 512 * 1024 * 1024
                )
            )
            est = (
                _plan_size_est(out)
                if n_parts == 1 and not target_partitions
                else None
            )
            if n_parts == 1 and (
                target_partitions or (est is not None and est * 4 <= target_fs)
            ):
                # CDC-sized keyed commit (plan estimate fits ONE target
                # file): round-robin into a single partition + in-partition
                # key sort — one pass.  The former persist+count (cache
                # fill for a true size) and the range shuffle's sampling
                # pass were two whole jobs buying nothing a single ranged
                # file needs.  A selective-filter UNDERestimate cannot
                # silently collapse a big write: the staged footer stats
                # are checked below and an oversize single file is re-split
                # by a real range shuffle over the (cheap, columnar)
                # staged copy.
                out = out.repartition(1)
                single_file = True
            else:
                # repartitionByRange samples its input — cache so the
                # upstream plan (often a merge's anti-join) isn't computed
                # twice; materialize so a collapse-zone estimate is checked
                # against the true cached size.
                cached = out.persist()
                out = cached
                n_parts = target_partitions or _auto_write_partitions(
                    out, meta, materialize=True
                )
                if n_parts:
                    out = out.repartitionByRange(n_parts, *key_cols)
                else:
                    out = out.repartitionByRange(*key_cols)
                # a 1-file ranged write keeps the footer-check safety net
                # too — the materialized estimate can still be wrong for
                # exotic plans, and the check is free when sizes are sane
                single_file = n_parts == 1
        elif target_partitions:
            out = out.repartition(target_partitions)
        sort_cols = [] if preserve_layout else (meta.sort_order or key_cols)
        if sort_cols:
            present = [c for c in sort_cols if c in out.columns]
            if present:
                out = out.sortWithinPartitions(*present)
        staging = os.path.join(self.data_dir, uuidlib.uuid4().hex)
        # rewrites opt in (preserve_lineage) to carrying the v3 lineage
        # columns physically — materialization: a compacted row keeps its
        # original _row_id even though the new file gets a fresh
        # first_row_id.  Without the flag, lineage-named columns are
        # DROPPED like any other extra column: an append of another
        # table's lineage read must not smuggle foreign row ids into this
        # table's id space (they would collide with commit-assigned ones).
        lineage_cols = (
            [c for c in (ROW_ID_COL, LAST_SEQ_COL) if c in out.columns]
            if preserve_lineage
            else []
        )
        try:
            writer = out.select(*table_cols, *lineage_cols, *pcols).write.mode("error")
            # rolling files (reference write.target-file-size-bytes,
            # IcebergTableWriterFactory.java:42-46): row-count cap per file
            max_recs = meta.properties.get("write.max-records-per-file")
            if max_recs:
                writer = writer.option("maxRecordsPerFile", int(max_recs))
            if pcols:
                writer = writer.partitionBy(*pcols)
            writer.parquet(staging)
            _uniquify_staged(staging)
            files = self._collect_stats(df.sparkSession, staging, meta)
            if single_file:
                files = self._resplit_oversize_staged(
                    df.sparkSession, staging, files, meta, key_cols
                )
            return files
        except Exception:
            # abort: a failed stage leaves no orphan files behind (W12,
            # writer.abort() — IcebergTableOperator.java:229-237)
            shutil.rmtree(staging, ignore_errors=True)
            raise
        finally:
            if cached is not None:
                cached.unpersist()

    def _collect_stats(
        self, spark: SparkSession, staging: str, meta: TableMetadata
    ) -> list[DataFile]:
        """Per-file stats for freshly written files, harvested from parquet
        FOOTERS driver-side (row counts + key min/max live in the metadata
        already — no data is re-read and no Spark job runs; this is how
        manifest writers work in real table formats). Falls back to a
        column-pruned Spark aggregation if a footer lacks statistics.

        Bounds are recorded for identifier fields, sort-order columns, and
        any columns named in the ``write.stats-columns`` table property
        (comma-separated) — the knob a clustered rewrite sets so its sort
        keys become prunable."""
        names = {f.name for f in meta.schema.fields}
        extra = [
            c.strip()
            for c in meta.properties.get("write.stats-columns", "").split(",")
            if c.strip()
        ]
        seen: set[str] = set()
        key_cols = [
            c
            for c in [*meta.identifier_fields, *meta.sort_order, *extra]
            if c in names and not (c in seen or seen.add(c))
        ]
        paths = []
        for root, _dirs, names in os.walk(staging):
            for n in names:
                if n.endswith(".parquet"):
                    paths.append(os.path.join(root, n))
        try:
            import pyarrow.parquet as pq

            files: list[DataFile] = []
            for path in sorted(paths):
                md = pq.ParquetFile(path).metadata  # may raise on logical
                # types this pyarrow doesn't know (e.g. Variant) -> fallback
                names = {md.schema.column(i).name: i for i in range(md.num_columns)}
                bounds: dict[str, list] = {}
                for c in key_cols:
                    ci = names.get(c)
                    if ci is None:
                        continue
                    mn = mx = None
                    ok = True
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if st is None or not st.has_min_max:
                            ok = False
                            break
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                    if ok and mn is not None:
                        bounds[c] = [_jsonable(mn), _jsonable(mx)]
                files.append(
                    DataFile(
                        path,
                        md.num_rows,
                        _partition_values_from_path(path, meta.partition_spec),
                        bounds,
                        os.path.getsize(path),
                    )
                )
            return files
        except Exception:
            pass  # unreadable footer (unknown logical type) -> Spark stats

        newly = spark.read.parquet(staging)
        aggs = [F.count(F.lit(1)).alias("_rows")]
        for c in key_cols:
            aggs.append(F.min(c).alias(f"_min_{c}"))
            aggs.append(F.max(c).alias(f"_max_{c}"))
        stats = (
            newly.withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(*aggs)
            .collect()
        )
        files = []
        for row in stats:
            path = row["_file"]
            if path.startswith("file:"):
                path = path[len("file:"):]
            partition = _partition_values_from_path(path, meta.partition_spec)
            bounds = {}
            for c in key_cols:
                mn, mx = row[f"_min_{c}"], row[f"_max_{c}"]
                if mn is not None:
                    bounds[c] = [_jsonable(mn), _jsonable(mx)]
            try:
                nbytes = os.path.getsize(path)
            except OSError:
                nbytes = 0
            files.append(DataFile(path, row["_rows"], partition, bounds, nbytes))
        return files

    def _resplit_oversize_staged(
        self,
        spark: SparkSession,
        staging: str,
        files: list[DataFile],
        meta: TableMetadata,
        key_cols: list[str],
    ) -> list[DataFile]:
        """Safety net for the single-file keyed fast path: when the plan
        estimate UNDERshot and the one staged file materially exceeds the
        target file size, re-range it into properly sized files.  The
        re-split reads the already-staged columnar copy (cheap), never the
        upstream plan; in the common CDC-sized case the footer check costs
        nothing and no job runs."""
        target = int(
            meta.properties.get("write.target-file-size-bytes", 512 * 1024 * 1024)
        )
        total = sum(f.bytes for f in files)
        if total <= 2 * target or not files:
            return files
        n2 = max(2, -(-total // target))
        restage = os.path.join(self.data_dir, uuidlib.uuid4().hex)
        try:
            # the staged file already holds exactly the output columns
            # (incl. any preserve_lineage columns) — re-range as-is.
            # Mirror _stage_write's layout contract: in-partition order is
            # the declared sort order (falling back to key_cols) and the
            # write.max-records-per-file rolling cap re-applies — a table
            # whose sort order differs from its identifier fields must not
            # lose its WRITE ORDERED BY clustering to the re-split.
            frame = spark.read.parquet(staging).repartitionByRange(
                n2, *key_cols
            )
            sort_cols = [
                c
                for c in (meta.sort_order or key_cols)
                if c in frame.columns
            ]
            if sort_cols:
                frame = frame.sortWithinPartitions(*sort_cols)
            writer = frame.write.mode("error")
            max_recs = meta.properties.get("write.max-records-per-file")
            if max_recs:
                writer = writer.option("maxRecordsPerFile", int(max_recs))
            writer.parquet(restage)
            _uniquify_staged(restage)
        except Exception:
            shutil.rmtree(restage, ignore_errors=True)
            raise
        shutil.rmtree(staging, ignore_errors=True)
        return self._collect_stats(spark, restage, meta)

    def _abort_staged(
        self, add: list[DataFile], deletes: list[DeleteFile] | None = None
    ) -> None:
        """Discard staged-but-uncommitted files (W12 abort path: the
        reference's writer.abort(), IcebergTableOperator.java:229-237).
        Staged files live under a per-write uuid directory inside data_dir;
        removing those roots cannot touch committed files, which are never
        re-staged."""
        roots: set[str] = set()
        for f in list(add) + list(deletes or []):
            rel = os.path.relpath(f.path, self.data_dir)
            top = rel.split(os.sep)[0]
            if top and top != "..":
                roots.add(os.path.join(self.data_dir, top))
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)

    def append(
        self, df: DataFrame, summary: dict | None = None, branch: str = "main"
    ) -> int:
        """Append commit (reference AppendFiles, IcebergTableOperator.java:224-228).

        Returns the number of rows committed — read from the staged files'
        own stats, so no extra Spark action runs.  ``branch`` appends onto a
        named branch ref (write-audit-publish staging) instead of main."""
        meta = self.metadata()
        add = self._stage_write(df, meta)
        try:
            self._commit_snapshot("append", add, set(), summary, branch=branch)
        except Exception:
            self._abort_staged(add)
            raise
        return sum(f.rows for f in add)

    def overwrite(self, df: DataFrame, summary: dict | None = None) -> None:
        """Full-table overwrite (reference OverwriteFiles alwaysTrue,
        IcebergOffsetBackingStore.java:219-223)."""
        meta = self.metadata()
        add = self._stage_write(df, meta)
        try:
            self._commit_snapshot("overwrite", add, set(), summary)
        except Exception:
            self._abort_staged(add)
            raise

    def truncate(self, summary: dict | None = None) -> None:
        """Overwrite commit with ZERO data files: clears the table without
        running a Spark job at all (an ``overwrite(empty_df)`` stages a
        full write job just to produce nothing).  Metadata-only — one
        manifest + one metadata version, same observable state as
        overwriting with an empty frame."""
        self._commit_snapshot("overwrite", [], set(), summary)

    def commit_delta(
        self,
        add_df: DataFrame,
        remove_paths: Iterable[str],
        summary: dict | None = None,
        target_partitions: int | None = None,
        drop_deletes: bool = False,
        preserve_layout: bool = False,
        preserve_lineage: bool = False,
    ) -> None:
        """RowDelta-style commit: atomically swap rewritten files
        (IcebergTableOperator.java:218-224). Used by the MERGE operator.
        ``preserve_lineage``: physically materialize ``_row_id`` /
        ``_last_updated_sequence_number`` columns present on ``add_df``
        (rewrite paths only — see ``_stage_write``)."""
        meta = self.metadata()
        add = (
            self._stage_write(
                add_df, meta, target_partitions, preserve_layout,
                preserve_lineage,
            )
            if add_df is not None
            else []
        )
        try:
            self._commit_snapshot(
                "delta", add, set(remove_paths), summary, drop_deletes=drop_deletes
            )
        except Exception:
            self._abort_staged(add)
            raise

    def commit_row_delta(
        self,
        add_df: DataFrame | None,
        delete_keys_df: DataFrame | None,
        summary: dict | None = None,
        delete_target_files: int = 1,
        delete_positions_df: DataFrame | None = None,
        branch: str = "main",
    ) -> tuple[int, int]:
        """Merge-on-read upsert commit: append new data files AND delete
        files in ONE atomic snapshot — no existing data file is rewritten.

        ``delete_keys_df`` stages an equality-delete file of source keys
        (v2 semantics; the reference's equality-delta writer,
        BaseDeltaTaskWriter.java:60-71 deleteKey-then-write,
        IcebergTableWriterFactory.java:97-108 equality field ids).
        ``delete_positions_df`` — columns ``(file_name, pos)`` — stages a
        position-delete file instead (v3 deletion-vector semantics,
        IcebergConfig.java:106-108 / PartitioningDVWriter).  Both may be
        combined.  Returns (added_rows, delete_rows)."""
        meta = self.metadata()
        key_cols = [
            c for c in meta.identifier_fields if c in {f.name for f in meta.schema.fields}
        ]
        if not key_cols:
            raise ValueError("commit_row_delta requires identifier fields")

        def _stage_add() -> list[DataFile]:
            return self._stage_write(add_df, meta) if add_df is not None else []

        def _stage_posdel() -> list[DeleteFile]:
            if delete_positions_df is None:
                return []
            staging = os.path.join(self.data_dir, "posdel-" + uuidlib.uuid4().hex)
            out: list[DeleteFile] = []
            try:
                (
                    delete_positions_df.select(
                        F.col("file_name").cast("string"),
                        F.col("pos").cast("long"),
                    )
                    .coalesce(1)
                    .sortWithinPartitions("file_name", "pos")
                    .write.mode("error")
                    .parquet(staging)
                )
                _uniquify_staged(staging)
                for f in self._collect_stats(
                    delete_positions_df.sparkSession, staging, meta
                ):
                    if f.rows:
                        out.append(
                            DeleteFile(
                                # file_name min/max bounds let the read
                                # side prune this delete from scans that
                                # keep none of the named files
                                f.path, f.rows, 0, [], _posdel_bounds(f.path),
                                f.bytes, content="position",
                            )
                        )
                    else:  # empty batch touched nothing: drop the file
                        os.remove(f.path)
                return out
            except Exception:
                shutil.rmtree(staging, ignore_errors=True)
                raise

        def _stage_eqdel() -> list[DeleteFile]:
            if delete_keys_df is None:
                return []
            staging = os.path.join(self.data_dir, "deletes-" + uuidlib.uuid4().hex)
            try:
                # few small files per batch: a CDC batch's distinct keys are
                # tiny relative to the table; key-clustered + sorted so footer
                # min/max bounds are tight for scan-side pruning (callers size
                # delete_target_files up for snapshot-load-sized batches)
                keys = delete_keys_df.select(*key_cols)
                keys = (
                    keys.repartitionByRange(delete_target_files, *key_cols)
                    if delete_target_files > 1
                    else keys.coalesce(1)
                )
                (
                    keys.sortWithinPartitions(*key_cols)
                    .write.mode("error")
                    .parquet(staging)
                )
                _uniquify_staged(staging)
                return [
                    DeleteFile(f.path, f.rows, 0, list(key_cols), f.bounds, f.bytes)
                    for f in self._collect_stats(
                        (add_df or delete_keys_df).sparkSession, staging, meta
                    )
                ]
            except Exception:
                shutil.rmtree(staging, ignore_errors=True)
                raise

        # The 2-3 staging writes are INDEPENDENT Spark jobs over different
        # inputs into different staging dirs — submit them concurrently so
        # the per-job driver fixed cost (scheduling + commit + footer
        # stats) overlaps instead of serializing (guide §2.6: actions are
        # only sequential because driver code calls them sequentially).
        # Every MoR upsert pays this per commit; each staging keeps its
        # own abort, and a failure aborts whatever the others staged.
        stages = [_stage_add, _stage_posdel, _stage_eqdel]
        n_live = sum(
            x is not None for x in (add_df, delete_positions_df, delete_keys_df)
        )
        add: list[DataFile] = []
        add_deletes: list[DeleteFile] = []
        if n_live > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=n_live) as pool:
                futs = [pool.submit(fn) for fn in stages]
                results, first_err = [], None
                for fut in futs:
                    try:
                        results.append(fut.result())
                    except Exception as e:  # keep draining: abort needs all
                        results.append(None)
                        first_err = first_err or e
            if first_err is not None:
                staged_add = results[0] or []
                staged_dels = [d for r in results[1:] if r for d in r]
                self._abort_staged(staged_add, staged_dels)
                raise first_err
            add = results[0]
            add_deletes = results[1] + results[2]
        else:
            try:
                add = _stage_add()
                add_deletes = _stage_posdel() + _stage_eqdel()
            except Exception:
                self._abort_staged(add, add_deletes)
                raise
        try:
            self._commit_snapshot(
                "rowdelta", add, set(), summary, add_deletes=add_deletes,
                branch=branch,
            )
        except Exception:
            self._abort_staged(add, add_deletes)
            raise
        return (sum(f.rows for f in add), sum(d.rows for d in add_deletes))

    def update_schema(self, new_schema: T.StructType) -> None:
        """Schema-evolution commit; no data movement (ALTER TABLE ADD COLUMNS
        equivalent of IcebergTableOperator.java:136-151)."""
        self._commit_snapshot("evolve", [], set(), None, new_schema=new_schema)

    def update_partition_spec(self, spec: "list[PartitionField] | str") -> None:
        """Partition-spec evolution (Iceberg ALTER TABLE ADD/REPLACE
        PARTITION FIELD — spec change is metadata-only): existing data files
        keep the layout and manifest partition values they were written
        with and stay fully scannable (planners treat old-spec files as
        unprunable by the new spec); only NEW writes use the new spec.
        ``compact()`` migrates old files to the current spec as a side
        effect, like Iceberg's rewrite_data_files."""
        from .transforms import parse_partition_spec

        for attempt in range(5):
            meta = self.metadata()
            names = {f.name for f in meta.schema.fields}
            new = (
                parse_partition_spec(spec, names)
                if isinstance(spec, str)
                else list(spec)
            )
            for pf in new:
                if pf.source not in names:
                    raise ValueError(
                        f"partition source column {pf.source!r} not in schema"
                    )
            meta.partition_spec = new
            try:
                self._write_metadata(meta, expected_version=meta.version)
                return
            except CommitConflict:
                if attempt == 4:
                    raise
                time.sleep(0.05 * (attempt + 1))

    # ------------------------------------------------- refs (tags/branches)

    def _set_ref(self, name: str, ref_type: str, snapshot_id: int | None) -> None:
        if name == "main":
            raise ValueError("'main' is the implicit current-snapshot ref")
        for attempt in range(5):
            meta = self.metadata()
            sid = snapshot_id if snapshot_id is not None else meta.current_snapshot_id
            if sid is None or all(s.snapshot_id != sid for s in meta.snapshots):
                raise ValueError(f"no snapshot {sid} to reference")
            meta.refs[name] = {"snapshot_id": sid, "type": ref_type}
            try:
                self._write_metadata(meta, expected_version=meta.version)
                return
            except CommitConflict:
                if attempt == 4:
                    raise
                time.sleep(0.05 * (attempt + 1))

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Immutable named pointer at a snapshot (Iceberg CREATE TAG):
        reproducible reads — ``to_df(spark, ref=name)`` pins the exact
        table state a training run / report was built from."""
        self._set_ref(name, "tag", snapshot_id)

    def create_branch(self, name: str, snapshot_id: int | None = None) -> None:
        """Writable named lineage (Iceberg CREATE BRANCH): commits with
        ``branch=name`` advance only this ref — the write-audit-publish
        staging area."""
        self._set_ref(name, "branch", snapshot_id)

    def drop_ref(self, name: str) -> None:
        for attempt in range(5):
            meta = self.metadata()
            if name not in meta.refs:
                raise ValueError(f"no ref named {name!r}")
            del meta.refs[name]
            try:
                self._write_metadata(meta, expected_version=meta.version)
                return
            except CommitConflict:
                if attempt == 4:
                    raise
                time.sleep(0.05 * (attempt + 1))

    def refs(self) -> dict[str, dict]:
        """All named refs, including the implicit main branch."""
        meta = self.metadata()
        out = dict(meta.refs)
        if meta.current_snapshot_id is not None:
            out["main"] = {"snapshot_id": meta.current_snapshot_id, "type": "branch"}
        return out

    def resolve_ref(self, name: str) -> int | None:
        meta = self.metadata()
        if name == "main":
            return meta.current_snapshot_id
        ref = meta.refs.get(name)
        if ref is None:
            raise ValueError(f"no ref named {name!r}")
        return ref["snapshot_id"]

    def fast_forward(self, branch: str) -> int:
        """Publish a branch: fast-forward main to the branch head (the
        Iceberg ``fast_forward`` procedure — the atomic "publish" step of
        write-audit-publish).  Requires main's head to be an ancestor of the
        branch head (walks ``parent_id`` lineage), so nothing committed to
        main since the branch diverged can be silently dropped.  Returns the
        new current snapshot id."""
        for attempt in range(5):
            meta = self.metadata()
            ref = meta.refs.get(branch)
            if ref is None or ref.get("type") != "branch":
                raise ValueError(f"no branch named {branch!r}")
            head = ref["snapshot_id"]
            by_id = {s.snapshot_id: s for s in meta.snapshots}
            anc = head
            while anc is not None and anc != meta.current_snapshot_id:
                anc = by_id[anc].parent_id if anc in by_id else None
            if meta.current_snapshot_id is not None and anc != meta.current_snapshot_id:
                raise ValueError(
                    f"main ({meta.current_snapshot_id}) is not an ancestor of "
                    f"branch {branch!r} head ({head}); cannot fast-forward"
                )
            meta.current_snapshot_id = head
            try:
                self._write_metadata(meta, expected_version=meta.version)
                return head
            except CommitConflict:
                if attempt == 4:
                    raise
                time.sleep(0.05 * (attempt + 1))
        return head

    # --------------------------------------------------------- maintenance

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int | None = None,
        min_input_files: int = 2,
        max_input_files: int | None = None,
    ) -> int:
        """rewrite_data_files: bin-pack small files into ~target-size ones.

        The reference only *documents* compaction as required upsert hygiene
        (docs/faq.md:5-7); here it is a first-class table op. Small files
        (< 75% of target) are read back and rewritten as
        ceil(total_bytes/target) files in one job; the swap is an atomic
        delta commit, so readers never see a partial state. Partition
        transforms are recomputed from the rows, so compaction preserves
        the partition layout by construction.

        ``max_input_files`` bounds ONE run's rewrite work (Iceberg's
        ``max-file-group-size-bytes`` idea on the file-count axis): the
        SMALLEST files compact first, the rest wait for the next cadence
        call.  Without a cap, a maintenance cadence on a corpus-scale
        table would re-select every sub-threshold file and rewrite an
        unbounded slice of the table per trigger; with it, repeated calls
        converge (each pass strictly reduces small-file count) while
        per-call cost stays O(cap) regardless of table size.

        Returns the number of files removed.
        """
        target = target_file_bytes or int(
            self.metadata().properties.get("write.target-file-size-bytes", 512 * 1024 * 1024)
        )
        files = self.current_files()
        small = [f for f in files if 0 < f.bytes < target * 0.75]
        if max_input_files is not None and len(small) > max_input_files:
            small = sorted(small, key=lambda f: (f.bytes, f.path))[:max_input_files]
        if len(small) < min_input_files:
            return 0
        total = sum(f.bytes for f in small)
        n_out = max(1, -(-total // target))  # ceil
        ln = self._lineage_on()
        data = self.scan_files(spark, small, lineage=ln)
        self.commit_delta(
            data,
            [f.path for f in small],
            summary={"operation_detail": "compact", "input_files": len(small)},
            target_partitions=int(n_out),
            preserve_lineage=ln,
        )
        return len(small)

    def rewrite_sorted(
        self,
        spark: SparkSession,
        sort_by: list[str],
        zorder: bool = False,
        target_file_bytes: int | None = None,
        zorder_bits: int = 16,
    ) -> int:
        """Clustered rewrite (Iceberg's rewrite_data_files sort / zorder
        strategies): rewrite ALL current data with rows range-clustered on
        ``sort_by`` — or, with ``zorder=True``, on an interleaved-bit Morton
        code over the columns — so each file covers a narrow range of the
        cluster key(s) and min/max file bounds actually prune scans.

        Why this matters at 100 TB: bounds pruning is only as good as the
        correlation between files and key ranges.  A lexicographic sort
        prunes the leading column only; a z-order curve gives every listed
        column partial locality, so multi-dimensional point/range lookups
        skip most files.  The z-code is computed IN-PLAN from per-column
        min/max (one tiny aggregate job) — no window functions, no global
        rank, so the shuffle is an ordinary range partition on the code.

        Also materializes outstanding merge-on-read deletes (the rewrite
        reads through them) and records file bounds for ``sort_by`` via the
        ``write.stats-columns`` property.  Returns files rewritten."""
        meta = self.metadata()
        names = {f.name for f in meta.schema.fields}
        missing = [c for c in sort_by if c not in names]
        if missing:
            raise ValueError(f"sort columns not in schema: {missing}")
        files = self._manifest_files(meta)
        if not files:
            return 0
        # make the cluster keys prunable in future stats BEFORE staging
        self.update_properties(**{"write.stats-columns": ",".join(sort_by)})
        ln = self._lineage_on(meta)
        data = self.to_df(spark, lineage=ln)
        target = target_file_bytes or int(
            meta.properties.get("write.target-file-size-bytes", 512 * 1024 * 1024)
        )
        total = sum(f.bytes for f in files)
        n_out = max(1, -(-total // target))
        if zorder:
            cluster = _zvalue_col(data, sort_by, meta.schema, zorder_bits)
            shaped = (
                data.withColumn("_zv", cluster)
                .repartitionByRange(int(n_out), F.col("_zv"))
                .sortWithinPartitions("_zv")
                .drop("_zv")
            )
        else:
            shaped = data.repartitionByRange(
                int(n_out), *[F.col(c) for c in sort_by]
            ).sortWithinPartitions(*sort_by)
        self.commit_delta(
            shaped,
            [f.path for f in files],
            summary={
                "operation_detail": "rewrite_sorted",
                "zorder": bool(zorder),
                "sort_by": ",".join(sort_by),
            },
            drop_deletes=True,
            preserve_layout=True,
            preserve_lineage=ln,
        )
        return len(files)

    def materialize_deletes(self, spark: SparkSession) -> int:
        """Rewrite-the-deletes maintenance (Iceberg's rewrite_position_deletes
        / the reference's documented upsert compaction hygiene, docs/faq.md:5-7):
        rewrite every data file an equality delete could still hit — older
        than some delete AND key-bounds-overlapping it — with deletes applied,
        then drop all delete files in the same atomic commit. Read
        amplification returns to zero; untouched files are not rewritten.

        Returns the number of data files rewritten."""
        meta = self.metadata()
        deletes = self._manifest_deletes(meta)
        if not deletes:
            return 0
        files = self._manifest_files(meta)
        key_cols = [
            c for c in meta.identifier_fields if c in {f.name for f in meta.schema.fields}
        ]
        eq_dels = [d for d in deletes if d.content != "position"]
        pos_dels = [d for d in deletes if d.content == "position"]
        # position deletes name their victims exactly: one tiny read of the
        # delete files' distinct file_name column (bounded by delete rows)
        pos_names: set[str] = set()
        if pos_dels:
            pos_names = {
                r["file_name"]
                for r in spark.read.schema("file_name string, pos long")
                .parquet(*[d.path for d in pos_dels])
                .select("file_name")
                .distinct()
                .collect()
            }

        def hit(f: DataFile) -> bool:
            if os.path.basename(f.path) in pos_names:
                return True
            for d in eq_dels:
                if f.seq >= d.seq:
                    continue
                if _bounds_intersect(f.bounds, d.bounds, key_cols):
                    return True
            return False

        affected = [f for f in files if hit(f)]
        ln = self._lineage_on(meta)
        clean = (
            self._read(spark, meta, affected, deletes, lineage=ln)
            if affected
            else None
        )
        self.commit_delta(
            clean,
            [f.path for f in affected],
            summary={"operation_detail": "materialize-deletes", "input_files": len(affected)},
            drop_deletes=True,
            preserve_lineage=ln,
        )
        return len(affected)

    def expire_snapshots(self, keep_last: int = 1) -> int:
        """Drop all but the newest ``keep_last`` snapshots and delete data
        files referenced only by the expired ones (Iceberg's
        expire_snapshots maintenance procedure). Returns files deleted."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        for attempt in range(5):
            meta = self.metadata()
            if len(meta.snapshots) <= keep_last:
                return 0
            # snapshots pinned by named refs (tags/branch heads) are never
            # expired — same protection Iceberg's procedure applies
            pinned = {r["snapshot_id"] for r in meta.refs.values()}
            keep = [
                s
                for i, s in enumerate(meta.snapshots)
                if i >= len(meta.snapshots) - keep_last or s.snapshot_id in pinned
            ]
            expired = [s for s in meta.snapshots if s not in keep]
            if not expired:
                return 0
            def _all_paths(sid: int) -> set[str]:
                e = self._manifest_entry(meta, sid)
                return {f["path"] for f in e["files"]} | {
                    d["path"] for d in e["delete_files"]
                }

            live_paths = set().union(*(_all_paths(s.snapshot_id) for s in keep))
            dead_paths = (
                set().union(*(_all_paths(s.snapshot_id) for s in expired)) - live_paths
            )
            old_manifests = [s.manifest for s in expired]
            meta.snapshots = keep
            try:
                self._write_metadata(meta, expected_version=meta.version)
            except CommitConflict:
                if attempt == 4:
                    raise
                time.sleep(0.05 * (attempt + 1))
                continue
            for p in dead_paths:
                try:
                    os.remove(p)
                except OSError:
                    pass
            for m in old_manifests:
                try:
                    os.remove(os.path.join(self.meta_dir, m))
                except OSError:
                    pass
            return len(dead_paths)
        return 0

    def remove_orphan_files(self, older_than_seconds: float = 86400.0) -> list[str]:
        """Delete data-dir files no retained snapshot references (Iceberg's
        remove_orphan_files maintenance procedure; completes the W12 abort
        story — a writer that died between staging and ``_abort_staged``
        leaves files this pass reclaims).

        Only files whose mtime is older than ``older_than_seconds`` are
        deleted: anything younger may belong to a concurrent in-flight
        write whose commit hasn't landed yet (the same grace-period rule
        Iceberg's procedure applies, default 3 days — ours defaults to one
        day since CDC commits land in seconds).  Returns deleted paths."""
        meta = self.metadata()
        referenced: set[str] = set()
        for s in meta.snapshots:
            e = self._manifest_entry(meta, s.snapshot_id)
            referenced |= {os.path.realpath(f["path"]) for f in e["files"]}
            referenced |= {os.path.realpath(d["path"]) for d in e["delete_files"]}
        cutoff = time.time() - older_than_seconds
        removed: list[str] = []
        for root, _dirs, names in os.walk(self.data_dir):
            for n in names:
                p = os.path.join(root, n)
                try:
                    if os.path.realpath(p) in referenced or os.path.getmtime(p) > cutoff:
                        continue
                    os.remove(p)
                    removed.append(p)
                except OSError:
                    continue
        # sweep now-empty staging directories
        for root, dirs, names in os.walk(self.data_dir, topdown=False):
            if root != self.data_dir and not dirs and not names:
                try:
                    os.rmdir(root)
                except OSError:
                    pass
        return removed

    # ------------------------------------------------------------- read ops

    def to_df(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        ref: str | None = None,
        lineage: bool = False,
        row_filter: dict | None = None,
        partition_values: dict[str, set] | None = None,
    ) -> DataFrame:
        """Current (or time-travel / ref) table contents as a DataFrame.

        Reads with the table's logical schema: files written before a column
        was added yield nulls for it (schema evolution on read). Equality
        deletes recorded in the (possibly historical) manifest are applied
        at scan time — the merge-on-read half of the format.  ``ref`` reads
        at a named tag or branch head (Iceberg's VERSION AS OF 'ref').

        ``lineage=True`` appends the Iceberg v3 row-lineage columns
        ``_row_id`` and ``_last_updated_sequence_number``: materialized
        values written by a rewrite win, else they are derived in-plan as
        ``first_row_id + parquet row position`` / the file's data sequence
        number (the v3 inheritance rule).  Rows from files committed before
        the table carried ``format-version>=3`` surface null ids.

        ``row_filter`` is Iceberg's planFiles model: a dict of
        ``column -> scalar`` (equality) or ``column -> (lo, hi)``
        (inclusive range) predicates.  Files are pruned DRIVER-SIDE before
        any Spark job using (a) hidden-partition transform values —
        equality on a bucket column computes the murmur3 bucket, temporal
        transforms map value ranges to their path encodings — and (b)
        per-file column min/max bounds; the residual predicate is then
        applied in-plan, so results are EXACTLY ``to_df().filter(...)``
        while a point lookup touches only the files that can match.  At
        100 TB this is the difference between a manifest scan and a
        table scan.

        ``partition_values`` is a PLANNING primitive for probe joins:
        a dict of PHYSICAL partition-field name (``PartitionField.name``,
        e.g. ``_p_bucket32_band_val``) -> set of allowed partition values.
        Files whose stamped partition value falls outside the set are
        pruned driver-side; files a value can't be trusted for (old-spec
        layouts, unstamped bucket hashes, hive-default/null values) are
        conservatively KEPT.  Unlike ``row_filter`` NO residual predicate
        is applied — the caller's own join/filter must provide exactness;
        the contract is only "every row that could match the caller's
        predicate survives pruning", which holds because a partition
        transform is a pure function of the source column."""
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or ref, not both")
            snapshot_id = self.resolve_ref(ref)
        meta = self.metadata()
        files = self._manifest_files(meta, snapshot_id)
        deletes = self._manifest_deletes(meta, snapshot_id)
        if row_filter:
            files = _prune_files_by_filter(
                meta, files, row_filter,
                session_tz=spark.conf.get("spark.sql.session.timeZone"),
            )
        if partition_values:
            files = _prune_files_by_partition_values(meta, files, partition_values)
        df = self._read(spark, meta, files, deletes, lineage=lineage)
        if row_filter:
            for col, want in row_filter.items():
                if isinstance(want, tuple):
                    df = df.filter(F.col(col).between(want[0], want[1]))
                else:
                    df = df.filter(F.col(col) == F.lit(want))
        return df

    def changed_rows_since(
        self, spark: SparkSession, snapshot_id: int,
        include_deletes: bool = False,
    ) -> DataFrame:
        """Changed-row scan on v3 row lineage: the CURRENT post-image of
        every row created or updated after ``snapshot_id``, exactly once,
        with the lineage columns attached.

        Complements :meth:`incremental_scan` (append-only file feed, errors
        across rewrites): this one reads through merge-on-read deletes and
        survives compaction, because identity comes from the row-level
        ``_last_updated_sequence_number``, not from which file a row sits
        in.

        ``include_deletes=True`` adds a ``_change_type`` column
        (``'upsert'`` on post-images) and emits one ``'delete'`` row —
        the PRE-image as of ``snapshot_id``, with its lineage columns —
        for every key live at the snapshot whose key no longer exists
        (Iceberg changelog semantics; a CDC consumer republishing
        downstream replays these as DELETEs).  Requires identifier
        fields.  A key deleted and re-inserted surfaces as an upsert
        only, like a MERGE would treat it.

        Scale: manifest pruning does the heavy lifting — a data file whose
        sequence number is ≤ ``snapshot_id`` can only hold rows last
        updated at or before it (inheritance assigns the file's own
        sequence; materialized values from rewrites are always older than
        the rewrite's sequence), so only files committed after the
        snapshot are scanned: cost ∝ new + rewritten data, not table
        size.  The residual filter drops pre-existing rows that rewrites
        carried into new files.  Delete images are bounded the same way:
        candidate victims come only from delete files committed after the
        snapshot, files those deletes target, and files removed from the
        manifest since (CoW / materializing rewrites); both snapshot
        scans are then key-bounds-pruned to candidate ranges.  As with
        Iceberg changelogs, compaction between the two snapshots widens
        the candidate set to the rewritten files — tail changelogs before
        compacting."""
        meta = self.metadata()
        if not self._lineage_on(meta):
            # without per-row lineage a rewrite re-sequences every carried
            # row — silently reporting them all as changed; fail loudly
            raise ValueError(
                "changed_rows_since requires format-version>=3 (row lineage)"
            )
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        if snapshot_id not in by_id:
            raise ValueError(f"no snapshot {snapshot_id} in table history")
        cur_files = self._manifest_files(meta)
        cur_deletes = self._manifest_deletes(meta)
        files = [f for f in cur_files if f.seq > snapshot_id]
        post = self._read(spark, meta, files, cur_deletes, lineage=True).filter(
            F.col(LAST_SEQ_COL) > snapshot_id
        )
        if not include_deletes:
            return post
        key_cols = [
            c for c in meta.identifier_fields
            if c in {f.name for f in meta.schema.fields}
        ]
        if not key_cols:
            raise ValueError(
                "include_deletes requires identifier fields (delete images "
                "are keyed on the primary key)"
            )
        post = post.withColumn("_change_type", F.lit("upsert"))

        # ---- candidate victim keys (∝ change volume, not table size)
        old_files = self._manifest_files(meta, snapshot_id)
        old_deletes = self._manifest_deletes(meta, snapshot_id)
        cur_paths = {f.path for f in cur_files}
        removed = [f for f in old_files if f.path not in cur_paths]
        new_dels = [d for d in cur_deletes if d.seq > snapshot_id]
        cand_parts = []
        eq_dels = [d for d in new_dels if d.content == "equality"]
        if eq_dels:
            key_schema = T.StructType(
                [f for f in meta.schema.fields if f.name in key_cols]
            )
            cand_parts.append(
                spark.read.schema(key_schema)
                .parquet(*[d.path for d in eq_dels])
                .select(*key_cols)
            )
        pos_dels = [d for d in new_dels if d.content == "position"]
        pos_targets: list[DataFile] = []
        if pos_dels:
            import pyarrow.parquet as _pq

            targeted = set()
            for d in pos_dels:
                targeted.update(
                    _pq.read_table(d.path, columns=["file_name"])
                    .column("file_name").to_pylist()
                )
            pos_targets = [
                f for f in old_files
                if os.path.basename(f.path) in targeted
            ]
        # keys of targeted/removed files over-approximate the victims; the
        # anti-join against live keys screens out survivors
        for fl in (pos_targets, removed):
            if fl:
                cand_parts.append(
                    self._read(spark, meta, fl, []).select(*key_cols)
                )
        if not cand_parts:
            return post
        cand = cand_parts[0]
        for p in cand_parts[1:]:
            cand = cand.unionByName(p)
        cand = cand.dropDuplicates(key_cols)

        # bounds-prune both snapshot scans to the candidate key ranges
        # (the MERGE planner's model: one tiny agg, then manifest math)
        stat = cand.agg(
            *[F.min(c).alias(f"_lo_{c}") for c in key_cols],
            *[F.max(c).alias(f"_hi_{c}") for c in key_cols],
        ).collect()[0]
        lo = {c: bound_key(stat[f"_lo_{c}"]) for c in key_cols}
        hi = {c: bound_key(stat[f"_hi_{c}"]) for c in key_cols}

        def _overlaps(f: DataFile) -> bool:
            for c in key_cols:
                b = f.bounds.get(c)
                if b is None or b[0] is None or b[1] is None or lo[c] is None:
                    continue
                try:
                    if bound_key(b[1]) < lo[c] or bound_key(b[0]) > hi[c]:
                        return False
                except TypeError:
                    # incomparable representations (e.g. decimal bounds
                    # persisted as strings): keep the file
                    continue
            return True

        old_pruned = [f for f in old_files if _overlaps(f)]
        cur_pruned = [f for f in cur_files if _overlaps(f)]
        old_rows = self._read(
            spark, meta, old_pruned, old_deletes, lineage=True
        )
        live_keys = self._read(
            spark, meta, cur_pruned, cur_deletes
        ).select(*key_cols)
        deleted = (
            old_rows.join(cand, key_cols, "left_semi")
            .join(live_keys, key_cols, "left_anti")
            .withColumn("_change_type", F.lit("delete"))
        )
        return post.unionByName(deleted)

    def incremental_scan(
        self,
        spark: SparkSession,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> DataFrame:
        """Incremental append scan (Iceberg's appendsBetween / Spark
        ``start-snapshot-id`` incremental read): rows in data files committed
        AFTER ``from_snapshot_id`` up to and including ``to_snapshot_id``
        (default: current head).  This is the changelog feed a downstream
        pipeline tails instead of re-reading the table: cost is proportional
        to the NEW data only — file selection is a manifest filter on
        sequence numbers, no scan of pre-existing files.

        Only append/rowdelta-added rows are surfaced (like Iceberg, which
        rejects incremental scans across overwrite/compaction snapshots —
        here files whose seq is in range but that were produced by a
        rewrite of older data raise the same way)."""
        meta = self.metadata()
        to_sid = to_snapshot_id if to_snapshot_id is not None else meta.current_snapshot_id
        by_id = {s.snapshot_id: s for s in meta.snapshots}
        for sid in (from_snapshot_id, to_sid):
            if sid is not None and sid not in by_id:
                raise ValueError(f"no snapshot {sid} in table history")
        if to_sid is None or from_snapshot_id >= to_sid:
            return spark.createDataFrame([], meta.schema)
        for s in meta.snapshots:
            if from_snapshot_id < s.snapshot_id <= to_sid and s.operation in (
                "overwrite", "delta",
            ):
                raise ValueError(
                    f"snapshot {s.snapshot_id} is a {s.operation} (rewrite); "
                    "incremental append scan is not defined across it"
                )
        files = [
            f
            for f in self._manifest_files(meta, to_sid)
            if from_snapshot_id < f.seq <= to_sid
        ]
        # deletes committed inside the range still apply to the new rows
        deletes = [
            d for d in self._manifest_deletes(meta, to_sid) if d.seq <= to_sid
        ]
        return self._read(spark, meta, files, deletes)

    def scan_files(
        self,
        spark: SparkSession,
        files: list[DataFile],
        file_col: str | None = None,
        apply_deletes: bool = True,
        lineage: bool = False,
    ) -> DataFrame:
        """Read a subset of data files (with current-snapshot equality
        deletes applied unless opted out). ``file_col`` attaches each row's
        originating manifest path as a column — resolved via a tiny
        broadcast filename->path map so it stays correct even after the
        delete anti-join (plain input_file_name() would not survive it).
        ``lineage`` as in :meth:`to_df`."""
        meta = self.metadata()
        deletes = self._manifest_deletes(meta) if apply_deletes else []
        return self._read(
            spark, meta, files, deletes, file_col=file_col, lineage=lineage
        )

    def _read(
        self,
        spark: SparkSession,
        meta: TableMetadata,
        files: list[DataFile],
        deletes: list[DeleteFile],
        file_col: str | None = None,
        lineage: bool = False,
    ) -> DataFrame:
        """Scan plan: ONE multi-file parquet read; per-file sequence numbers
        attached via a broadcast (filename -> seq) map; equality-delete rows
        removed with a single anti-join on (key columns, data.seq < del.seq).
        The delete side is a second small parquet read, broadcast when its
        manifest-known row count is CDC-batch-sized — so the whole
        merge-on-read scan is scan + broadcast-anti-join, no shuffle of the
        data side (Iceberg's read-path model for equality deletes)."""
        schema = meta.schema
        read_schema = schema
        if lineage:
            # rewritten files materialize the lineage columns physically;
            # schema-evolution read yields nulls for files that did not —
            # the in-plan inheritance expression fills those below
            read_schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField(ROW_ID_COL, T.LongType()),
                    T.StructField(LAST_SEQ_COL, T.LongType()),
                ]
            )
        if not files:
            df = spark.createDataFrame([], read_schema)
            return df.withColumn(file_col, F.lit(None).cast("string")) if file_col else df

        key_cols = [c for c in meta.identifier_fields if c in {f.name for f in schema.fields}]
        # a delete file is relevant only if some scanned file is older
        min_seq = min(f.seq for f in files)
        pos_relevant = [
            d for d in deletes if d.content == "position" and d.seq > min_seq
        ]
        relevant = (
            [d for d in deletes if d.content != "position" and d.seq > min_seq]
            if key_cols
            else []
        )
        # bounds-based delete pruning: a PRUNED scan (partition_values /
        # row_filter point lookups) must not pay tombstone-read
        # amplification for delete files that cannot touch its kept
        # files — position deletes name files explicitly (file_name
        # bounds vs kept basenames), equality deletes are range-checked
        # per key column; anything without usable bounds is kept
        basenames = sorted(os.path.basename(f.path) for f in files)
        pos_relevant = [
            d for d in pos_relevant if _delete_touches_scan(d, files, basenames)
        ]
        relevant = [
            d for d in relevant if _delete_touches_scan(d, files, basenames)
        ]

        df = spark.read.schema(read_schema).parquet(*[f.path for f in files])
        if not relevant and not pos_relevant and not file_col and not lineage:
            return df

        fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
        if lineage:
            # parquet row position, captured before any anti-join drops rows
            df = df.withColumn("_pos", F.col("_metadata.row_index"))
        if pos_relevant:
            # positional skipping: anti-join on (file name, parquet row
            # index) — integer compare per row, no key-tuple comparison
            if "_pos" not in df.columns:
                df = df.withColumn("_pos", F.col("_metadata.row_index"))
            pdels = spark.read.schema("file_name string, pos long").parquet(
                *[d.path for d in pos_relevant]
            )
            if sum(d.rows for d in pos_relevant) * 64 <= _BROADCAST_BYTES:
                pdels = F.broadcast(pdels)
            df = df.withColumn("_fname", fname).join(
                pdels,
                (F.col("_fname") == F.col("file_name"))
                & (F.col("_pos") == F.col("pos")),
                "left_anti",
            )
        else:
            df = df.withColumn("_fname", fname)
        fmap = spark.createDataFrame(
            [
                (os.path.basename(f.path), f.seq, f.path, f.first_row_id)
                for f in files
            ],
            "_fname string, _seq long, _fpath string, _frid long",
        )
        df = df.join(F.broadcast(fmap), "_fname")

        if relevant:
            key_schema = T.StructType([f for f in schema.fields if f.name in key_cols])
            dels = spark.read.schema(key_schema).parquet(*[d.path for d in relevant])
            dmap = spark.createDataFrame(
                [(os.path.basename(d.path), d.seq) for d in relevant],
                "_fname string, _dseq long",
            )
            dels = (
                dels.withColumn("_fname", fname)
                .join(F.broadcast(dmap), "_fname")
                .select(
                    *[F.col(c).alias(f"_d_{c}") for c in key_cols], "_dseq"
                )
            )
            # broadcast the delete side when manifest stats say it's small
            del_rows = sum(d.rows for d in relevant)
            if del_rows * _est_row_width(key_schema) <= _BROADCAST_BYTES:
                dels = F.broadcast(dels)
            cond = F.col("_seq") < F.col("_dseq")
            for c in key_cols:
                cond = cond & (F.col(c) == F.col(f"_d_{c}"))
            df = df.join(dels, cond, "left_anti")

        keep = [f.name for f in schema.fields]
        if lineage:
            # v3 inheritance: a materialized value (rewritten file) wins;
            # otherwise first_row_id + position / the file's sequence number
            df = df.withColumn(
                ROW_ID_COL,
                F.coalesce(F.col(ROW_ID_COL), F.col("_frid") + F.col("_pos")),
            ).withColumn(
                LAST_SEQ_COL, F.coalesce(F.col(LAST_SEQ_COL), F.col("_seq"))
            )
            keep = keep + [ROW_ID_COL, LAST_SEQ_COL]
        if file_col:
            df = df.withColumn(file_col, F.col("_fpath"))
            keep = keep + [file_col]
        return df.select(*keep)

    def row_count(self) -> int:
        """PHYSICAL data rows (Iceberg's total-records semantics): does not
        subtract equality-deleted rows — a delete key may match zero rows,
        so the live count is only knowable at scan time (``to_df().count()``).
        Exact whenever the table has no delete files."""
        return sum(f.rows for f in self.current_files())

    def metadata_df(self, spark: SparkSession, kind: str) -> DataFrame:
        """Metadata tables (Iceberg's ``tbl.snapshots`` / ``tbl.files`` /
        ``tbl.partitions`` / ``tbl.refs`` inspection surface, which the
        reference gets for free from the Iceberg library).  Row counts are
        bounded by file/snapshot counts (planning-scale, not data-scale), so
        driver-side construction is the same cost class as Iceberg's own
        manifest-reading metadata scans."""
        meta = self.metadata()
        if kind == "snapshots":
            rows = [
                (
                    s.snapshot_id,
                    s.parent_id,
                    s.timestamp_ms,
                    s.operation,
                    s.manifest,
                    json.dumps(s.summary, sort_keys=True),
                    s.snapshot_id == meta.current_snapshot_id,
                )
                for s in meta.snapshots
            ]
            return spark.createDataFrame(
                rows,
                "snapshot_id long, parent_id long, timestamp_ms long, "
                "operation string, manifest string, summary string, "
                "is_current boolean",
            )
        if kind == "files":
            rows = [
                (
                    f.path, f.rows, f.bytes, f.seq,
                    json.dumps(f.partition, sort_keys=True),
                    json.dumps(f.bounds, sort_keys=True),
                )
                for f in self._manifest_files(meta)
            ]
            return spark.createDataFrame(
                rows,
                "file_path string, record_count long, file_size_bytes long, "
                "sequence_number long, partition string, bounds string",
            )
        if kind == "delete_files":
            rows = [
                (
                    d.path, d.rows, d.bytes, d.seq, d.content,
                    ",".join(d.equality_cols),
                )
                for d in self._manifest_deletes(meta)
            ]
            return spark.createDataFrame(
                rows,
                "file_path string, record_count long, file_size_bytes long, "
                "sequence_number long, content string, equality_columns string",
            )
        if kind == "partitions":
            agg: dict[str, list[int]] = {}
            for f in self._manifest_files(meta):
                key = json.dumps(f.partition, sort_keys=True)
                cur = agg.setdefault(key, [0, 0, 0])
                cur[0] += 1
                cur[1] += f.rows
                cur[2] += f.bytes
            rows = [(k, v[0], v[1], v[2]) for k, v in sorted(agg.items())]
            return spark.createDataFrame(
                rows,
                "partition string, file_count long, record_count long, "
                "total_size_bytes long",
            )
        if kind == "refs":
            refs = dict(meta.refs)
            if meta.current_snapshot_id is not None:
                refs["main"] = {
                    "snapshot_id": meta.current_snapshot_id, "type": "branch"
                }
            rows = [
                (name, r["type"], r["snapshot_id"]) for name, r in sorted(refs.items())
            ]
            return spark.createDataFrame(
                rows, "name string, type string, snapshot_id long"
            )
        if kind == "history":
            return self.history(spark)
        raise ValueError(
            f"unknown metadata table {kind!r} "
            "(snapshots|files|delete_files|partitions|refs|history)"
        )

    def history(self, spark: SparkSession) -> DataFrame:
        """Snapshot history as a DataFrame (the SQL-visible operational
        surface the reference gets from its Iceberg state tables): one row
        per snapshot with operation, counts, and summary JSON."""
        meta = self.metadata()
        rows = [
            (
                s.snapshot_id,
                s.timestamp_ms,
                s.operation,
                int(s.summary.get("added_files", 0)),
                int(s.summary.get("removed_files", 0)),
                int(s.summary.get("total_rows", 0)),
                json.dumps(s.summary, sort_keys=True),
            )
            for s in meta.snapshots
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id long, timestamp_ms long, operation string, "
            "added_files int, removed_files int, total_rows long, summary string",
        )


# conservative broadcast budget for delete/key sides (well under typical
# driver/executor memory; Spark's own default autoBroadcastJoinThreshold is
# 10MB but key-only relations compress far better, so allow more)
_BROADCAST_BYTES = 64 * 1024 * 1024

_TYPE_WIDTH = {
    "boolean": 1, "byte": 1, "short": 2, "integer": 4, "long": 8,
    "float": 4, "double": 8, "date": 4, "timestamp": 8, "timestamp_ntz": 8,
}


def _auto_write_partitions(
    df: DataFrame, meta: TableMetadata, materialize: bool = False
) -> int | None:
    """Size the write's file count from Catalyst's plan-byte estimate and
    the table's target file size: ``ceil(bytes / target)``, capped at the
    session's shuffle-partition setting so a join-inflated over-estimate
    can never fan out wider than the previous fixed behavior.  A
    CDC-batch-sized commit then writes ONE ranged file instead of
    shuffle-partitions tiny ones (the reference's rolling-file sizing,
    IcebergTableWriterFactory.java:42-46, applied to file COUNT);
    returns None when the JVM estimate is unreachable (keep Spark's
    default fan-out).

    ``materialize=True`` (the caller persisted ``df``): when the plan
    estimate lands in the collapse zone (< 4 files), run a count so the
    cache fills and the stat read sees the MATERIALIZED in-memory size,
    not a pre-execution Catalyst guess — a selective-filter underestimate
    must not collapse a genuinely large keyed append into a single-file,
    single-task write.  Estimates ABOVE the zone skip the extra pass: an
    underestimate there still fans out adequately, and the range
    shuffle's sampling pass re-reads the cache right after anyway."""
    try:
        target = int(
            meta.properties.get(
                "write.target-file-size-bytes", 512 * 1024 * 1024
            )
        )

        est = _plan_size_est(df)
        if materialize and df.is_cached and est is not None and est < 4 * target:
            df.count()
            # stats() memoizes per QueryExecution — the post-materialize
            # read needs a fresh plan handle to see the cached size
            est = _plan_size_est(df.select("*"))
        # unknown stats (None) -> let AQE's shuffle coalescing pick the
        # fan-out instead of pinning the cap
        if est is None:
            return None
        cap = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        return max(1, min(-(-est // target), cap))
    except Exception:
        # contract: sizing unavailable (unreachable JVM stats, non-numeric
        # confs like shuffle.partitions='auto') -> None, never a crash
        return None


def _plan_size_est(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan byte estimate, or None when unknown.
    Catalyst reports ~Long.Max for plans with unknown stats (local
    relations, some cached plans) — mapped to None."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None
    return est if 0 < est < 1 << 60 else None


def _uniquify_staged(staging: str) -> None:
    """Rename freshly staged part files to globally-unique names.

    Iceberg writers embed a task UUID in every data-file name
    (IcebergTableWriterFactory.java:42-46 via OutputFileFactory); Spark's
    ``part-*`` names are only unique per write job. The prefix must be
    PER FILE, not per commit: one task writing several hive partition
    directories emits the same ``part-NNNNN-<jobUUID>`` name in each dir,
    and several read-path maps key on basename (``_read``'s file→seq/
    first_row_id broadcast, delete-file resolution, export's
    name→path map) — a commit-scoped tag left those colliding, which
    QUADRUPLED rows in lineage/MoR reads of partitioned tables.
    Driver-side renames within one directory tree — no data movement."""
    for root, _dirs, names in os.walk(staging):
        for n in names:
            if n.endswith(".parquet") and not n.startswith("."):
                tag = uuidlib.uuid4().hex[:12]
                os.rename(
                    os.path.join(root, n), os.path.join(root, f"{tag}-{n}")
                )
            elif n.startswith(".") or n == "_SUCCESS":
                # drop Hadoop _SUCCESS markers and .crc sidecars (stale after
                # rename; LocalFileSystem skips verification when absent)
                os.remove(os.path.join(root, n))


def _zvalue_col(
    df: DataFrame, cols: list[str], schema: T.StructType, bits: int = 16
) -> "F.Column":
    """Morton (z-order) code over ``cols`` as a single LONG column.

    Each column is normalized to a ``bits``-wide integer using its global
    min/max (ONE tiny aggregate job — no windows, no global sort), then the
    bit planes are interleaved: bit b of column i lands at position
    ``b * n_cols + i``.  Supported types: numerics, date, timestamp —
    the same families Iceberg's zorder transform handles natively (strings
    need an order-preserving byte prefix, deliberately out of scope)."""
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long")
    types = {f.name: f.dataType.typeName() for f in schema.fields}

    def as_num(c: str):
        t = types.get(c, "")
        col = F.col(c)
        if t == "date":
            return F.datediff(col, F.lit("1970-01-01")).cast("double")
        if t.startswith("timestamp"):
            return F.unix_timestamp(col).cast("double")
        if t in ("byte", "short", "integer", "long", "float", "double") or t.startswith(
            "decimal"
        ):
            return col.cast("double")
        raise ValueError(f"z-order does not support column {c!r} of type {t!r}")

    nums = {c: as_num(c) for c in cols}
    row = df.agg(
        *[F.min(nums[c]).alias(f"_mn_{c}") for c in cols],
        *[F.max(nums[c]).alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = row[f"_mn_{c}"], row[f"_mx_{c}"]
        if mn is None:
            mn, mx = 0.0, 1.0
        rng = (mx - mn) or 1.0
        code = F.coalesce(
            ((nums[c] - F.lit(float(mn))) / F.lit(float(rng)) * F.lit(top)).cast("long"),
            F.lit(0),
        )
        code = F.least(F.greatest(code, F.lit(0)), F.lit(top))
        for b in range(bits):
            bit = F.shiftright(code, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def _est_row_width(schema: T.StructType) -> int:
    """Byte estimate per row for broadcast decisions: fixed widths for
    primitives, a pessimistic default for strings/binary/nested."""
    w = 8  # row overhead
    for f in schema.fields:
        w += _TYPE_WIDTH.get(f.dataType.typeName(), 32)
    return w


def _bounds_intersect(
    a: dict[str, list], b: dict[str, list], cols: list[str]
) -> bool:
    """Do two [min,max] bound maps possibly share a key tuple? Missing
    stats on either side -> must assume yes."""
    for c in cols:
        ba, bb = a.get(c), b.get(c)
        if ba is None or bb is None:
            continue
        if ba[1] is not None and bb[0] is not None and ba[1] < bb[0]:
            return False
        if ba[0] is not None and bb[1] is not None and ba[0] > bb[1]:
            return False
    return True


def _tz_instant(v, session_tz: str):
    """Naive/aware datetime -> tz-aware instant, interpreting a naive value
    the way Spark's residual filter will: as a wall clock in the session
    timezone.  NotImplemented on DST-ambiguous/nonexistent wall clocks
    (the two engines may legally resolve those differently — keep the
    file) or unknown zones."""
    import datetime as _dt

    if v.tzinfo is not None:
        return v
    if session_tz == "UTC":
        return v.replace(tzinfo=_dt.timezone.utc)
    try:
        from zoneinfo import ZoneInfo

        z = ZoneInfo(session_tz)
    except Exception:
        return NotImplemented
    a = v.replace(tzinfo=z, fold=0)
    if a.utcoffset() != v.replace(tzinfo=z, fold=1).utcoffset():
        return NotImplemented  # ambiguous (DST fall-back hour)
    if a.astimezone(_dt.timezone.utc).astimezone(z).replace(
        tzinfo=None
    ) != v:
        return NotImplemented  # nonexistent (DST spring-forward gap)
    return a


def _table_wall_clock(v, session_tz: str, table_tz: str):
    """ltz-timestamp filter value -> the naive wall clock the WRITE path
    rendered into the partition path (table_tz), or NotImplemented."""
    import datetime as _dt

    if v.tzinfo is None and session_tz == table_tz:
        return v  # same zone both sides: wall clocks agree, no conversion
    inst = _tz_instant(v, session_tz)
    if inst is NotImplemented:
        return NotImplemented
    if table_tz == "UTC":
        return inst.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    try:
        from zoneinfo import ZoneInfo

        return inst.astimezone(ZoneInfo(table_tz)).replace(tzinfo=None)
    except Exception:
        return NotImplemented


def _engine_partition_value(
    pf: PartitionField,
    v: Any,
    source_type: str,
    session_tz: str = "UTC",
    table_tz: str = "UTC",
):
    """The engine's path-encoded partition value for source value ``v``
    under transform ``pf`` — what ``DataFile.partition`` holds, so a
    filter value can be compared against manifests without reading data.
    Returns NotImplemented when the transform can't be evaluated for this
    value/type (caller keeps the file).

    ``session_tz`` is how a naive filter datetime is interpreted (matching
    Spark's residual in-plan filter); ``table_tz`` is the zone the write
    path rendered temporal path values in (WRITE_TZ_PROP)."""
    import datetime as _dt

    t = pf.transform
    st = (source_type or "").lower()
    if t == "identity":
        # prune only for types whose str() provably equals Spark's path
        # encoding: ints and raw strings.  Decimals normalize to the
        # declared scale ('7' vs path '7.00'); temporal encodings trim
        # trailing zeros differently — skip, bounds still prune.
        from decimal import Decimal as _Dec

        if st in ("int", "bigint", "smallint", "tinyint"):
            return int(v) if isinstance(v, int) and not isinstance(v, bool) \
                else NotImplemented
        if st == "string":
            return v if isinstance(v, str) else NotImplemented
        if st.startswith("decimal") and "(" in st:
            _p, s = (int(x) for x in st[st.index("(") + 1 : st.index(")")].split(","))
            try:
                return str(_Dec(v).quantize(_Dec(1).scaleb(-s)))
            except Exception:
                return NotImplemented
        return NotImplemented
    if t == "bucket":
        from .murmur3 import (
            iceberg_bucket_py,
            murmur3_bytes,
            murmur3_decimal,
            murmur3_long,
            murmur3_utf8,
        )
        from decimal import Decimal as _Dec

        # dispatch on the DECLARED column type, not the filter value's
        # Python type: an int filter on a decimal column must hash the
        # unscaled bytes the write path hashed, or pruning drops the file
        if isinstance(v, bool):
            return NotImplemented
        if st in ("int", "bigint", "smallint", "tinyint"):
            if not isinstance(v, int):
                return NotImplemented
            h = murmur3_long(v)
        elif st == "string":
            if not isinstance(v, str):
                return NotImplemented
            h = murmur3_utf8(v)
        elif st == "binary":
            if not isinstance(v, (bytes, bytearray)):
                return NotImplemented
            h = murmur3_bytes(v)
        elif st.startswith("timestamp"):
            if not isinstance(v, _dt.datetime):
                return NotImplemented
            if st == "timestamp_ntz":
                # ntz stores the wall clock itself; zones never apply
                if v.tzinfo is not None:
                    return NotImplemented
            else:
                # ltz buckets hash the INSTANT's epoch micros (what the
                # write-path column expression hashed), so a naive filter
                # value resolves through the session timezone first
                v = _tz_instant(v, session_tz)
                if v is NotImplemented:
                    return NotImplemented
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            d = v - _dt.datetime(1970, 1, 1)
            # exact integer micros: float total_seconds() is 1 us off for
            # ~1% of microsecond timestamps — enough to hash a wrong
            # bucket and silently prune the matching file
            micros = (d.days * 86_400 + d.seconds) * 1_000_000 + d.microseconds
            h = murmur3_long(micros)
        elif st == "date":
            if isinstance(v, _dt.datetime) or not isinstance(v, _dt.date):
                return NotImplemented
            h = murmur3_long((v - _dt.date(1970, 1, 1)).days)
        elif st.startswith("decimal") and "(" in st:
            _p, s = (int(x) for x in st[st.index("(") + 1 : st.index(")")].split(","))
            try:
                h = murmur3_decimal(int(_Dec(v).scaleb(s)))
            except Exception:
                return NotImplemented
        else:
            return NotImplemented
        return iceberg_bucket_py(h, pf.param)
    # temporal transforms: path values are wall clocks — of the value
    # itself for date / timestamp_ntz sources, of the instant rendered in
    # the table's declared write timezone for ltz timestamps
    if t in ("year", "month", "day", "hour"):
        if isinstance(v, _dt.datetime):
            if st == "timestamp_ntz":
                if v.tzinfo is not None:
                    return NotImplemented
            else:
                v = _table_wall_clock(v, session_tz, table_tz)
                if v is NotImplemented:
                    return NotImplemented
        if not isinstance(v, (_dt.date, _dt.datetime)):
            return NotImplemented
        if t == "year":
            return v.year
        if t == "month":
            return f"{v.year:04d}-{v.month:02d}"
        if t == "day":
            return f"{v.year:04d}-{v.month:02d}-{v.day:02d}"
        hh = v.hour if isinstance(v, _dt.datetime) else 0
        return f"{v.year:04d}-{v.month:02d}-{v.day:02d}-{hh:02d}"
    if t == "truncate":
        if isinstance(v, str):
            return v[: pf.param]
        if isinstance(v, int) and not isinstance(v, bool):
            return (v // pf.param) * pf.param
        return NotImplemented
    return NotImplemented


def _prune_files_by_filter(
    meta: TableMetadata,
    files: list[DataFile],
    row_filter: dict,
    session_tz: str = "UTC",
) -> list[DataFile]:
    """Driver-side Iceberg-planFiles pruning: keep a file only if every
    predicate MIGHT match it, judged from hidden-partition transform
    values and per-file column min/max bounds.  Strictly conservative:
    missing bounds, old-spec layouts, untranslatable transform values,
    bucket values from an unstamped (pre-murmur3) layout, and temporal
    values under a foreign write timezone all keep the file; correctness
    comes from the residual in-plan filter."""
    src_types = {f.name: f.dataType.simpleString() for f in meta.schema.fields}
    table_tz = table_write_tz(meta)
    trusted_bucket = bucket_hash_trusted(meta)
    pf_by_source: dict[str, list[PartitionField]] = {}
    for pf in meta.partition_spec:
        if pf.transform == "bucket" and not trusted_bucket:
            continue  # stale hash ordinals on disk: unprunable
        pf_by_source.setdefault(pf.source, []).append(pf)

    def _file_might_match(f: DataFile) -> bool:
        for col, want in row_filter.items():
            lo, hi = (want if isinstance(want, tuple) else (want, want))
            if lo is None or hi is None:
                continue  # null-bounded predicates: no pruning
            # column bounds (incomparable representations — e.g. decimal
            # bounds stored as strings — conservatively keep the file)
            b = f.bounds.get(col)
            if b is not None and b[0] is not None and b[1] is not None:
                try:
                    if bound_key(b[1]) < bound_key(lo) or bound_key(
                        b[0]
                    ) > bound_key(hi):
                        return False
                except TypeError:
                    pass
            # partition transform values
            for pf in pf_by_source.get(col, []):
                if pf.name not in f.partition:
                    continue  # old-spec layout: unprunable
                have = f.partition[pf.name]
                if have is None or have == "__HIVE_DEFAULT_PARTITION__":
                    continue
                st = src_types.get(col, "")
                if not isinstance(want, tuple):
                    exp = _engine_partition_value(
                        pf, want, st, session_tz, table_tz
                    )
                    if exp is NotImplemented:
                        continue
                    if str(have) != str(exp):
                        return False
                elif pf.transform in ("identity", "year", "month", "day",
                                      "hour", "truncate"):
                    # monotonic transforms: a value range maps to a
                    # transform-value range (bucket is not monotonic)
                    elo = _engine_partition_value(pf, lo, st, session_tz, table_tz)
                    ehi = _engine_partition_value(pf, hi, st, session_tz, table_tz)
                    if elo is NotImplemented or ehi is NotImplemented:
                        continue
                    if isinstance(elo, int):
                        # path values are raw strings; numeric transform
                        # outputs (year, truncate) compare as ints
                        try:
                            have_n = int(have)
                        except (TypeError, ValueError):
                            continue
                        if have_n < elo or have_n > ehi:
                            return False
                        continue
                    try:
                        if bound_key(have) < bound_key(elo) or bound_key(
                            have
                        ) > bound_key(ehi):
                            return False
                    except TypeError:
                        pass
        return True

    return [f for f in files if _file_might_match(f)]


def _prune_files_by_partition_values(
    meta: TableMetadata,
    files: list[DataFile],
    partition_values: dict[str, set],
) -> list[DataFile]:
    """Set-membership file pruning on stamped partition values (the
    ``to_df(partition_values=)`` planning primitive).  Conservative like
    ``_prune_files_by_filter``: an old-spec file missing the field, a
    null/hive-default value, an unknown field name, or a bucket field
    whose on-disk hash ordinals predate the murmur3 stamp all KEEP the
    file.  Values compare stringified — partition path values are raw
    strings."""
    trusted = bucket_hash_trusted(meta)
    by_name = {pf.name: pf for pf in meta.partition_spec}
    preds: dict[str, set[str]] = {}
    for name, allowed in partition_values.items():
        pf = by_name.get(name)
        if pf is None or (pf.transform == "bucket" and not trusted):
            continue
        preds[name] = {str(v) for v in allowed}

    def _keep(f: DataFile) -> bool:
        for name, allowed in preds.items():
            if name not in f.partition:
                continue  # old-spec layout: unprunable
            have = f.partition[name]
            if have is None or have == "__HIVE_DEFAULT_PARTITION__":
                continue
            if str(have) not in allowed:
                return False
        return True

    return [f for f in files if _keep(f)]


def _posdel_bounds(path: str) -> dict[str, list]:
    """``file_name`` min/max of a staged position-delete file, from the
    parquet footer (driver-side, no data read).  Empty dict when the
    footer lacks statistics — the read side then keeps the delete
    conservatively."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }.get("file_name")
        if idx is None:
            return {}
        mn = mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return {}
            lo, hi = st.min, st.max
            if isinstance(lo, bytes):
                lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
        return {"file_name": [mn, mx]} if mn is not None else {}
    except Exception:
        return {}


def _delete_touches_scan(
    d: DeleteFile, files: list[DataFile], basenames: list[str]
) -> bool:
    """Can this delete file affect any of the scanned data files?
    Conservative (missing/incomparable bounds keep the file); dropping a
    delete that cannot match is EXACT — its anti-join would remove
    nothing from these files.

    - position deletes name their victims: relevant iff some scanned
      basename falls inside the delete's ``file_name`` bounds
      (``basenames`` is sorted — one bisect, not a product loop);
    - equality deletes apply by key to OLDER files: relevant iff some
      scanned file with ``seq < d.seq`` intersects the delete's bounds
      on every bounded equality column."""
    import bisect

    if d.content == "position":
        b = d.bounds.get("file_name")
        if not b or b[0] is None or b[1] is None:
            return True
        i = bisect.bisect_left(basenames, str(b[0]))
        return i < len(basenames) and basenames[i] <= str(b[1])
    cols = [c for c in d.equality_cols if d.bounds.get(c)]
    if not cols:
        return True
    for f in files:
        if f.seq >= d.seq:
            continue  # the anti-join ignores this file anyway
        hit = True
        for c in cols:
            dlo, dhi = d.bounds[c]
            fb = f.bounds.get(c)
            if (
                fb is None
                or fb[0] is None
                or fb[1] is None
                or dlo is None
                or dhi is None
            ):
                continue  # unknown on one side: cannot exclude this file
            try:
                if bound_key(fb[1]) < bound_key(dlo) or bound_key(fb[0]) > bound_key(dhi):
                    hit = False
                    break
            except TypeError:  # incomparable (mixed types): keep
                continue
        if hit:
            return True
    return False


def bound_key(v: Any) -> Any:
    """Normalize a value for manifest-bounds storage/comparison. Datetimes
    become fixed-width naive-UTC strings (lexicographically ordered), so
    footer stats (tz-aware micros), Spark-collected values (naive), and
    persisted manifest bounds all compare consistently."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _jsonable(v: Any) -> Any:
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    v = bound_key(v)
    return v if isinstance(v, (int, float, str, bool)) else str(v)


def _partition_values_from_path(path: str, spec: list[PartitionField]) -> dict[str, Any]:
    """Parse Hive-style ``_p_x=val`` directory components out of a file path.

    Values are percent-UNESCAPED: Spark hive-escapes special characters in
    partition directory names (including ``%`` itself, so unquoting is
    lossless) — without the decode, a string partition value containing
    ``:`` or a space would never equal its computed counterpart in merge
    partition pruning or metadata export."""
    if not spec:
        return {}
    from urllib.parse import unquote

    vals: dict[str, Any] = {}
    names = {pf.name for pf in spec}
    for comp in path.split("/"):
        if "=" in comp:
            k, _, v = comp.partition("=")
            if k in names:
                # RAW string, never int-parsed: the path is type-blind, and
                # coercing "007" (a legitimate STRING partition value) to 7
                # would export a wrong value and wrongly prune merges.
                # Consumers normalize per declared type (int()/str() both
                # accept these strings; computed values stringify to the
                # same canonical form Spark wrote into the path).
                vals[k] = unquote(v)
    return vals
