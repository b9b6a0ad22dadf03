"""Copy-on-write MERGE INTO (upsert core, operators W4-W6).

Reference semantics (BaseDeltaTaskWriter.java:52-72 +
IcebergChangeConsumerUpsertTest scenarios):

- source batch already deduped to one row per key (mandatory — MERGE forbids
  duplicate source keys; IcebergTableOperator.java:166-171);
- matched  & op='d' & keep_deletes=False  -> row removed (hard delete)
- matched  & op='d' & keep_deletes=True   -> row replaced by the delete event
  (soft delete: row survives with __op='d'/__deleted=true)
- matched  & other op                     -> row replaced (update)
- unmatched & op='d' & keep_deletes=False -> nothing
- unmatched (otherwise)                   -> insert (even for op='d' when
  keeping deletes — IcebergChangeConsumerUpsertTest.java:69-73)

Execution strategy (scale-first):

1. *File pruning, no Spark job*: candidate files = manifest files whose key
   bounds overlap the source key range (driver-side min/max check over file
   stats, same planning model as Iceberg).
2. *Exact match*: read candidate files' key columns only (column-pruned scan)
   tagged with ``input_file_name`` and semi-join against the (broadcast)
   source keys -> the set of files that truly contain matched keys.
3. *Rewrite*: anti-join those files' rows against source keys, union with the
   surviving source rows, write as new files.
4. *Atomic delta commit*: remove the rewritten files, add the new ones.

Untouched files are never read or rewritten, so cost scales with the number
of files containing matched keys — not table size.  The source side is
broadcast when small (typical CDC batch ≪ table).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lakehouse.table import DataFile, LakeTable
from .project import conform_to_schema


@dataclass
class MergeStats:
    candidate_files: int
    rewritten_files: int
    source_rows: int


def _bounds_overlap(f: DataFile, key_cols: list[str], lo: dict, hi: dict) -> bool:
    for k in key_cols:
        b = f.bounds.get(k)
        if b is None:
            return True  # no stats -> must assume overlap
        mn, mx = b
        if k in lo and lo[k] is not None and mx is not None and mx < lo[k]:
            return False
        if k in hi and hi[k] is not None and mn is not None and mn > hi[k]:
            return False
    return True


def merge_into(
    table: LakeTable,
    source: DataFrame,
    keep_deletes: bool = True,
    op_col: str = "__op",
    broadcast_source: bool | None = None,
    summary: dict | None = None,
) -> MergeStats:
    """Upsert a deduped source batch into the table (one row per key)."""
    spark = source.sparkSession
    meta = table.metadata()
    key_cols = meta.identifier_fields
    if not key_cols:
        raise ValueError("merge_into requires identifier fields; use append")

    schema = meta.schema
    source = conform_to_schema(source, schema, keep_extra=[op_col]).cache()
    try:
        # --- source key range (one tiny agg) + row count
        aggs = [F.count(F.lit(1)).alias("_n")]
        for k in key_cols:
            aggs += [F.min(k).alias(f"_lo_{k}"), F.max(k).alias(f"_hi_{k}")]
        stat = source.agg(*aggs).collect()[0]
        n_src = stat["_n"]
        lo = {k: stat[f"_lo_{k}"] for k in key_cols}
        hi = {k: stat[f"_hi_{k}"] for k in key_cols}

        all_files = table.current_files()
        candidates = [f for f in all_files if _bounds_overlap(f, key_cols, lo, hi)]

        # partition pruning (partitioned tables): a file whose partition
        # tuple no source row maps to can't contain matched keys. The
        # distinct source-partition set is tiny (partitions touched by one
        # CDC batch), so the driver-side intersection is cheap.
        if meta.partition_spec:
            src_types = {f.name: f.dataType.typeName() for f in schema.fields}
            pcols = [
                pf.column(src_types.get(pf.source)).alias(pf.name)
                for pf in meta.partition_spec
                if pf.source in {f.name for f in schema.fields}
            ]
            if len(pcols) == len(meta.partition_spec):
                touched = {
                    tuple(str(r[pf.name]) for pf in meta.partition_spec)
                    for r in source.select(*pcols).distinct().collect()
                }
                candidates = [
                    f
                    for f in candidates
                    if not f.partition
                    or tuple(
                        str(f.partition.get(pf.name)) for pf in meta.partition_spec
                    )
                    in touched
                ]

        # --- exact affected-file set via column-pruned key scan
        src_keys = source.select(*key_cols).dropDuplicates(key_cols)
        if broadcast_source is None:
            broadcast_source = n_src <= 2_000_000
        if candidates:
            keys_scan = (
                table.scan_files(spark, candidates)
                .select(*key_cols)
                .withColumn("_file", F.input_file_name())
            )
            probe = F.broadcast(src_keys) if broadcast_source else src_keys
            affected_paths = {
                _strip_scheme(r["_file"])
                for r in keys_scan.join(
                    probe, on=key_cols, how="left_semi"
                )
                .select("_file")
                .distinct()
                .collect()
            }
            affected = [
                f for f in candidates if _strip_scheme(f.path) in affected_paths
            ]
        else:
            affected = []

        # --- build replacement rows
        surviving_source = (
            source if keep_deletes else source.filter(F.col(op_col) != F.lit("d"))
        )
        table_cols = [f.name for f in schema.fields]
        upserts = surviving_source.select(*table_cols)

        if affected:
            target_rows = table.scan_files(spark, affected)
            anti_probe = F.broadcast(src_keys) if broadcast_source else src_keys
            kept = target_rows.join(anti_probe, on=key_cols, how="left_anti")
            new_data = kept.unionByName(upserts)
        else:
            new_data = upserts

        table.commit_delta(
            new_data,
            [f.path for f in affected],
            summary=dict(
                summary or {}, operation_detail="merge", source_rows=n_src
            ),
        )
        return MergeStats(len(candidates), len(affected), n_src)
    finally:
        source.unpersist()


def _strip_scheme(p: str) -> str:
    """Normalize 'file:///x', 'file:/x', '///x' and '/x' to one form so
    manifest paths (filesystem walk) match input_file_name() paths."""
    import os

    if p.startswith("file:"):
        p = p[len("file:"):]
    return os.path.normpath(p)


def merge_dataframes(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    keep_deletes: bool = True,
    op_col: str = "__op",
) -> DataFrame:
    """Pure-DataFrame MERGE (same row semantics as merge_into, no table):

    result = (target ⟕̸ source-keys)  ∪  surviving source rows.

    The anti-join is the WHEN MATCHED branch collapsed: every matched target
    row is replaced (update/soft-delete) or dropped (hard delete); unmatched
    source rows are the WHEN NOT MATCHED INSERT branch. Source must be
    deduped to one row per key first (dedup_batch)."""
    surviving = (
        source if keep_deletes else source.filter(F.col(op_col) != F.lit("d"))
    )
    target_cols = target.columns
    kept = target.join(
        F.broadcast(source.select(*key_cols).dropDuplicates(key_cols)),
        on=key_cols,
        how="left_anti",
    )
    return kept.unionByName(surviving.select(*target_cols))
