"""Hypertable-style continuous aggregate (incremental rollup).

A rollup table (time bucket x dimensions -> additive aggregates) maintained
incrementally: each micro-batch is pre-aggregated to one row per touched
bucket, existing bucket rows for ONLY those buckets are read back (file
pruning via the lakehouse manifest), combined additively, and swapped in a
delta commit. Cost per batch scales with touched buckets, not table size —
the continuous-aggregate model TimescaleDB popularized, re-expressed on a
Spark lakehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..lakehouse import LakeCatalog, LakeTable
from ..lakehouse.table import bound_key


ROLLUP_SCHEMA = T.StructType(
    [
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def affected_files(files, touched_keys):
    """Driver-side manifest pruning: which files MAY contain a touched
    ``(bucket_start, event_type)`` key, judged from per-file min/max bounds.

    The naive check is a Python double loop — O(files x touched keys),
    10^9 iterations at 10^5 files x 10^4 touched buckets. Here touched
    bucket values are grouped by event_type and sorted once; each file
    bisects the type range and then each candidate type's bucket list, so
    the cost is O(F * T_types * log T) with tiny constants (T_types is the
    number of DISTINCT event types in one micro-batch).

    ``touched_keys``: iterable of ``(bucket_bound_key, event_type)``.
    A file whose bounds omit a dimension is conservatively kept whenever
    the remaining dimension matches (same semantics as the scalar check).
    """
    import bisect

    by_type: dict = {}
    for b, e in touched_keys:
        by_type.setdefault(e, []).append(b)
    if not by_type:
        return []
    for vals in by_type.values():
        vals.sort()
    types_sorted = sorted(by_type)
    all_buckets = sorted(b for vals in by_type.values() for b in vals)

    def _any_bucket_in(vals, bb) -> bool:
        if bb is None:
            return bool(vals)
        lo = bisect.bisect_left(vals, bb[0])
        return lo < len(vals) and vals[lo] <= bb[1]

    out = []
    for f in files:
        bb = f.bounds.get("bucket_start")
        be = f.bounds.get("event_type")
        if be is None:
            hit = _any_bucket_in(all_buckets, bb)
        else:
            lo = bisect.bisect_left(types_sorted, be[0])
            hi = bisect.bisect_right(types_sorted, be[1])
            hit = any(
                _any_bucket_in(by_type[types_sorted[i]], bb)
                for i in range(lo, hi)
            )
        if hit:
            out.append(f)
    return out


class ContinuousRollup:
    """Hourly (configurable) rollup of an event stream into a lakehouse
    table keyed by (bucket_start, event_type)."""

    def __init__(
        self,
        catalog: LakeCatalog,
        namespace: str = "rollups",
        table_name: str = "events_hourly",
        bucket: str = "1 hour",
    ) -> None:
        self.bucket = bucket
        self.table: LakeTable = catalog.load_or_create(
            namespace,
            table_name,
            schema=ROLLUP_SCHEMA,
            identifier_fields=["bucket_start", "event_type"],
        )

    def _batch_rollup(self, events: DataFrame) -> DataFrame:
        return (
            events.groupBy(
                F.window("ts", self.bucket)["start"].alias("bucket_start"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("value").cast("double").alias("sum_value"),
            )
        )

    def update(self, events: DataFrame) -> None:
        """Fold one micro-batch into the rollup (additive merge).

        File-pruned: the touched bucket set (tiny — buckets in one
        micro-batch) is checked driver-side against every manifest file's
        (bucket_start, event_type) min/max bounds; only overlapping files
        are read, combined, and atomically swapped in a delta commit. Files
        for untouched buckets are never read OR rewritten, so cost per batch
        scales with touched buckets, not table size (the same planning model
        as the MERGE operator, operators/merge.py)."""
        spark = events.sparkSession
        keys = ["bucket_start", "event_type"]
        delta = self._batch_rollup(events).cache()
        try:
            touched = delta.select(*keys).dropDuplicates(keys).collect()
            if not touched:
                return
            files = self.table.current_files()
            affected = affected_files(
                files,
                [(bound_key(r["bucket_start"]), r["event_type"]) for r in touched],
            )
            if affected:
                current = self.table.scan_files(spark, affected)
                touched_df = F.broadcast(delta.select(*keys).dropDuplicates(keys))
                kept = current.join(touched_df, keys, "left_anti")
                combined = (
                    current.join(touched_df, keys, "left_semi")
                    .unionByName(delta)
                    .groupBy(*keys)
                    .agg(
                        F.sum("n").alias("n"),
                        F.sum("sum_value").alias("sum_value"),
                    )
                )
                new_data = kept.unionByName(combined)
            else:
                new_data = delta
            self.table.commit_delta(
                new_data,
                [f.path for f in affected],
                summary={
                    "operation_detail": "rollup-update",
                    "touched_buckets": len(touched),
                    "pruned_files": len(files) - len(affected),
                },
            )
        finally:
            delta.unpersist()

    def run_stream(self, events_stream: DataFrame, checkpoint: str):
        """Maintain the rollup continuously from a streaming source."""
        return (
            events_stream.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, epoch: self.update(df))
            .start()
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        return self.table.to_df(spark)
