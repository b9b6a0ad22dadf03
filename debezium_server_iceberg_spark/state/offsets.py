"""Offset store backed by a lakehouse table (operator T3 mirror).

Structured Streaming checkpoints already give exactly-once offsets (the
engine's primary mechanism); this store mirrors the reference's
*queryable* offset state (offset/IcebergOffsetBackingStore.java:66-303):
a single-row table ``(id, offset_data, record_insert_ts)`` replaced by a
full-overwrite commit on every flush (:193-230), readable with plain SQL
for operational visibility and for engines that need externalized offsets
(e.g. resuming a Kafka consumer group elsewhere).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession, types as T

from ..lakehouse import LakeCatalog, LakeTable

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("offset_data", T.StringType(), True),
        T.StructField("record_insert_ts", T.TimestampType(), True),
    ]
)


class OffsetStore:
    def __init__(self, catalog: LakeCatalog, namespace: str, table_name: str = "_debezium_offsets") -> None:
        self.table: LakeTable = catalog.load_or_create(
            namespace, table_name, schema=_SCHEMA, identifier_fields=["id"]
        )

    def save(self, spark: SparkSession, offsets: dict[str, str], store_id: str = "offsets") -> None:
        """Full overwrite, one JSON row — the reference's OverwriteFiles
        alwaysTrue commit (IcebergOffsetBackingStore.java:219-223)."""
        from datetime import datetime, timezone

        row = [(store_id, json.dumps(offsets, sort_keys=True), datetime.now(timezone.utc))]
        self.table.overwrite(spark.createDataFrame(row, _SCHEMA))

    def load(self, spark: SparkSession, store_id: str = "offsets") -> dict[str, str]:
        """Full scan; expects <=1 row per store id
        (IcebergOffsetBackingStore.java:232-258)."""
        from pyspark.sql import functions as F

        rows = self.table.to_df(spark).filter(F.col("id") == F.lit(store_id)).collect()
        if not rows:
            return {}
        if len(rows) > 1:
            raise RuntimeError(f"offset table has {len(rows)} rows for {store_id!r}; expected one")
        return json.loads(rows[0]["offset_data"] or "{}")
