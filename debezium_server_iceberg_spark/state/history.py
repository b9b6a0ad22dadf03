"""Append-only schema-history log (operator T7 mirror).

The engine re-infers schemas from events, so this log is optional — kept
for parity with the reference's DDL history table
(history/IcebergSchemaHistory.java:66-288): append-only rows
``(id, history_data, record_insert_ts)``, recovered by a full ordered scan.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession, types as T

from ..lakehouse import LakeCatalog, LakeTable

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("history_data", T.StringType(), True),
        T.StructField("record_insert_ts", T.TimestampType(), True),
    ]
)


class SchemaHistoryStore:
    def __init__(self, catalog: LakeCatalog, namespace: str, table_name: str = "_debezium_schema_history") -> None:
        self.table: LakeTable = catalog.load_or_create(namespace, table_name, schema=_SCHEMA)

    def append(self, spark: SparkSession, records: list[str]) -> None:
        from datetime import datetime, timezone

        now = datetime.now(timezone.utc)
        # rows of one batch share a timestamp; an index-prefixed id keeps
        # recover()'s (ts, id) ordering equal to append order within a batch
        rows = [
            (f"{i:08d}-{uuid.uuid4().hex[:12]}", r, now)
            for i, r in enumerate(records)
        ]
        self.table.append(spark.createDataFrame(rows, _SCHEMA))

    def recover(self, spark: SparkSession) -> list[str]:
        """Ordered replay (IcebergSchemaHistory.java:186-205)."""
        rows = (
            self.table.to_df(spark)
            .orderBy("record_insert_ts", "id")
            .select("history_data")
            .collect()
        )
        return [r[0] for r in rows]
