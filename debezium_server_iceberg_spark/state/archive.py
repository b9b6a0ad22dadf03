"""Raw-event archive sink (operator W15, the deprecated ``icebergevents``
consumer, IcebergEventsChangeConsumer.java:80-243).

Every envelope row appended verbatim (key/value JSON strings) to one table
partitioned by destination + event hour — identical partition spec to the
reference (:90-94) via the lakehouse hidden-partition transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

from ..lakehouse import LakeCatalog, LakeTable
from ..lakehouse.transforms import PartitionField

SCHEMA = T.StructType(
    [
        T.StructField("event_destination", T.StringType(), False),
        T.StructField("event_key_schema", T.StringType(), True),
        T.StructField("event_key_payload", T.StringType(), True),
        T.StructField("event_value_schema", T.StringType(), True),
        T.StructField("event_value_payload", T.StringType(), True),
        T.StructField("event_sink_epoch_ms", T.LongType(), True),
        T.StructField("event_sink_timestamptz", T.TimestampType(), True),
    ]
)

PARTITION_SPEC = [
    PartitionField("event_destination", "identity"),
    PartitionField("event_sink_timestamptz", "hour"),
]


class EventsArchive:
    def __init__(self, catalog: LakeCatalog, namespace: str = "debeziumevents", table_name: str = "debezium_events") -> None:
        self.table: LakeTable = catalog.load_or_create(
            namespace,
            table_name,
            schema=SCHEMA,
            partition_spec=PARTITION_SPEC,
            sort_order=["event_destination", "event_sink_timestamptz"],
        )

    def append_batch(self, raw: DataFrame) -> None:
        """raw envelope (destination, key, value) -> archive rows. Schema and
        payload are split out of the envelope with one json projection."""
        now = F.current_timestamp()
        rows = raw.select(
            F.col("destination").alias("event_destination"),
            F.get_json_object("key", "$.schema").alias("event_key_schema"),
            F.get_json_object("key", "$.payload").alias("event_key_payload"),
            F.get_json_object("value", "$.schema").alias("event_value_schema"),
            F.get_json_object("value", "$.payload").alias("event_value_payload"),
            (F.unix_timestamp(now) * 1000).alias("event_sink_epoch_ms"),
            now.alias("event_sink_timestamptz"),
        )
        self.table.append(rows)
