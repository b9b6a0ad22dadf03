"""Destination routing + heartbeat filtering (operators P1, P2, P6).

The reference groups each batch by destination topic
(IcebergChangeConsumer.java:142-154) and drops ``__debezium-heartbeat*``
topics (:186-189).  Spark-first: the batch stays one DataFrame; routing is a
distinct() over the (low-cardinality) destination column followed by
per-destination filtered writes — Catalyst pushes the equality filter into
the scan, so each table's write touches only its rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def filter_heartbeats(
    df: DataFrame,
    dest_col: str = "destination",
    heartbeat_prefix: str = "__debezium-heartbeat",
) -> DataFrame:
    return df.filter(~F.col(dest_col).startswith(heartbeat_prefix))


def destinations(df: DataFrame, dest_col: str = "destination") -> list[str]:
    """Distinct destinations in a micro-batch. Cardinality = number of source
    tables (small); the collect is bounded by design."""
    return [r[0] for r in df.select(dest_col).distinct().collect()]


def is_schema_change_topic(df: DataFrame) -> bool:
    """P6: value containing ddl+databaseName+tableChanges -> append-only
    schema topic (JsonEventConverter.java:182-185)."""
    names = set(df.columns)
    return {"ddl", "databaseName", "tableChanges"}.issubset(names)


def for_destination(df: DataFrame, dest: str, dest_col: str = "destination") -> DataFrame:
    return df.filter(F.col(dest_col) == F.lit(dest))
