"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Size the local-mode JVM heap from the machine, not a constant.

    In ``local[N]`` the driver heap IS the executor heap: N concurrent
    task slots share it, so a fixed small default that is fine at sf0.1
    OOMs sort-heavy joins at sf1 (surfaced by q21 on the 10x slice).  A
    quarter of physical RAM (floor 8g, cap 48g) mirrors what a cluster
    deployment would give each executor JVM; explicit
    ``SPARK_DRIVER_MEMORY`` always wins."""
    env = os.environ.get("SPARK_DRIVER_MEMORY")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            kb = int(fh.readline().split()[1])
        gb = max(8, min(48, kb // (4 * 1024 * 1024)))
        return f"{gb}g"
    except Exception:
        return "8g"


def get_spark(
    app_name: str = "debezium_server_iceberg_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        # INT96 (Spark's legacy default) carries no parquet min/max stats;
        # micros timestamps give the lakehouse manifest real bounds for
        # file pruning and are the modern interop encoding
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # driver testdata's events.ts is parquet timestamp[ns]; read as long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # current testdata stores TIMESTAMP(MICROS, isAdjustedToUTC=false);
        # read it as plain TIMESTAMP, not TIMESTAMP_NTZ (NTZ rejects numeric
        # casts and diverges from the verified plans)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", _default_driver_memory())
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
