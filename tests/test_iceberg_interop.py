"""Real-Iceberg interop codepath: the generative half (session conf, DDL,
MERGE statement) is exact and unit-tested; the executing half must be
cleanly guarded when the iceberg-spark runtime is absent (which it is in
this environment — same policy as the Kafka transport jar)."""

import pytest
from pyspark.sql import types as T

from debezium_server_iceberg_spark.lakehouse.iceberg_interop import (
    IcebergSparkWriter,
    create_table_ddl,
    iceberg_available,
    iceberg_spark_conf,
    identifier_fields_ddl,
    merge_into_sql,
    write_ordered_by_ddl,
)
from debezium_server_iceberg_spark.lakehouse.transforms import parse_partition_spec


def test_session_conf_mirrors_reference_catalogs():
    conf = iceberg_spark_conf(
        "iceberg",
        {"type": "rest", "uri": "http://rest:8181", "warehouse": "s3://b/wh",
         "io-impl": "org.apache.iceberg.aws.s3.S3FileIO"},
    )
    assert conf["spark.sql.extensions"].endswith("IcebergSparkSessionExtensions")
    assert conf["spark.sql.catalog.iceberg"].endswith("SparkCatalog")
    assert conf["spark.sql.catalog.iceberg.type"] == "rest"
    assert conf["spark.sql.catalog.iceberg.uri"] == "http://rest:8181"
    assert conf["spark.sql.catalog.iceberg.warehouse"] == "s3://b/wh"
    # hadoop default only when nothing picks the catalog implementation
    assert iceberg_spark_conf("c", {})["spark.sql.catalog.c.type"] == "hadoop"
    assert "spark.sql.catalog.c.type" not in iceberg_spark_conf(
        "c", {"catalog-impl": "org.apache.iceberg.nessie.NessieCatalog"}
    )


def test_create_table_ddl_with_transforms_and_props():
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    spec = parse_partition_spec("year(ts), bucket(16, id), name")
    ddl = create_table_ddl(
        "iceberg.ns.users", schema, spec,
        {"format-version": "3", "write.format.default": "parquet"},
    )
    assert "CREATE TABLE IF NOT EXISTS iceberg.ns.users" in ddl
    assert "id bigint NOT NULL" in ddl and "name string" in ddl
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (years(ts), bucket(16, id), name)" in ddl
    assert "'format-version'='3'" in ddl and "'write.format.default'='parquet'" in ddl


def test_identifier_and_sort_ddl():
    assert identifier_fields_ddl("c.n.t", ["id", "ts"]) == (
        "ALTER TABLE c.n.t SET IDENTIFIER FIELDS id, ts"
    )
    assert write_ordered_by_ddl("c.n.t", ["id"]) == (
        "ALTER TABLE c.n.t WRITE ORDERED BY (id)"
    )


def test_merge_sql_soft_delete_keeps_delete_rows():
    sql = merge_into_sql("c.n.t", "src", ["id"], keep_deletes=True)
    assert "ON t.id = s.id" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    assert "DELETE" not in sql  # soft mode never physically deletes


def test_merge_sql_hard_delete_branches():
    sql = merge_into_sql("c.n.t", "src", ["id", "region"], keep_deletes=False)
    assert "ON t.id = s.id AND t.region = s.region" in sql
    assert "WHEN MATCHED AND s.__op = 'd' THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED AND s.__op != 'd' THEN INSERT *" in sql


def test_runtime_guard_without_jars(spark):
    """No iceberg-spark runtime here: availability is False and the writer
    refuses construction with one actionable error."""
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark runtime"):
        IcebergSparkWriter(spark)
