"""Catalog-as-commit-point (publish_mode=per_commit): the external
catalog row is the AUTHORITATIVE pointer for a published table — every
engine commit exports the candidate state and CASes the catalog before
its local atomic point, the reference's model where tables live *in*
the catalog (IcebergChangeConsumer.java:100-102,
testresources/CatalogJdbc.java:29-41)."""

import os

import pytest
from pyspark.sql import types as T

from debezium_server_iceberg_spark.config import EngineConfig
from debezium_server_iceberg_spark.lakehouse import LakeCatalog
from debezium_server_iceberg_spark.lakehouse.catalog_commit import (
    CatalogCommitHook,
    attach_catalog_commit_hook,
)
from debezium_server_iceberg_spark.lakehouse.jdbc_catalog import (
    CommitFailedError,
    JdbcCatalogClient,
    read_table_by_name,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("v", T.StringType(), True),
    ]
)


def _setup(spark, tmp_path):
    cat = LakeCatalog(str(tmp_path / "wh"))
    table = cat.create_table("ns", "t", SCHEMA, identifier_fields=["id"])
    client = JdbcCatalogClient(f"jdbc:sqlite:{tmp_path / 'catalog.db'}")
    hook = attach_catalog_commit_hook(
        table, client, "ns", "t", str(tmp_path / "pub")
    )
    return cat, table, client, hook


def test_catalog_pointer_equals_table_head_after_every_commit(spark, tmp_path):
    """After EVERY commit the catalog row resolves the just-committed
    state — zero dual-source-of-truth window, unlike the cadence path
    where the catalog lags by up to N commits."""
    cat, table, client, hook = _setup(spark, tmp_path)
    for batch in range(3):
        df = spark.createDataFrame([(batch, f"v{batch}")], SCHEMA)
        table.append(df)
        loc = client.load_table("ns", "t")["metadata-location"]
        assert loc == hook.last_published
        got = {
            (r.id, r.v)
            for r in read_table_by_name(spark, client, "ns", "t").collect()
        }
        want = {(r.id, r.v) for r in table.to_df(spark).collect()}
        assert got == want and len(want) == batch + 1
    # property-only commits publish too (every metadata change is a
    # catalog commit, as in Iceberg itself)
    before = client.load_table("ns", "t")["metadata-location"]
    table.update_properties(**{"some.prop": "x"})
    assert client.load_table("ns", "t")["metadata-location"] != before


def test_foreign_catalog_writer_blocks_engine_commit(spark, tmp_path):
    """A concurrent catalog writer moving the pointer between our
    commits fails the CAS: CommitFailedError propagates, the engine's
    commit does NOT advance (no new metadata version, no row change,
    candidate file removed), and the foreign pointer stays."""
    cat, table, client, hook = _setup(spark, tmp_path)
    table.append(spark.createDataFrame([(1, "a")], SCHEMA))
    # foreign writer CASes the row away from us
    foreign = JdbcCatalogClient(f"jdbc:sqlite:{tmp_path / 'catalog.db'}")
    foreign.commit_table(
        "ns", "t", "/elsewhere/v9.metadata.json", hook.last_published
    )
    meta_before = table.metadata()
    versions_before = sorted(os.listdir(table.meta_dir))
    with pytest.raises(CommitFailedError):
        table.append(spark.createDataFrame([(2, "b")], SCHEMA))
    meta_after = table.metadata()
    assert meta_after.version == meta_before.version
    assert meta_after.current_snapshot_id == meta_before.current_snapshot_id
    assert table.row_count() == 1
    # the candidate metadata file was removed: the version slot is free
    assert sorted(
        f for f in os.listdir(table.meta_dir) if f.endswith(".metadata.json")
    ) == sorted(
        f for f in versions_before if f.endswith(".metadata.json")
    )
    assert (
        foreign.load_table("ns", "t")["metadata-location"]
        == "/elsewhere/v9.metadata.json"
    )
    # operator recovery: acknowledge the foreign pointer (reset the
    # tracking) and the next commit re-registers from current state
    hook.last_published = None
    table.append(spark.createDataFrame([(2, "b")], SCHEMA))
    assert table.row_count() == 2
    got = {
        (r.id, r.v)
        for r in read_table_by_name(spark, client, "ns", "t").collect()
    }
    assert got == {(1, "a"), (2, "b")}


def test_attach_hook_idempotent_keeps_tracking(spark, tmp_path):
    """Re-attaching (every micro-batch re-loads the table) keeps the
    existing hook instance and its last-published pointer."""
    cat, table, client, hook = _setup(spark, tmp_path)
    table.append(spark.createDataFrame([(1, "a")], SCHEMA))
    again = attach_catalog_commit_hook(
        table, client, "ns", "t", str(tmp_path / "pub")
    )
    assert again is hook and again.last_published == hook.last_published


def test_config_validates_per_commit_mode():
    cfg = EngineConfig()
    cfg.iceberg.publish_mode = "bogus"
    with pytest.raises(ValueError, match="publish_mode"):
        cfg.validate()
    cfg.iceberg.publish_mode = "per_commit"
    with pytest.raises(ValueError, match="publish_dest"):
        cfg.validate()
    cfg.iceberg.publish_dest = "/tmp/pub"
    with pytest.raises(ValueError, match="catalog"):
        cfg.validate()
    cfg.iceberg.publish_jdbc_uri = "jdbc:sqlite:/tmp/cat.db"
    cfg.validate()


def test_consumer_per_commit_publishes_every_batch(spark, tmp_path):
    """End-to-end through ChangeConsumer: with publish_mode=per_commit
    every micro-batch's commit is catalog-resolvable immediately —
    including the schema the upsert wrote — and the cadence path stays
    inert."""
    from debezium_server_iceberg_spark.sources.debezium_json import (
        RAW_ENVELOPE_SCHEMA,
    )
    from debezium_server_iceberg_spark.streaming.consumer import ChangeConsumer
    from tests.fixtures import customer_event

    def raw_df(sp, rows):
        return sp.createDataFrame(rows, RAW_ENVELOPE_SCHEMA)

    cfg = EngineConfig()
    cfg.iceberg.warehouse = str(tmp_path / "wh")
    cfg.iceberg.publish_mode = "per_commit"
    cfg.iceberg.publish_dest = str(tmp_path / "pub")
    cfg.iceberg.publish_jdbc_uri = f"jdbc:sqlite:{tmp_path / 'catalog.db'}"
    c = ChangeConsumer(cfg)
    client = JdbcCatalogClient(cfg.iceberg.publish_jdbc_uri)

    c.handle_batch(raw_df(spark, [customer_event(1, "a", op="c", ts_ms=1)]))
    tname = client.list_tables(cfg.iceberg.namespace)[0]
    first = client.load_table(cfg.iceberg.namespace, tname)["metadata-location"]
    rows1 = read_table_by_name(
        spark, client, cfg.iceberg.namespace, tname
    ).count()
    assert rows1 == 1

    c.handle_batch(raw_df(spark, [customer_event(2, "b", op="c", ts_ms=2)]))
    second = client.load_table(cfg.iceberg.namespace, tname)["metadata-location"]
    assert second != first
    assert (
        read_table_by_name(spark, client, cfg.iceberg.namespace, tname).count()
        == 2
    )
    # the cadence bookkeeping property was never stamped: per_commit
    # bypasses _maybe_publish_iceberg entirely
    table = c.catalog.load_table(cfg.iceberg.namespace, tname)
    assert "publish.last-publish-snapshot-id" not in table.metadata().properties
