"""Snapshot refs: tags, branches, write-audit-publish, expiry protection.

Mirrors Iceberg's table-metadata ``refs`` map + branch write + fast_forward
publish (all public Iceberg spec/procedure surface; the reference inherits
it from the Iceberg library its consumer writes through).
"""

import pytest
from pyspark.sql import types as T

from debezium_server_iceberg_spark.lakehouse import LakeCatalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)


def _rows(df):
    return sorted((r.id, r.name) for r in df.collect())


def test_tag_pins_state_and_survives_writes(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "tags", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    t.create_tag("release-1")
    t.append(spark.createDataFrame([(2, "b")], SCHEMA))
    assert _rows(t.to_df(spark)) == [(1, "a"), (2, "b")]
    assert _rows(t.to_df(spark, ref="release-1")) == [(1, "a")]
    assert t.refs()["release-1"]["type"] == "tag"
    assert t.resolve_ref("main") == t.metadata().current_snapshot_id


def test_branch_write_audit_publish(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "wap", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    t.create_branch("audit")
    # write lands only on the branch
    t.append(spark.createDataFrame([(2, "b")], SCHEMA), branch="audit")
    assert _rows(t.to_df(spark)) == [(1, "a")]
    assert _rows(t.to_df(spark, ref="audit")) == [(1, "a"), (2, "b")]
    # audit passes -> publish is one atomic metadata pointer move
    t.fast_forward("audit")
    assert _rows(t.to_df(spark)) == [(1, "a"), (2, "b")]


def test_branch_upsert_then_publish(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "wap2", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    t.create_branch("stage")
    # MoR upsert on the branch: update id=2, insert id=3
    t.commit_row_delta(
        spark.createDataFrame([(2, "B"), (3, "c")], SCHEMA),
        spark.createDataFrame([(2, "B")], SCHEMA),
        branch="stage",
    )
    assert _rows(t.to_df(spark)) == [(1, "a"), (2, "b")]  # main untouched
    assert _rows(t.to_df(spark, ref="stage")) == [(1, "a"), (2, "B"), (3, "c")]
    t.fast_forward("stage")
    assert _rows(t.to_df(spark)) == [(1, "a"), (2, "B"), (3, "c")]


def test_fast_forward_rejects_diverged_main(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "div", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    t.create_branch("feature")
    t.append(spark.createDataFrame([(2, "b")], SCHEMA), branch="feature")
    t.append(spark.createDataFrame([(9, "z")], SCHEMA))  # main moves on
    with pytest.raises(ValueError, match="not an ancestor"):
        t.fast_forward("feature")
    # main kept its own lineage
    assert _rows(t.to_df(spark)) == [(1, "a"), (9, "z")]


def test_expire_protects_ref_pinned_snapshots(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "exp", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    t.create_tag("pin")
    for i in range(2, 6):
        t.append(spark.createDataFrame([(i, "x")], SCHEMA))
    t.expire_snapshots(keep_last=1)
    # the pinned snapshot (and its files) must still be readable
    assert _rows(t.to_df(spark, ref="pin")) == [(1, "a")]
    sids = {s.snapshot_id for s in t.metadata().snapshots}
    assert t.resolve_ref("pin") in sids
    assert len(sids) == 2  # pinned + newest


def test_ref_validation(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "val", SCHEMA)
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    with pytest.raises(ValueError, match="implicit"):
        t.create_tag("main")
    with pytest.raises(ValueError, match="no snapshot"):
        t.create_branch("b", snapshot_id=999)
    t.create_tag("v1")
    # a tag is not writable
    with pytest.raises(ValueError, match="no branch"):
        t.append(spark.createDataFrame([(2, "b")], SCHEMA), branch="v1")
    with pytest.raises(ValueError, match="no branch"):
        t.fast_forward("v1")
    t.drop_ref("v1")
    with pytest.raises(ValueError, match="no ref"):
        t.drop_ref("v1")


def test_metadata_tables(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "md", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA))
    t.create_tag("v1")
    t.commit_row_delta(
        spark.createDataFrame([(2, "B")], SCHEMA),
        spark.createDataFrame([(2, "B")], SCHEMA),
    )

    snaps = t.metadata_df(spark, "snapshots").collect()
    assert [s.operation for s in snaps] == ["append", "rowdelta"]
    assert snaps[1].parent_id == snaps[0].snapshot_id
    assert [s.is_current for s in snaps] == [False, True]

    files = t.metadata_df(spark, "files").collect()
    assert sum(f.record_count for f in files) == 3  # 2 original + 1 upsert
    assert all(f.file_size_bytes > 0 for f in files)

    dels = t.metadata_df(spark, "delete_files").collect()
    assert len(dels) == 1 and dels[0].equality_columns == "id"

    parts = t.metadata_df(spark, "partitions").collect()
    assert len(parts) == 1 and parts[0].record_count == 3

    refs = {r.name: r for r in t.metadata_df(spark, "refs").collect()}
    assert refs["v1"].type == "tag"
    assert refs["main"].snapshot_id == t.metadata().current_snapshot_id

    with pytest.raises(ValueError, match="unknown metadata table"):
        t.metadata_df(spark, "nope")


def test_register_views_with_metadata(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns2", "orders_md", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    names = cat.register_views(spark, "ns2", prefix="lk_", with_metadata=True)
    assert "lk_orders_md" in names and "lk_orders_md__snapshots" in names
    row = spark.sql(
        "SELECT operation, is_current FROM lk_orders_md__snapshots"
    ).collect()[0]
    assert (row.operation, row.is_current) == ("append", True)
    assert spark.sql("SELECT count(*) n FROM lk_orders_md__files").collect()[0].n == 1


def test_incremental_scan_semantics(spark, warehouse):
    t = LakeCatalog(warehouse).create_table("ns", "inc", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a")], SCHEMA))
    s1 = t.metadata().current_snapshot_id
    t.append(spark.createDataFrame([(2, "b")], SCHEMA))
    s2 = t.metadata().current_snapshot_id
    t.append(spark.createDataFrame([(3, "c")], SCHEMA))
    assert _rows(t.incremental_scan(spark, s1)) == [(2, "b"), (3, "c")]
    assert _rows(t.incremental_scan(spark, s1, s2)) == [(2, "b")]
    assert _rows(t.incremental_scan(spark, t.metadata().current_snapshot_id)) == []
    with pytest.raises(ValueError, match="no snapshot"):
        t.incremental_scan(spark, 999)
    # an upsert's delete applies to rows added within the range
    t.commit_row_delta(
        spark.createDataFrame([(3, "C")], SCHEMA),
        spark.createDataFrame([(3, "C")], SCHEMA),
    )
    assert _rows(t.incremental_scan(spark, s2)) == [(3, "C")]
    # rewrites invalidate incremental append semantics
    t.compact(spark, min_input_files=2)
    with pytest.raises(ValueError, match="rewrite"):
        t.incremental_scan(spark, s1)
