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
