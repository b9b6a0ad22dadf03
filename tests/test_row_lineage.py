"""Iceberg v3 row lineage: first_row_id inheritance, _row_id /
_last_updated_sequence_number derivation on read, and preservation through
compaction (spec: Row Lineage; reference enables v3 by default,
IcebergConfig.java:106-108)."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from debezium_server_iceberg_spark.lakehouse.table import (
    LAST_SEQ_COL,
    ROW_ID_COL,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.StringType()),
    ]
)


def _mk(tmp_path, fv="3", **kw):
    return LakeTable.create(
        str(tmp_path / "t"),
        SCHEMA,
        identifier_fields=["id"],
        properties={"format-version": fv},
        **kw,
    )


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_append_assigns_contiguous_row_ids(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.append(_df(spark, [(4, "d"), (5, "e")]))
    out = {r.id: r for r in t.to_df(spark, lineage=True).collect()}
    ids = sorted(r[ROW_ID_COL] for r in out.values())
    assert ids == [0, 1, 2, 3, 4]          # contiguous from next_row_id=0
    assert t.metadata().next_row_id == 5
    # files of the second append start after the first's range
    frids = sorted(
        (f.first_row_id, f.rows) for f in t.current_files()
    )
    total = 0
    for frid, rows in frids:
        assert frid == total
        total += rows


def test_last_updated_sequence_tracks_commit(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a")]))
    t.append(_df(spark, [(2, "b")]))
    out = {r.id: r for r in t.to_df(spark, lineage=True).collect()}
    assert out[1][LAST_SEQ_COL] < out[2][LAST_SEQ_COL]


def test_upserted_rows_get_fresh_ids(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    before = {r.id: r[ROW_ID_COL] for r in t.to_df(spark, lineage=True).collect()}
    src = spark.createDataFrame([(2, "B", "u")], "id long, val string, __op string")
    merge_into(t, src)
    after = {r.id: r for r in t.to_df(spark, lineage=True).collect()}
    assert after[1][ROW_ID_COL] == before[1]          # untouched row keeps its id
    assert after[2][ROW_ID_COL] >= 2                  # rewritten row: fresh id
    assert after[2].val == "B"
    # ids never collide
    assert len({r[ROW_ID_COL] for r in after.values()}) == 2


def test_compaction_preserves_row_ids(spark, tmp_path):
    t = _mk(tmp_path)
    for i in range(4):
        t.append(_df(spark, [(i, f"v{i}")]))
    before = {r.id: (r[ROW_ID_COL], r[LAST_SEQ_COL])
              for r in t.to_df(spark, lineage=True).collect()}
    removed = t.compact(spark, target_file_bytes=512 * 1024 * 1024)
    assert removed == 4
    after = {r.id: (r[ROW_ID_COL], r[LAST_SEQ_COL])
             for r in t.to_df(spark, lineage=True).collect()}
    # materialized lineage survives the rewrite bit-for-bit
    assert after == before
    # and the compacted file physically contains the lineage columns
    dfile = t.current_files()[0]
    import pyarrow.parquet as pq

    cols = pq.read_schema(dfile.path).names
    assert ROW_ID_COL in cols and LAST_SEQ_COL in cols


def test_clustered_rewrite_preserves_row_ids(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(20)]))
    before = {r.id: r[ROW_ID_COL] for r in t.to_df(spark, lineage=True).collect()}
    t.rewrite_sorted(spark, ["val"])
    after = {r.id: r[ROW_ID_COL] for r in t.to_df(spark, lineage=True).collect()}
    assert after == before


def test_v2_table_reads_null_lineage(spark, tmp_path):
    t = _mk(tmp_path, fv="2")
    t.append(_df(spark, [(1, "a")]))
    row = t.to_df(spark, lineage=True).collect()[0]
    assert row[ROW_ID_COL] is None           # v2: no lineage assigned
    assert row[LAST_SEQ_COL] is not None     # seq still known from manifest
    assert t.metadata().next_row_id == 0


def test_lineage_off_keeps_schema_clean(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a")]))
    assert t.to_df(spark).columns == ["id", "val"]


def test_empty_table_lineage_schema(spark, tmp_path):
    t = _mk(tmp_path)
    df = t.to_df(spark, lineage=True)
    assert df.columns == ["id", "val", ROW_ID_COL, LAST_SEQ_COL]
    assert df.count() == 0


def test_changed_rows_since_sees_updates_once(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))       # sid 1
    src = spark.createDataFrame(
        [(3, "X", "u"), (7, "Y", "u"), (99, "new", "c")],
        "id long, val string, __op string",
    )
    merge_into(t, src)                                            # sid 2
    out = t.changed_rows_since(spark, 1).collect()
    assert sorted((r.id, r.val) for r in out) == [(3, "X"), (7, "Y"), (99, "new")]
    assert all(r[LAST_SEQ_COL] == 2 for r in out)


def test_changed_rows_survives_compaction(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    for i in range(3):
        t.append(_df(spark, [(i, f"v{i}")]))                      # sids 1..3
    src = spark.createDataFrame([(1, "B", "u")], "id long, val string, __op string")
    merge_into(t, src)                                            # sid 4
    t.compact(spark, target_file_bytes=512 * 1024 * 1024)         # sid 5 rewrite
    # rewritten files have NEW sequence numbers, but materialized lineage
    # keeps old rows out of the changed-set
    out = t.changed_rows_since(spark, 3).collect()
    assert sorted((r.id, r.val) for r in out) == [(1, "B")]


def test_changed_rows_double_update_emits_final_version(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b")]))                    # sid 1
    merge_into(t, spark.createDataFrame([(1, "mid", "u")], "id long, val string, __op string"))
    merge_into(t, spark.createDataFrame([(1, "final", "u")], "id long, val string, __op string"))
    out = t.changed_rows_since(spark, 1).collect()
    assert [(r.id, r.val) for r in out] == [(1, "final")]


def test_changed_rows_rejects_unknown_snapshot(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        t.changed_rows_since(spark, 99)


def test_changed_rows_prunes_old_files(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a")]))                              # sid 1
    t.append(_df(spark, [(2, "b")]))                              # sid 2
    df = t.changed_rows_since(spark, 1)
    # only the sid-2 file may appear in the scan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    old_file = [f.path for f in t.current_files() if f.seq == 1][0]
    import os as _os

    assert _os.path.basename(old_file) not in plan
    assert [(r.id, r.val) for r in df.collect()] == [(2, "b")]


def test_cow_merge_preserves_untouched_row_ids(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))
    before = {r.id: r[ROW_ID_COL] for r in t.to_df(spark, lineage=True).collect()}
    src = spark.createDataFrame([(4, "B", "u")], "id long, val string, __op string")
    merge_into(t, src, mode="copy-on-write")
    after = {r.id: r for r in t.to_df(spark, lineage=True).collect()}
    # every untouched row keeps its id even though its file was rewritten
    for i in range(10):
        if i != 4:
            assert after[i][ROW_ID_COL] == before[i]
    assert after[4].val == "B"
    assert len({r[ROW_ID_COL] for r in after.values()}) == 10
    # and changed_rows_since reports ONLY the upserted key
    chg = t.changed_rows_since(spark, 1).collect()
    assert [(r.id, r.val) for r in chg] == [(4, "B")]


def test_append_drops_foreign_lineage_columns(spark, tmp_path):
    t1 = LakeTable.create(
        str(tmp_path / "src"), SCHEMA, identifier_fields=["id"],
        properties={"format-version": "3"},
    )
    t1.append(_df(spark, [(1, "a"), (2, "b")]))
    t2 = LakeTable.create(
        str(tmp_path / "dst"), SCHEMA, identifier_fields=["id"],
        properties={"format-version": "3"},
    )
    # copying via a lineage read must NOT smuggle t1's row ids into t2
    t2.append(t1.to_df(spark, lineage=True))
    t2.append(_df(spark, [(3, "c")]))
    rows = t2.to_df(spark, lineage=True).collect()
    ids = sorted(r[ROW_ID_COL] for r in rows)
    assert ids == [0, 1, 2]            # t2's own contiguous id space
    import pyarrow.parquet as pq

    for f in t2.current_files():
        assert ROW_ID_COL not in pq.read_schema(f.path).names


def test_changed_rows_requires_v3(spark, tmp_path):
    t = _mk(tmp_path, fv="2")
    t.append(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="format-version"):
        t.changed_rows_since(spark, 1)


def test_concurrent_appends_never_overlap_id_ranges(spark, tmp_path):
    """Optimistic-concurrency race: parallel appends must serialize through
    the CAS metadata commit, each retry re-reading next_row_id — so the
    assigned ranges are disjoint and every row id is unique."""
    from concurrent.futures import ThreadPoolExecutor

    t = _mk(tmp_path)
    dfs = [
        _df(spark, [(w * 10 + i, f"w{w}r{i}") for i in range(5)])
        for w in range(4)
    ]
    with ThreadPoolExecutor(max_workers=4) as pool:
        rows_written = list(pool.map(lambda d: t.append(d), dfs))
    assert rows_written == [5, 5, 5, 5]
    out = t.to_df(spark, lineage=True).collect()
    assert len(out) == 20
    ids = sorted(r[ROW_ID_COL] for r in out)
    assert ids == list(range(20))          # disjoint contiguous ranges
    assert t.metadata().next_row_id == 20
    assert len(t.metadata().snapshots) == 4


def test_branch_commits_share_the_lineage_counter(spark, tmp_path):
    """WAP interplay: ids assigned on a branch come from the same
    next-row-id counter as main, so publishing via fast_forward can never
    introduce duplicate row ids."""
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b")]))            # main: ids 0,1
    t.create_branch("audit")
    src = spark.createDataFrame(
        [(2, "B", "u"), (3, "c", "c")], "id long, val string, __op string"
    )
    merge_into(t, src, branch="audit")
    t.fast_forward("audit")
    rows = t.to_df(spark, lineage=True).collect()
    ids = sorted(r[ROW_ID_COL] for r in rows)
    assert len(ids) == len(set(ids)) == 3
    assert min(ids) == 0 and max(ids) >= 2


def test_v2_to_v3_upgrade_starts_lineage(spark, tmp_path):
    """Operational upgrade path: flipping format-version on a live v2
    table starts id assignment at the next commit; pre-upgrade rows stay
    null until a rewrite materializes nothing for them (spec: ids are
    assigned on upgrade lazily — surfacing null is the honest reading
    without rewriting history)."""
    t = _mk(tmp_path, fv="2")
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    t.update_properties(**{"format-version": "3"})
    t.append(_df(spark, [(3, "c")]))
    rows = {r.id: r for r in t.to_df(spark, lineage=True).collect()}
    assert rows[1][ROW_ID_COL] is None and rows[2][ROW_ID_COL] is None
    assert rows[3][ROW_ID_COL] == 0          # counter starts at upgrade
    assert t.metadata().next_row_id == 1
    # post-upgrade commits keep counting
    t.append(_df(spark, [(4, "d"), (5, "e")]))
    rows = {r.id: r for r in t.to_df(spark, lineage=True).collect()}
    assert sorted(
        r[ROW_ID_COL] for r in rows.values() if r[ROW_ID_COL] is not None
    ) == [0, 1, 2]


def test_changed_rows_with_delete_images_equality(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(10)]))       # sid 1
    src = spark.createDataFrame(
        [(3, "X", "u"), (5, "-", "d"), (8, "-", "d"), (99, "new", "c")],
        "id long, val string, __op string",
    )
    merge_into(t, src, keep_deletes=False, delete_style="equality")  # sid 2
    out = t.changed_rows_since(spark, 1, include_deletes=True).collect()
    got = sorted((r.id, r.val, r["_change_type"]) for r in out)
    # deletes carry the PRE-image (v5/v8), upserts the post-image
    assert got == [
        (3, "X", "upsert"), (5, "v5", "delete"), (8, "v8", "delete"),
        (99, "new", "upsert"),
    ]
    # delete images keep their original lineage
    by_id = {r.id: r for r in out}
    assert by_id[5][LAST_SEQ_COL] == 1 and by_id[5][ROW_ID_COL] is not None
    assert by_id[3][LAST_SEQ_COL] == 2


def test_changed_rows_with_delete_images_position_then_compact(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(i, f"v{i}") for i in range(6)]))        # sid 1
    src = spark.createDataFrame(
        [(2, "-", "d")], "id long, val string, __op string"
    )
    merge_into(t, src, keep_deletes=False, delete_style="position")  # sid 2
    out = t.changed_rows_since(spark, 1, include_deletes=True).collect()
    assert sorted((r.id, r.val, r["_change_type"]) for r in out) == [
        (2, "v2", "delete")
    ]
    # compaction MATERIALIZES the delete (victim row and delete file both
    # vanish) — the removed-file candidates must still surface the image
    t.compact(spark, target_file_bytes=512 * 1024 * 1024)         # rewrite
    assert not t.current_deletes()
    out2 = t.changed_rows_since(spark, 1, include_deletes=True).collect()
    assert sorted((r.id, r.val, r["_change_type"]) for r in out2) == [
        (2, "v2", "delete")
    ]


def test_changed_rows_delete_then_reinsert_is_upsert_only(spark, tmp_path):
    from debezium_server_iceberg_spark.operators.merge import merge_into

    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a"), (2, "b")]))                    # sid 1
    merge_into(
        t,
        spark.createDataFrame([(1, "-", "d")], "id long, val string, __op string"),
        keep_deletes=False,
    )                                                             # sid 2
    merge_into(
        t,
        spark.createDataFrame([(1, "back", "c")], "id long, val string, __op string"),
    )                                                             # sid 3
    out = t.changed_rows_since(spark, 1, include_deletes=True).collect()
    assert sorted((r.id, r.val, r["_change_type"]) for r in out) == [
        (1, "back", "upsert")
    ]


def test_changed_rows_include_deletes_no_changes(spark, tmp_path):
    t = _mk(tmp_path)
    t.append(_df(spark, [(1, "a")]))                              # sid 1
    out = t.changed_rows_since(spark, 1, include_deletes=True)
    assert out.count() == 0
    assert "_change_type" in out.columns
