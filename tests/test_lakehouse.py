"""Lakehouse table format: create/append/overwrite/evolve/time-travel/partitioning."""

import pytest
from pyspark.sql import Row, functions as F, types as T

from debezium_server_iceberg_spark.lakehouse import LakeCatalog, parse_partition_spec
from debezium_server_iceberg_spark.lakehouse.transforms import PartitionSpecError


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def test_create_append_read(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "t1", SCHEMA, identifier_fields=["id"])
    df = spark.createDataFrame([(1, "a", None), (2, "b", None)], SCHEMA)
    t.append(df)
    got = t.to_df(spark).orderBy("id").collect()
    assert [(r.id, r.name) for r in got] == [(1, "a"), (2, "b")]
    t.append(spark.createDataFrame([(3, "c", None)], SCHEMA))
    assert t.to_df(spark).count() == 3
    assert t.row_count() == 3
    # snapshot history
    meta = t.metadata()
    assert [s.operation for s in meta.snapshots] == ["append", "append"]
    # time travel to first snapshot
    first = meta.snapshots[0].snapshot_id
    assert t.to_df(spark, snapshot_id=first).count() == 2


def test_overwrite(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "t2", SCHEMA)
    t.append(spark.createDataFrame([(1, "a", None)], SCHEMA))
    t.overwrite(spark.createDataFrame([(9, "z", None)], SCHEMA))
    got = t.to_df(spark).collect()
    assert [(r.id, r.name) for r in got] == [(9, "z")]


def test_schema_evolution_read_old_files(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "t3", SCHEMA)
    t.append(spark.createDataFrame([(1, "a", None)], SCHEMA))
    new_schema = T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType(), True)])
    t.update_schema(new_schema)
    t.append(
        spark.createDataFrame([(2, "b", None, "x")], new_schema)
    )
    got = {r.id: r.extra for r in t.to_df(spark).collect()}
    assert got == {1: None, 2: "x"}


def test_partitioned_write_and_manifest_pruning(spark, warehouse):
    cat = LakeCatalog(warehouse)
    spec = parse_partition_spec("year(ts), bucket(4, id)")
    t = cat.create_table("ns", "t4", SCHEMA, identifier_fields=["id"], partition_spec=spec)
    rows = [(i, f"n{i}", f"202{i % 3}-01-0{i % 9 + 1} 00:00:00") for i in range(20)]
    df = (
        spark.createDataFrame(rows, "id long, name string, ts string")
        .withColumn("ts", F.to_timestamp("ts"))
    )
    t.append(df)
    files = t.current_files()
    assert len(files) > 1
    for f_ in files:
        assert "_p_year_ts" in f_.partition
        assert "_p_bucket4_id" in f_.partition
        assert "id" in f_.bounds
    assert t.to_df(spark).count() == 20
    # path values are raw strings (type-blind parse; consumers normalize)
    years = {int(f_.partition["_p_year_ts"]) for f_ in files}
    assert years == {2020, 2021, 2022}


def test_commit_conflict_detection(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "t5", SCHEMA)
    t.append(spark.createDataFrame([(1, "a", None)], SCHEMA))
    assert t.metadata().version >= 1


def test_partition_spec_parse():
    spec = parse_partition_spec("year(ts), bucket(16, id), region, truncate(3, name)")
    assert [(p.transform, p.source, p.param) for p in spec] == [
        ("year", "ts", None),
        ("bucket", "id", 16),
        ("identity", "region", None),
        ("truncate", "name", 3),
    ]
    # arg order tolerated
    assert parse_partition_spec("bucket(id, 16)")[0].param == 16
    with pytest.raises(PartitionSpecError):
        parse_partition_spec("wat(ts)")
    # lenient mode skips missing columns (IcebergUtil.java:239-261)
    assert parse_partition_spec("year(nope), id", {"id"}, strict=False) == parse_partition_spec("id")
    with pytest.raises(PartitionSpecError):
        parse_partition_spec("year(nope)", {"id"}, strict=True)


def test_compact_binpacks_small_files(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "tc", SCHEMA)
    # five tiny appends -> five+ small files
    for i in range(5):
        t.append(spark.createDataFrame([(i, f"r{i}", None)], SCHEMA))
    before = t.current_files()
    assert len(before) >= 5
    removed = t.compact(spark, target_file_bytes=1 << 20)
    assert removed == len(before)
    after = t.current_files()
    assert len(after) < len(before)
    assert t.to_df(spark).count() == 5
    assert {r.id for r in t.to_df(spark).collect()} == set(range(5))
    # idempotent: nothing left to compact
    assert t.compact(spark, target_file_bytes=1 << 20) == 0


def test_compact_max_input_files_bounds_one_pass(spark, warehouse):
    """max_input_files caps ONE compaction's rewrite work (smallest files
    first); repeated cadence calls still converge to a compacted table —
    the bounded-maintenance contract streaming index feeds rely on."""
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "tcap", SCHEMA)
    for i in range(9):
        t.append(spark.createDataFrame([(i, f"r{i}", None)], SCHEMA))
    n0 = len(t.current_files())
    assert n0 >= 9
    removed = t.compact(spark, target_file_bytes=1 << 20, max_input_files=4)
    assert removed == 4  # exactly the cap, not the whole table
    assert len(t.current_files()) == n0 - 4 + 1
    # convergence: a few more capped passes leave nothing small enough
    while t.compact(spark, target_file_bytes=1 << 20, max_input_files=4):
        pass
    assert t.to_df(spark).count() == 9
    assert {r.id for r in t.to_df(spark).collect()} == set(range(9))
    # a cap below min_input_files is a no-op, never an error
    assert t.compact(spark, min_input_files=5, max_input_files=2) == 0


def test_partition_values_pruning_is_conservative(spark, warehouse):
    """to_df(partition_values=) planning contract: prunes only what it
    can PROVE excluded — unknown field names, files from an old spec,
    and untrusted bucket-hash layouts all keep every file; a trusted
    bucket field prunes to exactly the allowed ordinals' files."""
    from pyspark.sql import types as T

    from debezium_server_iceberg_spark.lakehouse.table import (
        BUCKET_HASH_PROP,
        _prune_files_by_partition_values,
    )
    from debezium_server_iceberg_spark.lakehouse.transforms import PartitionField

    cat = LakeCatalog(warehouse)
    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
    )
    t = cat.create_table(
        "ns", "tpv", schema, partition_spec=[PartitionField("k", "bucket", 8)]
    )
    t.append(
        spark.createDataFrame([(f"k{i}", i) for i in range(40)], schema)
    )
    meta = t.metadata()
    files = t.current_files()
    buckets = {f.partition["_p_bucket8_k"] for f in files}
    assert len(buckets) > 1
    keep_one = {next(iter(buckets))}
    pruned = _prune_files_by_partition_values(
        meta, files, {"_p_bucket8_k": keep_one}
    )
    assert 0 < len(pruned) < len(files)
    assert {f.partition["_p_bucket8_k"] for f in pruned} == keep_one
    # and the pruned read returns exactly the full read's matching rows
    got = t.to_df(spark, partition_values={"_p_bucket8_k": keep_one})
    full = t.to_df(spark)
    probe_keys = [r["k"] for r in got.select("k").collect()]
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, full.filter(F.col("k").isin(probe_keys)).collect())
    )
    # unknown partition-field name: keeps everything
    assert len(
        _prune_files_by_partition_values(meta, files, {"_p_no_such": {"0"}})
    ) == len(files)
    # untrusted bucket hash (pre-murmur3 layout stamp): keeps everything
    import dataclasses

    props = dict(meta.properties)
    props.pop(BUCKET_HASH_PROP, None)
    untrusted = dataclasses.replace(meta, properties=props)
    assert len(
        _prune_files_by_partition_values(
            untrusted, files, {"_p_bucket8_k": keep_one}
        )
    ) == len(files)


def test_expire_snapshots_deletes_orphans(spark, warehouse):
    import os

    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "te", SCHEMA)
    t.append(spark.createDataFrame([(1, "a", None)], SCHEMA))
    t.overwrite(spark.createDataFrame([(2, "b", None)], SCHEMA))
    old_files = {f.path for f in t._manifest_files(t.metadata(), t.metadata().snapshots[0].snapshot_id)}
    assert all(os.path.exists(p) for p in old_files)
    deleted = t.expire_snapshots(keep_last=1)
    assert deleted == len(old_files) and deleted > 0
    assert all(not os.path.exists(p) for p in old_files)
    # current data untouched, history truncated
    assert [r.id for r in t.to_df(spark).collect()] == [2]
    assert len(t.metadata().snapshots) == 1


def test_max_records_per_file_rolls_files(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table(
        "ns", "troll", SCHEMA, properties={"write.max-records-per-file": "3"}
    )
    t.append(
        spark.createDataFrame([(i, f"r{i}", None) for i in range(10)], SCHEMA).coalesce(1)
    )
    files = t.current_files()
    assert len(files) >= 4  # 10 rows / 3 per file
    assert max(f.rows for f in files) <= 3
    assert t.to_df(spark).count() == 10


def test_table_history_surface(spark, warehouse):
    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "th", SCHEMA, identifier_fields=["id"])
    t.append(spark.createDataFrame([(1, "a", None)], SCHEMA))
    t.overwrite(spark.createDataFrame([(2, "b", None)], SCHEMA))
    hist = t.history(spark).orderBy("snapshot_id").collect()
    assert [h["operation"] for h in hist] == ["append", "overwrite"]
    assert hist[1]["total_rows"] == 1
    assert hist[0]["snapshot_id"] < hist[1]["snapshot_id"]


def test_abort_cleans_staged_files(spark, warehouse, monkeypatch):
    """W12: a failed commit leaves zero uncommitted files on disk, and a
    subsequent write succeeds untouched (writer.abort() parity)."""
    import os

    from debezium_server_iceberg_spark.lakehouse import table as table_mod

    cat = LakeCatalog(warehouse)
    t = cat.create_table("ns", "abort_t", SCHEMA, identifier_fields=["id"])
    df = spark.createDataFrame([(1, "a", None), (2, "b", None)], SCHEMA)
    t.append(df)
    committed = {f.path for f in t.current_files()}

    def boom(*a, **k):
        raise table_mod.CommitConflict("synthetic")

    monkeypatch.setattr(t, "_commit_snapshot", boom)
    with pytest.raises(table_mod.CommitConflict):
        t.append(spark.createDataFrame([(3, "c", None)], SCHEMA))
    with pytest.raises(table_mod.CommitConflict):
        t.commit_row_delta(
            spark.createDataFrame([(4, "d", None)], SCHEMA),
            spark.createDataFrame([(4, "d", None)], SCHEMA),
        )
    monkeypatch.undo()

    on_disk = set()
    for root, _dirs, names in os.walk(t.data_dir):
        for n in names:
            if n.endswith(".parquet"):
                on_disk.add(os.path.join(root, n))
    assert on_disk == committed  # no orphans from the two aborted writes

    t.append(spark.createDataFrame([(5, "e", None)], SCHEMA))
    assert t.row_count() == 3


def test_register_views_sql_read_surface(spark, warehouse):
    """spark.sql over registered views — the reference's own verification
    read path (BaseSparkTest.java:170-178)."""
    cat = LakeCatalog(warehouse)
    t1 = cat.create_table("ns", "orders_v", SCHEMA, identifier_fields=["id"])
    t1.append(spark.createDataFrame([(1, "a", None), (2, "b", None)], SCHEMA))
    cat.create_table("ns", "empty_v", SCHEMA)
    views = cat.register_views(spark, "ns", prefix="lk_")
    assert views == ["lk_empty_v", "lk_orders_v"]
    got = spark.sql(
        "SELECT id, name FROM lk_orders_v WHERE id > 1 ORDER BY id"
    ).collect()
    assert [(r.id, r.name) for r in got] == [(2, "b")]
    assert spark.sql("SELECT count(*) AS n FROM lk_empty_v").first()["n"] == 0
    # re-register advances the snapshot
    t1.append(spark.createDataFrame([(3, "c", None)], SCHEMA))
    cat.register_views(spark, "ns", prefix="lk_")
    assert spark.sql("SELECT count(*) AS n FROM lk_orders_v").first()["n"] == 3


def test_remove_orphan_files(spark, warehouse):
    """W12 completion: files a crashed writer staged but never committed
    are reclaimed; referenced files and young files survive."""
    import os
    import time

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog

    cat = LakeCatalog(warehouse)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, v string")
    t = cat.create_table("ns", "orphans", df.schema, identifier_fields=["id"])
    t.append(df)

    # simulate a crashed writer: stray staged files in the data dir
    stray_dir = os.path.join(t.data_dir, "crashed-uuid")
    os.makedirs(stray_dir)
    stray = os.path.join(stray_dir, "part-000.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"not really parquet")
    young = os.path.join(t.data_dir, "young.parquet")
    with open(young, "wb") as fh:
        fh.write(b"fresh stage in flight")

    old = time.time() - 7200
    os.utime(stray, (old, old))

    removed = t.remove_orphan_files(older_than_seconds=3600)
    assert removed == [stray]
    assert not os.path.exists(stray_dir)  # empty staging dir swept
    assert os.path.exists(young)  # grace period protects in-flight writes
    # committed data untouched
    assert t.to_df(spark).count() == 10
    # time travel across all retained snapshots still works
    for s in t.metadata().snapshots:
        t.to_df(spark, snapshot_id=s.snapshot_id).count()
    # second pass: nothing left to reclaim (young still inside grace)
    assert t.remove_orphan_files(older_than_seconds=3600) == []


def test_rename_table_preserves_contents_and_history(spark, tmp_path):
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(8)], "id long, v string")
    t = cat.create_table("a", "orig", df.schema, identifier_fields=["id"])
    t.append(df)
    upd = spark.createDataFrame([(3, "X", "u")], "id long, v string, __op string")
    merge_into(t, upd)       # leaves a live MoR delete file
    before = {r.id: r.v for r in t.to_df(spark).collect()}

    t2 = cat.rename_table("a", "orig", "b", "moved")
    assert not cat.table_exists("a", "orig")
    assert cat.table_exists("b", "moved")
    after = {r.id: r.v for r in t2.to_df(spark).collect()}
    assert after == before and after[3] == "X"
    # history (time travel) survives the move
    assert len(t2.metadata().snapshots) == 2
    assert t2.to_df(spark, snapshot_id=1).count() == 8
    # and the renamed table still accepts commits
    t2.append(spark.createDataFrame([(100, "new")], "id long, v string"))
    assert t2.to_df(spark).count() == 9

    import pytest as _p
    with _p.raises(FileExistsError):
        cat.create_table("b", "moved", df.schema)


def test_rename_table_structured_rewrite(spark, tmp_path, monkeypatch):
    """ADVICE r7: the rename rewrite must be field-targeted, not a blind
    substring replace — a STRING VALUE equal to the old table path (e.g. a
    column bound of a path-valued column) survives untouched; a relative
    warehouse path still renames correctly (catalog normalizes to
    absolute)."""
    import os

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog

    monkeypatch.chdir(tmp_path)
    cat = LakeCatalog("rel_wh")                         # RELATIVE on purpose
    old_loc = os.path.join(str(tmp_path), "rel_wh", "a", "pt")
    df = spark.createDataFrame(
        [(1, old_loc), (2, old_loc + "/sub")], "id long, p string"
    )
    t = cat.create_table("a", "pt", df.schema, identifier_fields=["id"])
    t.append(df)
    # identifier bounds put the path-valued strings into manifest bounds
    t2 = cat.rename_table("a", "pt", "a", "pt2")
    rows = {r.id: r.p for r in t2.to_df(spark).collect()}
    # user DATA must keep the old path string verbatim
    assert rows == {1: old_loc, 2: old_loc + "/sub"}
    # metadata location and data-file paths moved
    assert t2.metadata().location.endswith(os.path.join("rel_wh", "a", "pt2"))
    for f in t2.current_files():
        assert os.path.isabs(f.path) and "/pt2/" in f.path
        assert os.path.exists(f.path)


def test_row_filter_prunes_files_and_matches_plain_filter(spark, tmp_path):
    """to_df(row_filter=...) is Iceberg's planFiles: driver-side file
    pruning from partition transform values + column bounds, with the
    residual filter making results EXACTLY equal to a plain .filter()."""
    import datetime as dt

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.lakehouse.table import (
        _prune_files_by_filter,
    )

    cat = LakeCatalog(str(tmp_path / "wh"))
    rows = [
        (i, dt.datetime(2023 + i % 2, 1 + i % 12, 3, 6), f"g{i % 3}", i * 5)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, grp string, n long")
    t = cat.create_table(
        "ns", "pt", df.schema, identifier_fields=["id"],
        partition_spec="bucket(4, id), month(ts)",
    )
    t.append(df)
    meta, files = t.metadata(), t.current_files()
    assert len(files) > 4

    # bucket equality on the partition source prunes to one bucket's files
    kept = _prune_files_by_filter(meta, files, {"id": 17})
    assert 0 < len(kept) < len(files)
    got = t.to_df(spark, row_filter={"id": 17}).collect()
    exp = t.to_df(spark).filter("id = 17").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]

    # temporal range prunes by month encoding
    lo, hi = dt.datetime(2023, 2, 1), dt.datetime(2023, 3, 31)
    kept2 = _prune_files_by_filter(meta, files, {"ts": (lo, hi)})
    assert 0 < len(kept2) < len(files)
    a = sorted(r["id"] for r in t.to_df(spark, row_filter={"ts": (lo, hi)}).collect())
    b = sorted(
        r["id"] for r in t.to_df(spark).filter(
            (F.col("ts") >= lo) & (F.col("ts") <= hi)).collect()
    )
    assert a == b and a

    # key-bounds pruning works on NON-partition columns too (range-
    # clustered identifier bounds), and never loses rows
    a2 = sorted(r["id"] for r in t.to_df(spark, row_filter={"n": (100, 120)}).collect())
    b2 = sorted(r["id"] for r in t.to_df(spark).filter("n between 100 and 120").collect())
    assert a2 == b2 and a2


def test_row_filter_survives_spec_evolution(spark, tmp_path):
    """Old-spec files have no current-spec partition values — they must
    stay in every pruned scan (conservative), so results never change."""
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog

    cat = LakeCatalog(str(tmp_path / "wh"))
    df1 = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(10)], "id long, grp string"
    )
    t = cat.create_table(
        "ns", "ev", df1.schema, identifier_fields=["id"], partition_spec="grp",
    )
    t.append(df1)
    t.update_partition_spec("bucket(2, id)")
    t.append(spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(10, 20)], "id long, grp string"
    ))
    for probe in (3, 15):
        got = sorted(r["id"] for r in t.to_df(spark, row_filter={"id": probe}).collect())
        assert got == [probe]


def test_string_partition_value_with_leading_zeros(spark, tmp_path):
    """A STRING identity-partition value like '007' must stay '007'
    through the type-blind path parse — coercion to int 7 would export a
    wrong partition value and make merge pruning skip the file."""
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        export_iceberg_table, java_avro_records, plan_iceberg_scan,
        read_iceberg_table,
    )
    from debezium_server_iceberg_spark.operators.merge import merge_into
    import json as _json

    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "007", "a"), (2, "7", "b"), (3, "042", "c")],
        "id long, code string, v string",
    )
    t = cat.create_table(
        "ns", "codes", df.schema, identifier_fields=["id"],
        partition_spec="code",
    )
    t.append(df)
    codes = {f.partition["_p_code"] for f in t.current_files()}
    assert codes == {"007", "7", "042"}

    # merge touching code='007' must not be pruned away from its file
    upd = spark.createDataFrame(
        [(1, "007", "updated", "u")], "id long, code string, v string, __op string"
    )
    merge_into(t, upd)
    got = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert got == {1: "updated", 2: "b", 3: "c"}

    # export keeps the exact string partition values
    dest = str(tmp_path / "pub")
    export_iceberg_table(t, dest)
    md = _json.load(open(dest + "/metadata/v1.metadata.json"))
    vals = set()
    for m in [_json.loads(s) for s in java_avro_records(
            spark, md["snapshots"][-1]["manifest-list"])]:
        if m.get("content", 0) != 0:
            continue
        for e in [_json.loads(s) for s in java_avro_records(spark, m["manifest_path"])]:
            vals.add(e["data_file"]["partition"]["code"])
    assert "007" in vals and "042" in vals
    # pruned read distinguishes '007' from '7'
    assert {r["id"] for r in read_iceberg_table(
        spark, dest, partition_filter={"code": "007"}).filter("code = '007'").collect()} == {1}
    assert plan_iceberg_scan(dest, partition_filter={"code": "007"})["pruned_files"] > 0


def test_row_filter_type_mismatches_stay_conservative(spark, tmp_path):
    """Review r8 findings: bucket hashing dispatches on the DECLARED
    column type (an int filter on a decimal column must match
    Decimal-stored rows), timestamp micros hash exactly (float
    total_seconds() is 1us off for ~1% of values), and identity-decimal
    equality normalizes to the declared scale."""
    import datetime as dt
    from decimal import Decimal

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog

    cat = LakeCatalog(str(tmp_path / "wh"))
    rows = [
        (i, Decimal(i).quantize(Decimal("0.01")),
         dt.datetime(2024, 1, 1 + i % 20, 8, 29, 2, 646319 + i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "id long, price decimal(9,2), ts timestamp")
    t = cat.create_table(
        "ns", "tm", df.schema, identifier_fields=["id"],
        partition_spec="bucket(4, price), bucket(4, ts)",
    )
    t.append(df)

    # int filter value on the DECIMAL bucket column
    got = t.to_df(spark, row_filter={"price": 7}).collect()
    assert [r["id"] for r in got] == [7]
    # Decimal at a different scale
    got2 = t.to_df(spark, row_filter={"price": Decimal("7")}).collect()
    assert [r["id"] for r in got2] == [7]
    # microsecond-precision timestamp bucket equality
    probe = rows[13][2]
    got3 = t.to_df(spark, row_filter={"ts": probe}).collect()
    assert [r["id"] for r in got3] == [13]

    # identity-decimal partition: '7' vs path '7.00'
    t2 = cat.create_table(
        "ns", "tid", df.schema, identifier_fields=["id"],
        partition_spec="price",
    )
    t2.append(df)
    assert [r["id"] for r in t2.to_df(
        spark, row_filter={"price": Decimal("7")}).collect()] == [7]
    assert [r["id"] for r in t2.to_df(spark, row_filter={"price": 7}).collect()] == [7]


def test_changed_rows_delete_images_decimal_keys(spark, tmp_path):
    """Decimal identifier bounds persist as strings; the candidate
    key-bounds pruning must stay conservative, not TypeError."""
    from decimal import Decimal

    from debezium_server_iceberg_spark.lakehouse.table import LakeTable
    from debezium_server_iceberg_spark.operators.merge import merge_into
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("pk", T.DecimalType(9, 2)),
        T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(
        str(tmp_path / "t"), schema, identifier_fields=["pk"],
        properties={"format-version": "3"},
    )
    t.append(spark.createDataFrame(
        [(Decimal(i).quantize(Decimal("0.01")), f"v{i}") for i in range(6)], schema
    ))
    src = spark.createDataFrame(
        [(Decimal("2.00"), "-", "d")], "pk decimal(9,2), v string, __op string"
    )
    merge_into(t, src, keep_deletes=False, delete_style="equality")
    out = t.changed_rows_since(spark, 1, include_deletes=True).collect()
    assert [(str(r["pk"]), r["v"], r["_change_type"]) for r in out] == [
        ("2.00", "v2", "delete")
    ]


def test_row_filter_physical_scan_excludes_pruned_files(spark, tmp_path):
    """The pruning is real file-list surgery, not advisory: a pruned
    file's name must not appear anywhere in the physical scan plan."""
    import os

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.lakehouse.table import (
        _prune_files_by_filter,
    )

    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "id long, v string"
    )
    t = cat.create_table(
        "ns", "pp", df.schema, identifier_fields=["id"],
        partition_spec="bucket(4, id)",
    )
    t.append(df)
    files = t.current_files()
    kept = {os.path.basename(f.path) for f in _prune_files_by_filter(
        t.metadata(), files, {"id": 11})}
    pruned = {os.path.basename(f.path) for f in files} - kept
    assert kept and pruned
    scanned = {
        os.path.basename(p)
        for p in t.to_df(spark, row_filter={"id": 11}).inputFiles()
    }
    assert scanned == kept
    assert not (scanned & pruned)


def test_partitioned_lineage_read_no_basename_collisions(spark, tmp_path):
    """One task writing several hive partition dirs used to emit the same
    part-file basename in each — and the read path's per-file broadcast
    maps key on basename, QUADRUPLING rows in lineage/MoR reads of
    partitioned tables. Basenames must be globally unique per file."""
    import os

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.operators.merge import merge_into

    cat = LakeCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(40)], "id long, v string")
    t = cat.create_table(
        "ns", "pl", df.schema, identifier_fields=["id"],
        partition_spec="bucket(4, id)",
        properties={"format-version": "3"},
    )
    # force collisions-if-commit-scoped: coalesce to ONE task so all four
    # partition dirs are written by the same part number
    t.append(df.coalesce(1))
    names = [os.path.basename(f.path) for f in t.current_files()]
    assert len(names) == len(set(names)), f"basename collision: {names}"
    assert t.to_df(spark).count() == 40
    out = t.to_df(spark, lineage=True)
    assert out.count() == 40
    ids = [r["_row_id"] for r in out.collect()]
    assert sorted(ids) == list(range(40))
    # MoR delete on the partitioned table reads exactly once too
    merge_into(
        t,
        spark.createDataFrame([(7, "X", "u")], "id long, v string, __op string"),
        delete_style="equality",
    )
    got = {r["id"]: r["v"] for r in t.to_df(spark).collect()}
    assert len(got) == 40 and got[7] == "X"


def test_pruned_scan_skips_untouchable_delete_files(spark, warehouse):
    """A pruned probe must not pay tombstone-read amplification: an
    equality delete whose key bounds cannot intersect any kept file,
    and a position delete naming only pruned files, drop out of the
    scan plan entirely (exact — their anti-joins would remove nothing
    from the kept files).  Deletes that CAN touch the kept files still
    apply."""
    from debezium_server_iceberg_spark.lakehouse.transforms import PartitionField

    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("grp", T.IntegerType(), True),
            T.StructField("name", T.StringType(), True),
        ]
    )
    cat = LakeCatalog(warehouse)
    t = cat.create_table(
        "ns", "delprune", schema, identifier_fields=["id"],
        partition_spec=[PartitionField("grp", "identity")],
    )
    t.append(spark.createDataFrame([(1, 0, "a"), (2, 0, "b")], schema))
    t.append(spark.createDataFrame([(100, 1, "x"), (101, 1, "y")], schema))
    # equality delete hitting only the grp=1 file's id range
    t.commit_row_delta(None, spark.createDataFrame([(100,)], "id long"))
    # position delete naming only the grp=1 file
    pname = t.metadata().partition_spec[0].name
    grp1_file = next(
        f for f in t.current_files() if str(f.partition.get(pname)) == "1"
    )
    import os as _os

    t.commit_row_delta(
        None,
        None,
        delete_positions_df=spark.createDataFrame(
            [(_os.path.basename(grp1_file.path), 1)], "file_name string, pos long"
        ),
    )

    pruned = t.to_df(spark, partition_values={pname: {0}})
    assert sorted(r.id for r in pruned.collect()) == [1, 2]
    assert "LeftAnti" not in _plan(pruned)  # both deletes pruned away

    # the unpruned scan still applies both deletes
    full = t.to_df(spark)
    assert "LeftAnti" in _plan(full)
    assert sorted(r.id for r in full.collect()) == [1, 2]  # 100 eq-del, 101 pos-del

    # a pruned scan of the TOUCHED partition keeps them
    touched = t.to_df(spark, partition_values={pname: {1}})
    assert "LeftAnti" in _plan(touched)
    assert [r.id for r in touched.collect()] == []


def test_minhash_remove_docs_pruned_probe_skips_delete_file(spark, warehouse):
    """remove_docs tombstone amplification is bounded: a probe pruned to
    buckets whose files' doc bounds exclude the removed docs reads ZERO
    delete files (the r12 verdict's item: delete files prune with the
    partition_values scan)."""
    from conftest import SF_DIR
    from debezium_server_iceberg_spark.functions.incremental import MinHashIndex

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = MinHashIndex.create(LakeCatalog(warehouse), "idx", "mh_delprune")
    # DISJOINT id ranges: the removal's key bounds must be separable
    # from the b1 files' doc bounds for range pruning to bite
    b1 = docs.filter("doc_id < 50").limit(4)
    b2 = docs.filter("doc_id between 200 and 400").limit(4)
    idx.add_batch(b1).collect()
    idx.add_batch(b2).collect()
    removed = [r["doc_id"] for r in b2.select("doc_id").collect()]
    assert removed  # fixture sanity: b2 exists at this scale factor
    idx.remove_docs(spark, removed)

    # files holding only b1 docs: their doc bounds exclude the removals
    b1_ids = {r["doc_id"] for r in b1.select("doc_id").collect()}
    b1_only = [
        f for f in idx.table.current_files()
        if f.bounds.get("doc")
        and f.bounds["doc"][0] in b1_ids and f.bounds["doc"][1] in b1_ids
    ]
    assert b1_only  # the two batches produced disjoint files
    pv = {idx.table.metadata().partition_spec[0].name:
          {f.partition[next(iter(f.partition))] for f in b1_only}}
    # direct check of the planning predicate: the equality-delete file
    # does not touch a scan restricted to b1-only files
    from debezium_server_iceberg_spark.lakehouse.table import _delete_touches_scan
    import os as _os

    dels = idx.table.current_deletes()
    assert dels  # remove_docs really committed a delete file
    names = sorted(_os.path.basename(f.path) for f in b1_only)
    assert all(not _delete_touches_scan(d, b1_only, names) for d in dels)


def test_single_file_fast_path_requires_estimate_headroom(
    spark, warehouse, monkeypatch
):
    """A frame whose PLAN estimate lacks 4x headroom under the target file
    size must never take the repartition(1) branch (VERDICT r15 item 6):
    the ranged path's persist+materialize step sizes the fan-out from the
    TRUE cached bytes instead."""
    import debezium_server_iceberg_spark.lakehouse.table as tmod

    cat = LakeCatalog(warehouse)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame([(i, f"v{i:05d}") for i in range(5000)], schema)

    # simulate a mis-estimated wide frame: the pre-shuffle estimate says
    # "fits one file" (n_parts=1) but with est == target (no headroom);
    # the materialized true size says 3 files
    monkeypatch.setattr(tmod, "_plan_size_est", lambda frame: 4096)

    def fake_auto(frame, meta, materialize=False):
        return 3 if materialize else 1

    monkeypatch.setattr(tmod, "_auto_write_partitions", fake_auto)
    t = cat.create_table(
        "ns",
        "guarded",
        schema,
        identifier_fields=["id"],
        properties={"write.target-file-size-bytes": "4096"},
    )
    t.append(df)
    files = sorted(t.current_files(), key=lambda f: f.bounds["id"][0])
    # ranged, true-size fan-out — NOT one file through one task
    assert len(files) == 3
    for a, b in zip(files, files[1:]):
        assert a.bounds["id"][1] < b.bounds["id"][0]
    assert t.to_df(spark).count() == 5000


def test_keyed_single_file_fast_path_and_oversize_resplit(spark, warehouse, monkeypatch):
    """The keyed-append fast path writes ONE key-sorted file when the plan
    estimate fits a single target file, and the footer-stats safety net
    re-splits an oversize single file into properly ranged files — so a
    selective-filter underestimate can never collapse a big write."""
    import debezium_server_iceberg_spark.lakehouse.table as tmod

    cat = LakeCatalog(warehouse)
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    rows = [(i, f"v{i:05d}") for i in range(5000)]
    df = spark.createDataFrame(rows, schema)

    # normal CDC-sized commit -> exactly one file, bounds = full key range
    t1 = cat.create_table("ns", "fast1", schema, identifier_fields=["id"])
    t1.append(df)
    files = t1.current_files()
    assert len(files) == 1
    assert files[0].bounds["id"] == [0, 4999]
    assert t1.to_df(spark).count() == 5000

    # force the underestimate: sizing says 1 file, but the target file
    # size is tiny -> the staged single file exceeds 2x target and the
    # resplit must kick in, producing ranged (disjoint-bounds) files
    monkeypatch.setattr(tmod, "_auto_write_partitions", lambda *a, **kw: 1)
    t2 = cat.create_table(
        "ns",
        "fast2",
        schema,
        identifier_fields=["id"],
        properties={"write.target-file-size-bytes": "4096"},
    )
    t2.append(df)
    files = sorted(t2.current_files(), key=lambda f: f.bounds["id"][0])
    assert len(files) >= 2
    # ranged: consecutive files' key bounds do not overlap
    for a, b in zip(files, files[1:]):
        assert a.bounds["id"][1] < b.bounds["id"][0]
    assert t2.to_df(spark).count() == 5000
    assert sum(f.rows for f in files) == 5000
