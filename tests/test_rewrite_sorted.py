"""Clustered rewrite: sort and z-order strategies (Iceberg
rewrite_data_files sort/zorder parity) — file bounds must become prunable."""

import random

from pyspark.sql import types as T

from debezium_server_iceberg_spark.lakehouse import LakeCatalog

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("x", T.LongType(), True),
        T.StructField("y", T.LongType(), True),
    ]
)


def _grid_table(spark, warehouse, name, n=32):
    """4 appended files, each spanning the FULL x/y range (worst case for
    pruning)."""
    t = LakeCatalog(warehouse).create_table("ns", name, SCHEMA, identifier_fields=["id"])
    rng = random.Random(11)
    pts = [(i, i % n, (i * 7) % n) for i in range(n * n)]
    rng.shuffle(pts)
    q = len(pts) // 4
    for b in range(4):
        t.append(spark.createDataFrame(pts[b * q : (b + 1) * q], SCHEMA))
    return t, pts


def _overlaps(f, col, lo, hi):
    b = f.bounds.get(col)
    return b is None or not (b[1] < lo or b[0] > hi)


def test_sort_rewrite_tightens_bounds_and_preserves_rows(spark, warehouse):
    t, pts = _grid_table(spark, warehouse, "srt")
    total = sum(f.bytes for f in t.current_files())
    n = t.rewrite_sorted(spark, ["x"], target_file_bytes=max(1, total // 4))
    assert n == 4
    files = t.current_files()
    assert len(files) >= 3  # range partition may merge a boundary
    # every file now records x bounds and covers a narrow slice, so a
    # point-range predicate prunes most files
    widths = [f.bounds["x"][1] - f.bounds["x"][0] for f in files]
    assert max(widths) <= 16  # full range is 31 wide pre-rewrite
    hit = [f for f in files if _overlaps(f, "x", 0, 3)]
    assert len(hit) == 1
    got = sorted((r.id, r.x, r.y) for r in t.to_df(spark).collect())
    assert got == sorted(pts)


def test_zorder_rewrite_gives_multi_column_locality(spark, warehouse):
    t, pts = _grid_table(spark, warehouse, "zord")
    total = sum(f.bytes for f in t.current_files())
    t.rewrite_sorted(
        spark, ["x", "y"], zorder=True,
        target_file_bytes=max(1, total // 4), zorder_bits=8,
    )
    files = t.current_files()
    assert len(files) >= 3
    # a quadrant box query must NOT touch every file: the Morton curve keeps
    # both dimensions partially local (4 files over a 32x32 grid ~ quadrants)
    box = [
        f for f in files if _overlaps(f, "x", 0, 15) and _overlaps(f, "y", 0, 15)
    ]
    assert len(box) < len(files)
    got = sorted((r.id, r.x, r.y) for r in t.to_df(spark).collect())
    assert got == sorted(pts)


def test_rewrite_materializes_deletes(spark, warehouse):
    t, pts = _grid_table(spark, warehouse, "dels")
    upd = spark.createDataFrame([(5, 99, 99)], SCHEMA)
    t.commit_row_delta(upd, upd)
    assert t.current_deletes()
    total = sum(f.bytes for f in t.current_files())
    t.rewrite_sorted(spark, ["x"], target_file_bytes=max(1, total // 2))
    assert t.current_deletes() == []
    rows = {r.id: (r.x, r.y) for r in t.to_df(spark).collect()}
    assert rows[5] == (99, 99)
    assert len(rows) == len(pts)
