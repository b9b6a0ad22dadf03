"""Iceberg bucket hash (Murmur3 x86 32, seed 0) — spec vectors + the Spark
expression vs the pure-Python from-spec implementation.

The spec's published vectors (Appendix B) pin the PYTHON side to Iceberg;
randomized batches then pin the SPARK expressions to the Python side, so
both faces are transitively spec-exact."""

import datetime as dt
import random
import string
import struct

from pyspark.sql import functions as F

from debezium_server_iceberg_spark.lakehouse.murmur3 import (
    iceberg_bucket_col,
    iceberg_bucket_py,
    mm3_long_col,
    mm3_utf8_col,
    murmur3_32,
    murmur3_long,
    murmur3_utf8,
)


def test_spec_vectors_python():
    # Iceberg spec, Appendix B "32-bit Hash Requirements"
    assert murmur3_long(34) == 2017239379          # int and long agree
    assert murmur3_utf8("iceberg") == 1210000089
    d = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert murmur3_long(d) == -653330422
    micros = int(
        dt.datetime(2017, 11, 16, 22, 31, 8, tzinfo=dt.timezone.utc).timestamp()
        * 1_000_000
    )
    assert murmur3_long(micros) == -2047944441
    bits = struct.unpack("<q", struct.pack("<d", 1.0))[0]
    assert murmur3_32(struct.pack("<q", bits)) == -142385009
    assert murmur3_32(b"") == 0


def test_long_expression_matches_python(spark):  # noqa: F811
    rng = random.Random(7)
    vals = [0, 1, -1, 34, 2**31 - 1, -(2**31), 2**63 - 1, -(2**63)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(300)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select(
        "v", mm3_long_col(F.col("v")).alias("h")).collect()}
    assert all(got[v] == murmur3_long(v) for v in vals)


def test_long_expression_nulls_with_beyond_2p53_values(spark):  # noqa: F811
    # An Arrow batch containing ANY null used to reach the pandas UDF as
    # float64, silently rounding |v| > 2^53 before hashing — a wrong hash
    # becomes a wrong bucket partition stamp that file pruning then
    # trusts.  The wrapper now strips nulls BEFORE the UDF (input stays
    # int64) and restores null-out outside it.
    vals = [
        2**53 + 1,           # first long float64 cannot represent
        -(2**53) - 1,
        2**63 - 1,
        -(2**63),
        2**53 + 12345,
        34,
        None,
        None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select(
        "v", mm3_long_col(F.col("v")).alias("h")).collect()}
    assert got[None] is None
    for v in vals:
        if v is not None:
            assert got[v] == murmur3_long(v), f"wrong hash for {v}"


def test_utf8_expression_matches_python(spark):  # noqa: F811
    rng = random.Random(11)
    vals = ["", "a", "ab", "abc", "abcd", "iceberg", "héllo wörld",
            "日本語テスト", "x" * 257] + [
        "".join(rng.choice(string.printable) for _ in range(rng.randint(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in vals], "s string")
    got = [(r["s"], r["h"]) for r in df.select(
        "s", mm3_utf8_col(F.col("s")).alias("h")).collect()]
    assert all(h == murmur3_utf8(s) for s, h in got)


def test_bucket_col_types_and_nulls(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(34, "iceberg", dt.date(2017, 11, 16),
          dt.datetime(2017, 11, 16, 22, 31, 8)),
         (None, None, None, None)],
        "i long, s string, d date, t timestamp",
    )
    out = df.select(
        iceberg_bucket_col(F.col("i"), "long", 16).alias("bi"),
        iceberg_bucket_col(F.col("s"), "string", 16).alias("bs"),
        iceberg_bucket_col(F.col("d"), "date", 16).alias("bd"),
        iceberg_bucket_col(F.col("t"), "timestamp", 16).alias("bt"),
    ).collect()
    assert out[0]["bi"] == iceberg_bucket_py(2017239379, 16)
    assert out[0]["bs"] == iceberg_bucket_py(1210000089, 16)
    assert out[0]["bd"] == iceberg_bucket_py(-653330422, 16)
    assert out[0]["bt"] == iceberg_bucket_py(-2047944441, 16)
    assert all(out[1][c] is None for c in ("bi", "bs", "bd", "bt"))


def test_bucket_col_refuses_unhashable_types():
    import pytest

    with pytest.raises(ValueError):
        iceberg_bucket_col(F.col("x"), "double", 8)


def test_expression_plan_size_bounded(spark):  # noqa: F811
    """The utf8 hash must stay a small expression (lambda-bound subtrees,
    not multiplicative duplication) — the naive composition serialized to
    a ~60 MB task binary."""
    df = spark.range(10).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("s")
    )
    plan = df.select(mm3_utf8_col(F.col("s")).alias("h"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert len(plan) < 200_000, f"plan string {len(plan)} chars — tree blowup"


def test_decimal_expression_matches_python(spark):
    import random
    from decimal import Decimal

    from debezium_server_iceberg_spark.lakehouse.murmur3 import (
        mm3_decimal_col, murmur3_decimal,
    )

    assert murmur3_decimal(1420) == -500754589   # spec vector: 14.20
    rng = random.Random(5)
    vals = [Decimal("14.20"), Decimal("0.00"), Decimal("-1.28"),
            Decimal("-0.01"), Decimal("99999999999999.99"),
            Decimal("-99999999999999.99")] + [
        Decimal(rng.randint(-10**16, 10**16)) / 100 for _ in range(200)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "d decimal(18,2)")
    got = [(r["d"], r["h"]) for r in df.select(
        "d", mm3_decimal_col(F.col("d"), 18, 2).alias("h")).collect()]
    assert all(h == murmur3_decimal(int(d.scaleb(2))) for d, h in got)


def test_decimal_bucket_type_dispatch_and_limits():
    import pytest

    assert iceberg_bucket_col(F.col("x"), "decimal(18,2)", 8) is not None
    # p>18 routes through the Arrow-batched wide path instead of refusing
    assert iceberg_bucket_col(F.col("x"), "decimal(38,10)", 8) is not None
    with pytest.raises(ValueError, match="unsupported"):
        iceberg_bucket_col(F.col("x"), "double", 8)


def test_byte_path_spec_vectors():
    """Iceberg spec Appendix B: uuid hashes its 16-byte big-endian form,
    fixed/binary hash raw bytes."""
    import uuid

    from debezium_server_iceberg_spark.lakehouse.murmur3 import (
        murmur3_bytes, murmur3_uuid,
    )

    assert murmur3_bytes(b"\x00\x01\x02\x03") == -188683207
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert murmur3_uuid(u) == 1488055340
    assert murmur3_uuid(uuid.UUID(u)) == 1488055340


def test_binary_and_uuid_expressions_match_python(spark):
    import random
    import uuid

    from debezium_server_iceberg_spark.lakehouse.murmur3 import (
        mm3_binary_col, mm3_uuid_col, murmur3_bytes, murmur3_uuid,
    )

    rng = random.Random(13)
    bvals = [b"", b"\x00\x01\x02\x03", b"\xff" * 7] + [
        bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
        for _ in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in bvals], "b binary")
    got = [(bytes(r["b"]), r["h"]) for r in df.select(
        "b", mm3_binary_col(F.col("b")).alias("h")).collect()]
    assert all(h == murmur3_bytes(b) for b, h in got)

    uvals = ["f79c3e09-677c-4bbd-a479-3f349cb785e7"] + [
        str(uuid.UUID(int=rng.getrandbits(128))) for _ in range(50)
    ]
    df2 = spark.createDataFrame([(u,) for u in uvals], "u string")
    got2 = [(r["u"], r["h"]) for r in df2.select(
        "u", mm3_uuid_col(F.col("u")).alias("h")).collect()]
    assert all(h == murmur3_uuid(u) for u, h in got2)


def test_wide_decimal_expression_matches_python(spark):
    """p>18 decimals (128-bit unscaled): the Arrow-batched path equals
    the from-spec Python hash at every magnitude and sign."""
    import random
    from decimal import Decimal

    from debezium_server_iceberg_spark.lakehouse.murmur3 import (
        mm3_decimal_col, murmur3_decimal,
    )

    rng = random.Random(17)
    vals = [Decimal("0.00"), Decimal("14.20"), Decimal("-0.01"),
            Decimal("123456789012345678901234567890.12"),
            Decimal("-123456789012345678901234567890.12")] + [
        Decimal(rng.randint(-10**34, 10**34)) / 100 for _ in range(100)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "d decimal(36,2)")
    got = [(r["d"], r["h"]) for r in df.select(
        "d", mm3_decimal_col(F.col("d"), 36, 2).alias("h")).collect()]
    assert got and all(h == murmur3_decimal(int(d.scaleb(2))) for d, h in got)


def test_binary_bucket_partition_roundtrip(spark, tmp_path):
    """bucket(N, binary_col): write layout = spec hash of the raw bytes;
    engine pruned reads and the faithful export both resolve a byte-string
    probe to the right bucket."""
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        export_iceberg_table, plan_iceberg_scan, read_iceberg_table,
    )
    from debezium_server_iceberg_spark.lakehouse.murmur3 import murmur3_bytes
    from debezium_server_iceberg_spark.lakehouse.table import (
        _prune_files_by_filter,
    )

    cat = LakeCatalog(str(tmp_path / "wh"))
    rows = [(i.to_bytes(4, "big"), i) for i in range(40)]
    df = spark.createDataFrame(rows, "k binary, n long")
    t = cat.create_table(
        "ns", "bin_t", df.schema, identifier_fields=["n"],
        partition_spec="bucket(4, k)",
    )
    t.append(df)
    probe = (7).to_bytes(4, "big")
    meta, files = t.metadata(), t.current_files()
    kept = _prune_files_by_filter(meta, files, {"k": probe})
    assert 0 < len(kept) < len(files)
    got = t.to_df(spark, row_filter={"k": probe}).collect()
    assert len(got) == 1 and got[0]["n"] == 7

    dest = str(tmp_path / "pub")
    export_iceberg_table(t, dest)
    b = (murmur3_bytes(probe) & 0x7FFFFFFF) % 4
    plan = plan_iceberg_scan(dest, partition_filter={"k_bucket": b})
    assert plan["pruned_files"] > 0
    ext = read_iceberg_table(
        spark, dest, partition_filter={"k_bucket": b}
    ).filter(F.col("k") == F.lit(probe)).collect()
    assert [r["n"] for r in ext] == [7]
    assert read_iceberg_table(spark, dest).count() == 40


def test_decimal_bucket_partition_exports_faithfully(spark, tmp_path):
    """End-to-end: a table bucket-partitioned on a DECIMAL key (common
    CDC PK type: Oracle NUMBER) lays out by the spec hash and publishes
    per-file partition values an external pruner can use."""
    from decimal import Decimal

    from debezium_server_iceberg_spark.lakehouse import LakeCatalog
    from debezium_server_iceberg_spark.lakehouse.iceberg_export import (
        export_iceberg_table, plan_iceberg_scan, read_iceberg_table,
    )
    from debezium_server_iceberg_spark.lakehouse.murmur3 import murmur3_decimal

    cat = LakeCatalog(str(tmp_path / "wh"))
    rows = [(Decimal(i) + Decimal("0.25"), f"v{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "pk decimal(18,2), v string")
    t = cat.create_table(
        "ns", "dec_t", df.schema, identifier_fields=["pk"],
        partition_spec="bucket(4, pk)",
    )
    t.append(df)
    dest = str(tmp_path / "pub")
    export_iceberg_table(t, dest)
    # every row readable; a bucket point-filter prunes and still finds it
    probe = Decimal("7.25")
    b = iceberg_bucket_py(murmur3_decimal(int(probe.scaleb(2))), 4)
    plan = plan_iceberg_scan(dest, partition_filter={"pk_bucket": b})
    assert plan["pruned_files"] > 0
    got = read_iceberg_table(
        spark, dest, partition_filter={"pk_bucket": b}
    ).filter(F.col("pk") == F.lit(probe)).collect()
    assert [r["v"] for r in got] == ["v7"]
    assert read_iceberg_table(spark, dest).count() == 40


def test_ntz_bucket_hash_is_session_tz_independent(spark):
    """An ntz timestamp stores a wall clock: its bucket hash must be the
    wall clock's epoch micros under ANY session timezone (an ltz cast
    would silently route through the session zone and change the on-disk
    layout per writer)."""
    import datetime as dt

    from debezium_server_iceberg_spark.lakehouse.murmur3 import murmur3_long

    vals = [dt.datetime(2017, 11, 16, 22, 31, 8),
            dt.datetime(1969, 12, 31, 23, 59, 59, 123456),
            dt.datetime(2024, 3, 10, 2, 30)]  # nonexistent in NY: ntz is fine
    df = spark.createDataFrame([(v,) for v in vals], "t timestamp_ntz")
    exp = {
        v: iceberg_bucket_py(
            murmur3_long(
                (v - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
            ),
            16,
        )
        for v in vals
    }
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {r["t"]: r["b"] for r in df.select(
                "t", iceberg_bucket_col(F.col("t"), "timestamp_ntz", 16)
                .alias("b")).collect()}
            assert got == exp, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
