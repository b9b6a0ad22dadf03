"""Shuffle-partition sizing derives from input bytes, not a constant
(VERDICT r8 item 2).

AQE can coalesce an over-partitioned shuffle at runtime but cannot widen an
under-partitioned one, so the initial count must scale with data volume:
the same session code has to be right at a 100 MB test slice AND a 100 TB
production scan.
"""

import os

from debezium_server_iceberg_spark.session import (
    _BYTES_PER_SHUFFLE_PARTITION,
    _MAX_SHUFFLE_PARTITIONS,
    derive_shuffle_partitions,
    estimate_dir_bytes,
)

GB = 1 << 30
TB = 1 << 40


def test_small_inputs_floor_at_core_count():
    # a test slice must still use every core
    assert derive_shuffle_partitions(0, 32) == 32
    assert derive_shuffle_partitions(100 << 20, 32) == 32
    # unknown size degrades to the static default, never below cpus
    assert derive_shuffle_partitions(-1, 8) == 8


def test_partitions_scale_with_bytes():
    # ~128 MB per partition once data outgrows the core floor
    assert derive_shuffle_partitions(64 * GB, 32) == 512
    assert derive_shuffle_partitions(1 * TB, 32) == 8192
    # ceil, not floor: 129 MB needs 2 partitions at 64-cpu floor override
    assert derive_shuffle_partitions(
        _BYTES_PER_SHUFFLE_PARTITION + 1, 1
    ) == 2


def test_100tb_hits_cap_not_millions():
    got = derive_shuffle_partitions(100 * TB, 8000)
    assert got == _MAX_SHUFFLE_PARTITIONS
    # and the cap dominates the raw need (100 TB / 128 MB = 819,200)
    assert got < (100 * TB) // _BYTES_PER_SHUFFLE_PARTITION


def test_estimate_dir_bytes(tmp_path):
    (tmp_path / "a.bin").write_bytes(b"x" * 1000)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b.bin").write_bytes(b"y" * 500)
    assert estimate_dir_bytes(str(tmp_path)) == 1500
    assert estimate_dir_bytes(str(tmp_path / "missing")) == 0


def test_get_spark_derives_from_sf_dir(tmp_path, monkeypatch):
    """get_spark wires the derivation: with SPARK_GRAFT_SF_DIR set, the
    session's shuffle width comes from that dataset's size (floored at
    cpus here, since the fixture dir is tiny).  Conf-level check only —
    building a second SparkSession per size would be a JVM per test."""
    from debezium_server_iceberg_spark import session as S

    (tmp_path / "t.parquet").write_bytes(b"z" * 2048)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", str(tmp_path))
    seen = {}

    real = S.derive_shuffle_partitions

    def spy(input_bytes, cpus, **kw):
        seen["bytes"] = input_bytes
        seen["result"] = real(input_bytes, cpus, **kw)
        return seen["result"]

    monkeypatch.setattr(S, "derive_shuffle_partitions", spy)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    s = S.get_spark(app_name="sizing-probe")
    try:
        assert seen["bytes"] == 2048
        # getOrCreate may reuse the session-scoped test session, so assert
        # on the derivation result rather than the live conf
        assert seen["result"] == cpus
    finally:
        pass  # session is shared; never stop it here
