"""Puffin / deletion-vector-v1 codec, pinned against the public specs and
cross-validated byte-for-byte with Spark's own org.roaringbitmap jar —
the exact library Iceberg's Java implementation serializes DVs with.
"""

import json
import struct
import zlib

import pytest

from debezium_server_iceberg_spark.lakehouse.puffin import (
    DV_MAGIC,
    MAGIC,
    decode_dv_blob,
    deserialize_positions,
    encode_dv_blob,
    read_dv_positions,
    read_puffin_footer,
    serialize_positions,
    write_puffin_dvs,
)

CASES = [
    [],
    [0],
    [0, 1, 5, 100_000, (1 << 33) + 7, (1 << 40)],
    list(range(5000)),                      # bitmap container (card > 4096)
    list(range(0, 200_000, 7)),             # multiple 16-bit containers
    [2**31, 2**32 - 1, 2**32, 2**63 - 1],   # bucket boundaries
]


def _jvm_portable(spark, values):
    jvm = spark._jvm
    r = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    for v in values:
        r.addLong(v)
    baos = jvm.java.io.ByteArrayOutputStream()
    r.serializePortable(jvm.java.io.DataOutputStream(baos))
    return bytes(baos.toByteArray())


@pytest.mark.parametrize("values", CASES)
def test_portable_bytes_match_roaringbitmap_jar(spark, values):
    assert serialize_positions(values) == _jvm_portable(spark, values)


@pytest.mark.parametrize("values", CASES)
def test_portable_roundtrip(values):
    assert deserialize_positions(serialize_positions(values)) == sorted(
        set(values)
    )


def test_deserialize_handles_run_containers(spark):
    """External writers may runOptimize() their bitmaps (cookie 12347 +
    run containers); the reader must parse those too."""
    jvm = spark._jvm
    r = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
    vals = list(range(1000, 9000)) + [100_000, (1 << 35) + 3]
    for v in vals:
        r.addLong(v)
    r.runOptimize()
    baos = jvm.java.io.ByteArrayOutputStream()
    r.serializePortable(jvm.java.io.DataOutputStream(baos))
    assert deserialize_positions(bytes(baos.toByteArray())) == sorted(vals)


def test_dv_blob_layout_matches_spec():
    """Iceberg v3 DV blob: len(vector+magic) 4 BE | D1 D3 39 64 | vector |
    CRC-32(magic+vector) 4 BE."""
    positions = [3, 7, 4096]
    blob = encode_dv_blob(positions)
    (body_len,) = struct.unpack_from(">I", blob, 0)
    assert blob[4:8] == DV_MAGIC == bytes([0xD1, 0xD3, 0x39, 0x64])
    vector = blob[8 : 4 + body_len]
    assert vector == serialize_positions(positions)
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    assert crc == (zlib.crc32(blob[4 : 4 + body_len]) & 0xFFFFFFFF)
    assert len(blob) == 4 + body_len + 4
    assert decode_dv_blob(blob) == positions


def test_dv_blob_rejects_corruption():
    blob = bytearray(encode_dv_blob([1, 2, 3]))
    blob[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|magic"):
        decode_dv_blob(bytes(blob))
    with pytest.raises(ValueError):
        serialize_positions([-1])


def test_puffin_file_layout_and_footer(tmp_path):
    """Puffin: Magic | blobs | Magic | payload | size(4 LE) | flags |
    Magic; blob directory carries referenced-data-file + cardinality and
    offsets address the blobs exactly."""
    p = str(tmp_path / "dv.puffin")
    descs = write_puffin_dvs(
        p, [("/data/a.parquet", [1, 5, 9]), ("/data/b.parquet", [0, 2])]
    )
    raw = open(p, "rb").read()
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    footer = read_puffin_footer(p)
    assert [b["type"] for b in footer["blobs"]] == ["deletion-vector-v1"] * 2
    for desc, bmeta in zip(descs, footer["blobs"]):
        assert bmeta["offset"] == desc["offset"]
        assert bmeta["length"] == desc["length"]
        assert bmeta["snapshot-id"] == -1 and bmeta["sequence-number"] == -1
        assert bmeta["properties"]["referenced-data-file"] == desc["referenced"]
        assert int(bmeta["properties"]["cardinality"]) == desc["cardinality"]
    assert read_dv_positions(p, descs[0]["offset"], descs[0]["length"]) == [1, 5, 9]
    assert read_dv_positions(p, descs[1]["offset"], descs[1]["length"]) == [0, 2]
    # first blob starts right after the 4-byte header magic
    assert descs[0]["offset"] == 4
    # footer payload is the JSON between the mid magic and the size word
    (size,) = struct.unpack_from("<I", raw, len(raw) - 12)
    payload = raw[len(raw) - 12 - size : len(raw) - 12]
    assert json.loads(payload) == footer
