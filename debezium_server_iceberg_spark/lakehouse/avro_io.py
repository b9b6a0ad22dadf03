"""Dependency-free Apache Avro object-container codec (Avro 1.11 spec).

Iceberg manifests and manifest lists are Avro files; this environment
ships no avro library, so the writer/reader needed for real Iceberg
metadata (``iceberg_export.py``) is implemented here directly from the
published binary-encoding spec:

- int/long: zigzag + LEB128 varint
- float/double: IEEE-754 little-endian
- bytes/string: long length + raw bytes / utf-8
- record: fields in declaration order
- array/map: count-prefixed blocks terminated by a 0 count
- union: long branch index + value
- container: ``Obj\\x01`` magic, file-metadata map (avro.schema JSON +
  avro.codec), 16-byte sync marker, blocks of (count, byte-size, payload,
  sync)

Supported schema subset: everything Iceberg's manifest/manifest-list
schemas use (primitives, records, optional-via-union, arrays, maps).
The writer and reader are independent functions so round-trip tests are
not self-proving at the byte level: the reader decodes from raw bytes by
spec, never from writer internals.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any

MAGIC = b"Obj\x01"


# ------------------------------------------------------------- primitives


def _write_long(buf: bytearray, n: int) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag (Python's arithmetic shift handles sign)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _write_bytes(buf: bytearray, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.extend(b)


def _read_bytes(data: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(data, pos)
    return data[pos : pos + n], pos + n


# ------------------------------------------------------------ schema walk


def _is_optional(schema) -> bool:
    return isinstance(schema, list)


def encode(buf: bytearray, schema, value) -> None:
    """Binary-encode ``value`` per ``schema`` (JSON-decoded Avro schema)."""
    if _is_optional(schema):  # union — branch index then value
        if value is None:
            null_idx = schema.index("null")
            _write_long(buf, null_idx)
            return
        branch = next(
            (i, s) for i, s in enumerate(schema) if s != "null"
        )
        _write_long(buf, branch[0])
        encode(buf, branch[1], value)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(buf, int(value))
    elif t == "float":
        buf.extend(struct.pack("<f", float(value)))
    elif t == "double":
        buf.extend(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            encode(buf, f["type"], value.get(f["name"]))
    elif t == "array":
        items = value or []
        if items:
            _write_long(buf, len(items))
            for it in items:
                encode(buf, schema["items"], it)
        _write_long(buf, 0)
    elif t == "map":
        entries = value or {}
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, k.encode("utf-8"))
                encode(buf, schema["values"], v)
        _write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type: {t!r}")


def decode(data: bytes, pos: int, schema) -> tuple[Any, int]:
    """Decode one value per ``schema`` from ``data`` at ``pos``."""
    if _is_optional(schema):
        idx, pos = _read_long(data, pos)
        branch = schema[idx]
        if branch == "null":
            return None, pos
        return decode(data, pos, branch)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None, pos
    if t == "boolean":
        return data[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _read_long(data, pos)
    if t == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if t == "bytes":
        return _read_bytes(data, pos)
    if t == "string":
        b, pos = _read_bytes(data, pos)
        return b.decode("utf-8"), pos
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = decode(data, pos, f["type"])
        return out, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _size, pos = _read_long(data, pos)
            for _ in range(n):
                it, pos = decode(data, pos, schema["items"])
                items.append(it)
        return items, pos
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(data, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _size, pos = _read_long(data, pos)
            for _ in range(n):
                kb, pos = _read_bytes(data, pos)
                out[kb.decode("utf-8")], pos = decode(data, pos, schema["values"])
        return out, pos
    raise ValueError(f"unsupported avro type: {t!r}")


# -------------------------------------------------------------- container


def write_container(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, str] | None = None,
) -> int:
    """Write an Avro object-container file; returns its byte length."""
    sync = os.urandom(16)
    buf = bytearray()
    buf.extend(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    meta.update(metadata or {})
    _write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode("utf-8"))
        _write_bytes(buf, v.encode("utf-8"))
    _write_long(buf, 0)
    buf.extend(sync)
    if records:
        block = bytearray()
        for r in records:
            encode(block, schema, r)
        _write_long(buf, len(records))
        _write_long(buf, len(block))
        buf.extend(block)
        buf.extend(sync)
    with io.open(path, "wb") as fh:
        fh.write(bytes(buf))
    return len(buf)


def read_container(path: str) -> tuple[dict, list[dict], dict[str, str]]:
    """Read an Avro object-container file written by ANY avro writer
    (null/deflate codecs): returns (schema, records, file-metadata)."""
    with io.open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC:
        raise ValueError(f"{path}: not an avro container")
    pos = 4
    meta: dict[str, str] = {}
    while True:
        n, pos = _read_long(data, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _size, pos = _read_long(data, pos)
        for _ in range(n):
            kb, pos = _read_bytes(data, pos)
            vb, pos = _read_bytes(data, pos)
            meta[kb.decode("utf-8")] = vb.decode("utf-8", errors="replace")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    sync = data[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        block = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            import zlib

            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bpos = 0
        for _ in range(count):
            rec, bpos = decode(block, bpos, schema)
            records.append(rec)
        if data[pos : pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        pos += 16
    return schema, records, meta
