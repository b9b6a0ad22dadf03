"""Iceberg's bucket-transform hash: Murmur3 x86 32-bit, seed 0.

The Iceberg spec (Appendix B, "32-bit Hash Requirements") pins bucket
partitioning to ``murmur3_x86_32`` of a canonical byte form per type —
int/long/date/timestamp hash their 8-byte little-endian long value,
strings hash their UTF-8 bytes — with published test vectors
(34 -> 2017239379, "iceberg" -> 1210000089, ...).  The reference sink
inherits this from the Iceberg library (partition specs built in
IcebergUtil.java:214-297); this engine re-expresses it twice:

- :func:`murmur3_32` — a pure-Python from-spec implementation, the test
  oracle and the driver-side value (e.g. export-time checks);
- :func:`mm3_long_col` / :func:`mm3_utf8_col` — the SAME function as a
  Spark *Column expression*, so bucket assignment runs JVM-side inside
  the write projection, scaling like any other partition transform.

Spark's built-in ``hash()`` is also Murmur3 x86 32 but with seed 42 and
no way to override it, so the expression builds the hash from masked
64-bit integer arithmetic (multiplications split 16x32 so no ANSI
overflow is possible).  Fixed-width inputs (longs: exactly two 4-byte
blocks) unroll to a closed-form codegen-friendly expression; variable
width inputs (strings) fold the 4-byte blocks with ``aggregate`` over a
block-index sequence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M5 = 0xE6546B64
_F1 = 0x85EBCA6B
_F2 = 0xC2B2AE35


# ----------------------------------------------------------- pure Python


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit of ``data`` — signed 32-bit result, from spec."""
    h = seed & _M32
    n = len(data)
    nf = n // 4
    for i in range(nf):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + _M5) & _M32
    if n % 4:
        k = int.from_bytes(data[nf * 4 :], "little")
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * _F1) & _M32
    h ^= h >> 13
    h = (h * _F2) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_long(v: int) -> int:
    """Iceberg ``hashLong``: hash of the value's 8-byte little-endian
    two's-complement form (== hash of int values widened to long)."""
    return murmur3_32((int(v) & ((1 << 64) - 1)).to_bytes(8, "little"))


def murmur3_utf8(s: str) -> int:
    """Iceberg ``hashBytes`` of a string's UTF-8 encoding."""
    return murmur3_32(s.encode("utf-8"))


def murmur3_decimal(unscaled: int) -> int:
    """Iceberg ``hashBytes`` of a decimal's unscaled value in minimal
    big-endian two's-complement form (= Java BigInteger.toByteArray).
    Python's ``bit_length`` is magnitude-based, so the sign-aware length
    uses ``~v`` for negatives (-128 → one byte 0x80, not FF80)."""
    mag = unscaled if unscaled >= 0 else ~unscaled
    n = mag.bit_length() // 8 + 1
    return murmur3_32(unscaled.to_bytes(n, "big", signed=True))


def murmur3_bytes(b: "bytes | bytearray") -> int:
    """Iceberg ``hashBytes`` of raw bytes (fixed / binary source types)."""
    return murmur3_32(bytes(b))


def murmur3_uuid(u) -> int:
    """Iceberg uuid hash: ``hashBytes`` of the UUID's 16-byte big-endian
    form (accepts a uuid.UUID or its canonical string)."""
    import uuid as _uuid

    if not isinstance(u, _uuid.UUID):
        u = _uuid.UUID(str(u))
    return murmur3_32(u.bytes)


def iceberg_bucket_py(hash_value: int, n: int) -> int:
    """Spec bucket assignment: ``(hash & Integer.MAX_VALUE) % N``."""
    return (hash_value & 0x7FFFFFFF) % n


# ------------------------------------------------------ Spark expressions
#
# All intermediate values are non-negative longs masked to 32 bits, so the
# arithmetic is identical with or without ANSI mode.  Multiplication by a
# 32-bit constant is split 16x32 (max intermediate 2^48) to stay far from
# signed-64 overflow.


def _mul32(a: Column, const: int) -> Column:
    lo = a.bitwiseAND(F.lit(0xFFFF)) * F.lit(const)
    hi = (F.shiftright(a, 16) * F.lit(const)).bitwiseAND(F.lit(0xFFFF))
    return (lo + F.shiftleft(hi, 16)).bitwiseAND(F.lit(_M32))


def _rotl32(x: Column, r: int) -> Column:
    return (
        F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r))
    ).bitwiseAND(F.lit(_M32))


def _mix_k1(k: Column) -> Column:
    return _mul32(_rotl32(_mul32(k, _C1), 15), _C2)


def _mix_h1(h: Column, k: Column) -> Column:
    h = h.bitwiseXOR(k)
    h = _rotl32(h, 13)
    return (_mul32(h, 5) + F.lit(_M5)).bitwiseAND(F.lit(_M32))


def _fmix(h: Column, length: Column) -> Column:
    h = h.bitwiseXOR(length)
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = _mul32(h, _F1)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = _mul32(h, _F2)
    return h.bitwiseXOR(F.shiftright(h, 16))


def _to_signed32(h: Column) -> Column:
    return F.when(h >= F.lit(1 << 31), h - F.lit(1 << 32)).otherwise(h)


def _mm3_long_np(vals):
    """Vectorized spec murmur3 of int64 values' 8-byte LE form: two u32
    blocks in wrapping uint32 arithmetic — bit-identical to
    :func:`murmur3_long` (pinned by tests against the spec vectors)."""
    import numpy as np

    u32 = np.uint32
    with np.errstate(over="ignore"):
        v = np.asarray(vals, dtype=np.int64).view(np.uint64)
        h = np.zeros(v.shape, dtype=u32)
        for blk in (
            (v & np.uint64(_M32)).astype(u32),
            (v >> np.uint64(32)).astype(u32),
        ):
            k = blk * u32(_C1)
            k = (k << u32(15)) | (k >> u32(17))
            k = k * u32(_C2)
            h ^= k
            h = (h << u32(13)) | (h >> u32(19))
            h = h * u32(5) + u32(_M5)
        h ^= u32(8)
        h ^= h >> u32(16)
        h *= u32(_F1)
        h ^= h >> u32(13)
        h *= u32(_F2)
        h ^= h >> u32(16)
    return h.astype(np.int32).astype(np.int64)


_MM3_LONG_UDF = None


def mm3_long_col(col: Column) -> Column:
    """Murmur3 x86 32 (seed 0) of a long's 8-byte LE form, as a
    vectorized Arrow pandas UDF over :func:`_mm3_long_np`.

    Why not a JVM expression: the fully-unrolled closed form duplicates
    subtrees multiplicatively (a ~2500-node tree whose whole-stage
    codegen took ~30 s to COMPILE per query), and the let-bound
    ``aggregate`` fold is interpreted — measured ~18 µs/row, 2.7 s of a
    150k-row bucket-partitioned append (the dominant cost of the write).
    The numpy path is ~50 ns/row of wrapping uint32 arithmetic; only one
    long column crosses the Arrow boundary each way.  Null in, null out,
    like the expression it replaces.  Returns the signed 32-bit hash as
    a long column."""
    global _MM3_LONG_UDF
    if _MM3_LONG_UDF is None:

        @F.pandas_udf("long")
        def _udf(s: pd.Series) -> pd.Series:
            # Nulls never reach this UDF (the caller coalesces them away
            # and restores null-out with an outer when/otherwise): an
            # Arrow batch containing ANY null arrives as float64, and
            # float64 silently rounds |v| > 2^53 before hashing — a wrong
            # hash becomes a wrong partition stamp that file pruning then
            # TRUSTS (silently missed matches).  Fail loudly if a non-
            # integer dtype ever shows up rather than mis-hash.
            if s.dtype != "int64":
                if s.isna().any():
                    raise ValueError(
                        "mm3_long_col UDF received nulls (dtype "
                        f"{s.dtype}); the null-stripping wrapper was "
                        "bypassed — hashes of |v| > 2^53 would be wrong"
                    )
                s = s.astype("int64")
            return pd.Series(_mm3_long_np(s.to_numpy()), dtype="int64")

        _MM3_LONG_UDF = _udf
    longs = col.cast("long")
    # null in, null out — enforced OUTSIDE the UDF so its input series is
    # never nullable (stays int64 across the Arrow boundary; see above)
    return F.when(longs.isNull(), F.lit(None).cast("long")).otherwise(
        _MM3_LONG_UDF(F.coalesce(longs, F.lit(0)))
    )


def mm3_hex_col(hex_expr: Column) -> Column:
    """Murmur3 x86 32 (seed 0) of the BYTE STRING whose hex form is
    ``hex_expr`` (2 chars/byte, any case).

    Each 4-byte block is little-endian-reassembled with ``substr`` +
    ``conv`` and folded with ``aggregate`` (interpreted, not codegen —
    acceptable: bucket computation runs once per written row, not in
    scan hot paths).

    Expression-size discipline: naive composition duplicates subtrees
    multiplicatively (the raw form serialized to a 60 MB task binary and
    re-evaluated the block fold dozens of times per row).  Lambda
    variables are the only cheap let-binding Spark expressions have, so
    the hex string is bound by a one-element outer ``aggregate``, the
    running hash is the inner fold's accumulator, and fmix lives in the
    fold's *finish* lambda — every multiply-referenced value is a lambda
    var, keeping the tree small and each step evaluated once."""

    def _hash_of_hex(hx: Column) -> Column:
        n = (F.length(hx) / F.lit(2)).cast("long")
        nf = F.floor(n / F.lit(4)).cast("long")          # full 4-byte blocks
        nb = F.ceil(n / F.lit(4)).cast("long")           # blocks incl. tail

        def _le_int(*hex_pairs: Column) -> Column:
            return F.conv(F.concat(*hex_pairs), 16, 10).cast("long")

        def _block(i: Column) -> Column:                 # full block, LE
            s = i * F.lit(8) + F.lit(1)
            return _le_int(
                hx.substr(s + F.lit(6), F.lit(2)),
                hx.substr(s + F.lit(4), F.lit(2)),
                hx.substr(s + F.lit(2), F.lit(2)),
                hx.substr(s, F.lit(2)),
            )

        def _tail_k() -> Column:                         # 1-3 byte tail, LE
            t = n % F.lit(4)
            ts = nf * F.lit(8) + F.lit(1)
            b1 = hx.substr(ts, F.lit(2))
            b2 = hx.substr(ts + F.lit(2), F.lit(2))
            b3 = hx.substr(ts + F.lit(4), F.lit(2))
            return (
                F.when(t == 1, _le_int(b1))
                .when(t == 2, _le_int(b2, b1))
                .otherwise(_le_int(b3, b2, b1))
            )

        idx = F.when(
            nb > 0, F.sequence(F.lit(0).cast("long"), nb - F.lit(1))
        ).otherwise(F.array().cast("array<long>"))
        return F.aggregate(
            idx,
            F.lit(0).cast("long"),
            lambda h, i: F.when(
                i < nf, _mix_h1(h, _mix_k1(_block(i)))
            ).otherwise(h.bitwiseXOR(_mix_k1(_tail_k()))),
            lambda h: _to_signed32(_fmix(h, n)),
        )

    return F.aggregate(
        F.array(hex_expr),
        F.lit(0).cast("long"),
        lambda _acc, hx: _hash_of_hex(hx),
    )


def mm3_utf8_col(col: Column) -> Column:
    """Murmur3 x86 32 (seed 0) of a string's UTF-8 bytes."""
    return mm3_hex_col(F.hex(F.encode(col, "UTF-8")))


def mm3_binary_col(col: Column) -> Column:
    """Iceberg ``hashBytes`` of a binary column's raw bytes (fixed /
    binary source types) — ``hex()`` is JVM-side, so the whole hash stays
    a column expression."""
    return mm3_hex_col(F.hex(col))


def mm3_uuid_col(col: Column) -> Column:
    """Iceberg uuid hash as an expression: ``hashBytes`` of the 16-byte
    big-endian form.  Spark has no uuid type, so the source is the
    canonical 36-char string; stripping dashes leaves exactly the
    big-endian hex."""
    return mm3_hex_col(F.upper(F.regexp_replace(col.cast("string"), "-", "")))


def mm3_decimal_col(col: Column, precision: int, scale: int) -> Column:
    """Iceberg decimal hash: ``hashBytes`` of the unscaled value's
    minimal big-endian two's-complement form (Java
    ``BigInteger.toByteArray``).

    p ≤ 18 (unscaled fits a long): pure column expression — the minimal
    form is carved out of the full 16-hex-char two's complement with
    backtracking regexes (strip leading ``00`` pairs while the next
    nibble keeps the sign bit clear, leading ``FF`` pairs while it keeps
    it set).

    p > 18 (unscaled up to 128 bits): Spark's integer expression surface
    is 64-bit (``conv``/``hex``/``div`` all truncate), so the hash runs
    in an Arrow-batched pandas UDF over exact Python ints — the one
    non-codegen path in the bucket family, reserved for a type nobody
    hot-paths, and still exact at every precision."""
    if precision > 18:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _wide_dec_hash(s):
            from decimal import Decimal as _D

            return s.map(
                lambda v: None
                if v is None
                else murmur3_decimal(int(_D(v).scaleb(scale)))
            )

        return _wide_dec_hash(col)
    unscaled = (col * F.lit(10 ** scale)).cast("long")
    h16 = F.lpad(F.hex(unscaled), 16, "0")
    minimal = F.regexp_replace(
        F.regexp_replace(h16, "^(00)+(?=[0-7])", ""),
        "^(FF)+(?=[89A-F])",
        "",
    )
    return mm3_hex_col(minimal)


def iceberg_bucket_col(col: Column, source_type: str | None, n: int) -> Column:
    """Spec bucket transform as a Spark expression: hash the canonical
    byte form per source type, then ``(hash & Int.MAX) % n``.  Covers the
    spec's full bucket surface — int/long/date/timestamp/string/decimal
    (any precision)/fixed/binary; a uuid stored in Spark's type system is
    a string and hashes as one (``mm3_uuid_col`` exists for engines that
    carry true uuid bytes).  Raises on types the spec does not bucket
    (float/double/boolean) rather than silently diverging."""
    t = (source_type or "").lower()
    if t in ("integer", "int", "long", "bigint", "short", "smallint",
             "byte", "tinyint"):
        h = mm3_long_col(col)
    elif t == "date":
        h = mm3_long_col(F.datediff(col, F.lit("1970-01-01")))
    elif t == "timestamp":
        # ltz stores the instant; unix_micros is timezone-independent
        h = mm3_long_col(F.unix_micros(col))
    elif t == "timestamp_ntz":
        # ntz stores a wall clock; hash the wall clock's micros-since-
        # epoch WITHOUT an ltz cast (casting routes through the session
        # timezone, silently making the on-disk bucket layout depend on
        # whoever wrote it).  All components below are wall-clock reads,
        # exact under any session timezone; date_part SECOND is
        # decimal(8,6) seconds incl. the microsecond fraction, so *1e6
        # is an exact integer.
        wall_micros = (
            (
                F.datediff(col.cast("date"), F.lit("1970-01-01")).cast("long")
                * F.lit(1440)
                + F.hour(col) * F.lit(60)
                + F.minute(col)
            )
            * F.lit(60_000_000)
            + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast("long")
        )
        h = mm3_long_col(wall_micros)
    elif t == "string":
        h = mm3_utf8_col(col)
    elif t == "binary":
        h = mm3_binary_col(col)
    elif t.startswith("decimal"):
        try:
            p, s = (
                int(x) for x in t[t.index("(") + 1 : t.index(")")].split(",")
            )
        except ValueError:
            raise ValueError(f"malformed decimal type {t!r}") from None
        h = mm3_decimal_col(col, p, s)
    else:
        raise ValueError(
            f"iceberg bucket transform unsupported for source type {t!r}"
        )
    return F.pmod(h.bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n)).cast("int")
