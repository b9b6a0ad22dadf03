"""Partition transforms: identity / year / month / day / hour / bucket / truncate.

Spark-expression re-expression of the reference's partition-spec parser
(IcebergUtil.java:214-305; docs/iceberg.md:148-182).  A spec string like
``"year(ts), bucket(16, id), region"`` parses into PartitionFields, each of
which can render itself as a Spark Column so the physical layout is produced
by a plain ``df.write.partitionBy(...)`` — the engine-native equivalent of
Iceberg's hidden partitioning.

Transform outputs are deterministic and engine-independent:
- year/month/day/hour: integer (year number) / "yyyy-MM" / "yyyy-MM-dd" /
  "yyyy-MM-dd-HH" strings — human-readable like Hive layouts, 1:1 with
  Iceberg's epoch-relative transform values (converted at export).
- bucket(n, col): Iceberg's spec bucket — ``(murmur3_x86_32(canonical
  bytes) & Int.MAX) % n`` (lakehouse/murmur3.py), so the physical file
  grouping IS the Iceberg bucket value and metadata export keeps
  external partition pruning faithful.  Supported source types are the
  spec's full bucket surface: int/long/date/timestamp/string/binary and
  decimal at ANY precision — decimals hash their unscaled value's
  minimal big-endian two's-complement bytes (p>18 via an Arrow-batched
  UDF, everything else stays a JVM column expression).
- truncate(w, col): substring for strings, floor-div*w for numerics
  (Iceberg truncate semantics).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

_FN_RE = re.compile(r"^\s*(\w+)\s*\(\s*([^)]+)\s*\)\s*$")

TRANSFORMS = ("identity", "year", "month", "day", "hour", "bucket", "truncate")


class PartitionSpecError(ValueError):
    pass


@dataclass(frozen=True)
class PartitionField:
    source: str           # source column name
    transform: str        # one of TRANSFORMS
    param: int | None = None   # bucket count / truncate width

    @property
    def name(self) -> str:
        """Physical partition column name."""
        if self.transform == "identity":
            return f"_p_{self.source}"
        if self.param is not None:
            return f"_p_{self.transform}{self.param}_{self.source}"
        return f"_p_{self.transform}_{self.source}"

    def column(self, source_type: str | None = None) -> Column:
        """Spark expression computing the partition value.

        ``source_type`` is the Spark ``simpleString()`` of the source column —
        needed only by ``truncate`` (string prefix vs numeric floor-div).
        """
        c = F.col(self.source)
        t = self.transform
        if t == "identity":
            return c
        if t == "year":
            return F.year(c)
        if t == "month":
            return F.date_format(c, "yyyy-MM")
        if t == "day":
            return F.date_format(c, "yyyy-MM-dd")
        if t == "hour":
            return F.date_format(c, "yyyy-MM-dd-HH")
        if t == "bucket":
            from .murmur3 import iceberg_bucket_col

            try:
                return iceberg_bucket_col(c, source_type, self.param)
            except ValueError as e:
                raise PartitionSpecError(str(e)) from None
        if t == "truncate":
            if source_type == "string":
                return F.substring(c, 1, self.param)
            return (F.floor(c / F.lit(self.param)) * F.lit(self.param)).cast("long")
        raise PartitionSpecError(f"unknown transform {t!r}")

    def to_dict(self) -> dict:
        return {"source": self.source, "transform": self.transform, "param": self.param}

    @staticmethod
    def from_dict(d: dict) -> "PartitionField":
        return PartitionField(d["source"], d["transform"], d.get("param"))


def parse_partition_spec(
    spec: str,
    schema_fields: set[str] | None = None,
    strict: bool = True,
) -> list[PartitionField]:
    """Parse ``"year(ts), bucket(16, id), region"``.

    ``strict=False`` skips fields absent from ``schema_fields`` instead of
    raising — the reference's lenient mode (IcebergUtil.java:239-261).
    """
    fields: list[PartitionField] = []
    if not spec or not spec.strip():
        return fields
    # split on top-level commas only (commas inside transform parens stay)
    parts: list[str] = []
    depth = 0
    cur = ""
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    for part in parts:
        part = part.strip()
        if not part:
            continue
        m = _FN_RE.match(part)
        if m and m.group(1).lower() in TRANSFORMS:
            fn = m.group(1).lower()
            args = [a.strip() for a in m.group(2).split(",")]
            if fn in ("bucket", "truncate"):
                if len(args) != 2:
                    raise PartitionSpecError(f"{fn} needs (N, col): {part!r}")
                # accept both bucket(16, id) and bucket(id, 16)
                if args[0].isdigit():
                    param, col = int(args[0]), args[1]
                elif args[1].isdigit():
                    col, param = args[0], int(args[1])
                else:
                    raise PartitionSpecError(f"{fn} needs a numeric arg: {part!r}")
                pf = PartitionField(col, fn, param)
            else:
                if len(args) != 1:
                    raise PartitionSpecError(f"{fn} takes one column: {part!r}")
                pf = PartitionField(args[0], fn)
        else:
            if m:  # function-looking but unknown
                raise PartitionSpecError(f"unknown transform in {part!r}")
            pf = PartitionField(part, "identity")
        if schema_fields is not None and pf.source not in schema_fields:
            if strict:
                raise PartitionSpecError(
                    f"partition source column {pf.source!r} not in schema"
                )
            continue  # lenient: skip
        fields.append(pf)
    return fields
