"""Destination -> table-name mapping (operator P7).

Re-expression of DefaultIcebergTableMapper.java:17-35 (regexp replace,
prefix, case folding, ``.`` -> ``_``); pluggable exactly like the reference's
``IcebergTableMapper`` CDI bean (mapper/IcebergTableMapper.java:1-7) — pass
any callable with the same signature.
"""

from __future__ import annotations

import re


def map_destination(
    destination: str,
    table_prefix: str = "",
    destination_regexp: str = "",
    destination_regexp_replace: str = "",
    uppercase: bool = False,
    lowercase: bool = False,
) -> str:
    name = destination
    if destination_regexp:
        name = re.sub(destination_regexp, destination_regexp_replace, name)
    name = f"{table_prefix}{name}".replace(".", "_").replace("-", "_")
    if uppercase:
        return name.upper()
    if lowercase:
        return name.lower()
    return name
