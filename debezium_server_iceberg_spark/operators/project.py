"""Schema-conforming projection (operator P4).

The reference builds, per event, a record containing exactly the table's
columns — missing event fields become null, extra event fields are dropped
(JsonEventConverter.java:224-238, StructEventConverter.java:241-270).  Here:
one ``select`` with null-literal fill and casts, applied to the whole batch
(columnar, codegen'd) instead of per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def conform_to_schema(
    df: DataFrame,
    schema: T.StructType,
    keep_extra: list[str] | None = None,
) -> DataFrame:
    """Project df to exactly ``schema``'s columns (+ ``keep_extra`` passthrough
    columns such as ``__op`` needed downstream)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            src = have[f.name]
            c = F.col(f.name)
            if src.dataType != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    for extra in keep_extra or []:
        if extra in have and extra not in {f.name for f in schema.fields}:
            cols.append(F.col(extra))
    return df.select(*cols)
