"""In-batch deduplication by primary key (operator A1/A2).

The reference dedups each upsert batch with a hash-map merge keyed on the
event key, keeping the max by (source-ts, op-priority i=1 < r=2 < u=3 < d=4)
(IcebergTableOperator.java:58-125, priority map :49-51).  Spark-first
re-expression: a window ``row_number`` per key ordered descending by the
dedup column then op priority then arrival order — Catalyst executes it as a
hash-partitioned sort within key partitions (no driver state, scales with
keys, skew handled by AQE).

When no dedup column is configured the reference's comparator makes the last
event in batch order win (IcebergTableOperator.java:108-112); here an
explicit arrival-order column provides the same total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tableoperator/IcebergTableOperator.java:49-51 (c and i share rank 1)
OP_PRIORITY = {"c": 1, "i": 1, "r": 2, "u": 3, "d": 4}

ARRIVAL_COL = "__arrival_order"


def op_priority_col(op_col: str = "__op") -> Column:
    m = F.create_map(*[F.lit(x) for kv in OP_PRIORITY.items() for x in kv])
    return F.coalesce(m[F.col(op_col)], F.lit(1))


def with_arrival_order(df: DataFrame) -> DataFrame:
    """Tag batch-arrival order. ``monotonically_increasing_id`` is
    monotone within each input partition and partition ids are ordered by
    input order, matching the reference's list order for single-source
    batches."""
    if ARRIVAL_COL in df.columns:
        return df
    return df.withColumn(ARRIVAL_COL, F.monotonically_increasing_id())


def dedup_batch(
    df: DataFrame,
    key_cols: list[str],
    dedup_column: str | None = "__source_ts_ns",
    op_col: str = "__op",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One surviving event per key: max by (dedup_column, op-priority,
    arrival order). ``tiebreak_col`` replaces the implicit arrival-order
    column with an explicit deterministic one (useful when batch order is
    not meaningful, e.g. re-sorted inputs).

    Executed as ``groupBy(keys).agg(max_by(struct(*), order_struct))`` rather
    than a window ``row_number``: the aggregate combines map-side (partial
    aggregation), so the shuffle carries one row per key per input partition
    instead of every event, and a hot key degrades to a cheap combine tree
    instead of a single-task sort. The order struct compares
    lexicographically — exactly the reference comparator's precedence
    (IcebergTableOperator.java:108-125). Nulls in the dedup column lose to
    non-nulls (struct null ordering), matching desc_nulls_last."""
    if not key_cols:
        return df
    order_parts = []
    if dedup_column and dedup_column in df.columns:
        order_parts.append(F.col(dedup_column).alias("_o_ts"))
    if op_col in df.columns:
        order_parts.append(op_priority_col(op_col).alias("_o_pri"))
    drop_extra = []
    if tiebreak_col:
        order_parts.append(F.col(tiebreak_col).alias("_o_tie"))
    else:
        df = with_arrival_order(df)
        order_parts.append(F.col(ARRIVAL_COL).alias("_o_tie"))
        drop_extra.append(ARRIVAL_COL)
    payload_cols = [c for c in df.columns if c not in drop_extra]
    won = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload_cols]), F.struct(*order_parts)
            ).alias("_win")
        )
        .select("_win.*")
    )
    return won


def assert_no_null_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Reference errors on null keys in upsert mode
    (IcebergTableOperator.java:73-78 NullPointerException guard). Uses
    ``raise_error`` inside the plan so the check is distributed, not a
    driver-side count()."""
    if not key_cols:
        return df
    out = df
    for k in key_cols:
        # the guard lives inside the key expression itself so column pruning
        # can't eliminate it
        out = out.withColumn(
            k,
            F.when(
                F.col(k).isNull(),
                F.raise_error(F.lit(f"null identifier field {k!r} in upsert batch")).cast(
                    dict(df.dtypes)[k]
                ),
            ).otherwise(F.col(k)),
        )
    return out
