"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting (enabled in session defaults) covers sort-merge
joins at runtime; explicit salting is for the cases AQE can't rescue —
hot-key aggregations whose single reducer partition melts, and shuffle joins
where one key dominates the build side. Both helpers preserve exact results.

At 100 TB: salt count should be ~(hot-key rows / target partition rows);
salting multiplies the small side by ``salt`` replicas, so keep it for
genuinely-small right sides (it composes with broadcast being impossible —
if the right side fits a broadcast, broadcast instead and skew is moot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, salt: int) -> DataFrame:
    """Deterministic per-row salt in [0, salt): rows sharing a hot key get
    spread across ``salt`` partitions. Derived from a monotonic row id, not
    rand(), so retries/recomputations assign stable salts."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )


def replicate_salts(df: DataFrame, salt: int) -> DataFrame:
    """Cross the (small) side with all salt values so every salted partition
    finds its match."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where ``large`` has skewed join keys: the hot key's rows
    spread over ``salt`` sub-partitions, each joined against a replica of the
    matching small-side rows. Result == large.join(small, on, how)."""
    left = with_salt(large, salt)
    right = replicate_salts(small, salt)
    return left.join(right, on=on + [SALT_COL], how=how).drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot grouping keys: partial per (key, salt),
    final per key. ``partial_aggs`` maps output name -> aggregate over the
    raw rows; ``final_aggs`` maps output name -> aggregate over the partial
    columns (e.g. partial ``count(*) as n`` + final ``sum(n) as n``).

    Catalyst's own partial aggregation already combines map-side; explicit
    salting additionally splits the *reduce* side of a hot key across
    ``salt`` tasks — use when one key holds a double-digit share of rows.
    """
    salted = with_salt(df, salt)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )
