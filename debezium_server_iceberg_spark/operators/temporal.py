"""Temporal joins Spark lacks natively: as-of join and range (interval)
join, composed from shuffle-friendly primitives (SURVEY.md §2.5 — the
reference has no joins at all; these are the §7-phase-6 custom operators a
training-data/event pipeline needs).

- asof_join: for each left row, the latest right row with
  right_ts <= left_ts per key. Implemented as union + one per-key
  event-time sort (a single window pass), NOT a non-equi join: the plan is
  one shuffle by key + sort, which AQE handles like any other window — no
  broadcast-range trickery, no cross product, skew bounded by key.
- range_join: equi-key + interval-overlap join via interval bucketing:
  each interval replicates to the fixed-width buckets it spans, the join
  runs as an equi-join on (key, bucket), then the exact overlap predicate
  filters. Bucket width trades replication against candidate precision —
  at 100 TB pick it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the closest right row per key:
    ``backward`` = latest right with right_ts <= left_ts (trades/quotes
    semantics), ``forward`` = earliest right with right_ts >= left_ts.

    Plan shape: tag sides, union, one window over (key, ts) carrying the
    last-seen right payload forward (or first-seen backward). Scales as a
    single per-key sort regardless of how many right rows precede each left
    row — the degenerate O(n·m) of a conditional join never materializes."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns if c not in on and c != left_ts]
    rcols = [c for c in right.columns if c not in on]
    payload = F.struct(*[F.col(c) for c in rcols])

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(
            right.select(payload.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("_l"))
            .schema["_l"]
            .dataType
        ).alias("_l"),
        payload.alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    if direction == "backward":
        # right rows sort before left rows at equal ts (<= semantics)
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last(F.col("_r"), ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").desc(), F.col("_is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last(F.col("_r"), ignorenulls=True).over(w)
    out = (
        unioned.withColumn("_match", matched)
        .filter(F.col("_is_left") == 1)
        .select(
            *on,
            F.col("_ts").alias(left_ts),
            *[F.col(f"_l.{c}").alias(c) for c in lcols],
            *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in rcols],
        )
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int = 3600,
) -> DataFrame:
    """Interval-overlap join: rows pair when they share the equi-keys AND
    [left_start, left_end] overlaps [right_start, right_end]
    (numeric or epoch-seconds columns).

    Each side replicates to ceil(len/width)+1 bucket rows; the join is an
    equi-join on (keys, bucket) followed by the exact overlap predicate and
    a dedup (an interval pair can share several buckets). Never a cross
    join; shuffle is keyed by (keys, bucket)."""
    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        b0 = F.floor(F.col(start) / bucket_width).cast("long")
        b1 = F.floor(F.col(end) / bucket_width).cast("long")
        return df.withColumn("_bucket", F.explode(F.sequence(b0, b1)))

    lb = bucketed(left, left_start, left_end)
    rb = bucketed(right, right_start, right_end)
    joined = lb.join(rb, on=on + ["_bucket"])
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    out_cols = on + [c for c in left.columns if c not in on] + [
        c for c in right.columns if c not in on
    ]
    return joined.filter(overlap).drop("_bucket").dropDuplicates(out_cols)
