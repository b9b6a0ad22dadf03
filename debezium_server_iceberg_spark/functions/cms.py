"""Count-min sketch frequency estimation (Cormode & Muthukrishnan 2005,
"An improved data stream summary: the count-min sketch and its
applications") — the fixed-memory token-frequency sketch for corpora
whose vocabulary does NOT fit an exact aggregate.

This completes the engine's sketch family: bloom filter = membership
(``functions/text.py:decontaminate_bloom``), KMV/theta = cardinality
and overlap (``functions/corpus.py:_sketch_overlap``), count-min =
frequency.  Reference parity: sketches are outside
memiiso/debezium-server-iceberg's CDC scope; §2.8 training-data
surface.

Design, all exact-integer so a SQL oracle replays it bit-for-bit:

- ``d`` hash rows x ``w`` buckets; row ``j``'s hash of token ``t`` is
  the repo-wide md5-prefix integer of ``concat(j, ':', t)`` mod ``w``
  (seeded family — same contract as DSIR/LSH/the link graph).
- **Build is one partial-agg groupBy to a d*w-row relation**: every
  token occurrence contributes d (row, bucket) increments emitted
  in-array in the scan stage; counters combine map-side.  The sketch
  is ~KBs at any corpus size — THAT is the point: memory is fixed by
  (d, w), not by vocabulary.
- **Estimation broadcasts the sketch**: est(t) = min over rows of the
  counter at (j, h_j(t)), a broadcast join + min aggregate per
  candidate.  CMS guarantees est >= true count (one-sided error;
  overestimate probability bounded by (true_mass / w)^d per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col


def _bucket(col, seed: int, w: int):
    """md5-prefix integer of "seed:token" mod w — the engine's portable
    hash-family contract."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(seed), col)), 1, 8), 16, 10
        ).cast("long")
        % w
    )


def cms_build(
    docs: DataFrame,
    w: int = 1024,
    d: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Build the (row, bucket, counter) sketch relation — d*w rows max,
    one corpus pass, map-side combinable."""
    toks = docs.select(F.explode(tokens_col(F.col(text_col))).alias("_t"))
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("row"), _bucket(F.col("_t"), j, w).alias("bucket"))
            for j in range(d)
        ]
    )
    return (
        toks.select(F.explode(cells).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    w: int = 1024,
    d: int = 3,
    token_col: str = "token",
) -> DataFrame:
    """Point-query the sketch for each candidate token: est = min over
    the d rows of the addressed counter — INCLUDING implicit-zero
    cells (a cell no token hashed into is absent from the sparse
    sketch relation but counts as 0 under CMS semantics, so an
    out-of-corpus candidate estimates 0 instead of vanishing).  The
    sketch broadcasts (d*w rows); candidates keep their other
    columns."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _bucket(F.col(token_col), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    addressed = candidates.withColumn("_c", F.explode(cells)).select(
        *candidates.columns,
        F.col("_c.row").alias("row"),
        F.col("_c.bucket").alias("bucket"),
    )
    return (
        addressed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*candidates.columns)
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0))).alias(
                "cms_estimate"
            )
        )
    )


def cms_heavy_hitters(
    docs: DataFrame,
    top_n: int = 20,
    w: int = 1024,
    d: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The heavy-hitters report: exact top-``top_n`` tokens by count
    (two-phase, no single-partition sort of the vocabulary) with each
    token's CMS estimate alongside — the sketch-quality monitor
    (est >= exact always; est == exact when no heavier token collides
    in all d rows).  Returns (rank, token, exact_count, cms_estimate).

    At 100 TB the exact side is the part you may not be able to afford
    (vocabulary-sized aggregate); production then keeps ONLY the
    sketch + a candidate stream, and this gate's exact column is the
    verification harness run on a sample."""
    sketch = cms_build(docs, w, d, text_col)
    counts = (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    pre = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("exact_count").desc(), F.col("token").asc()
    )
    glob = Window.orderBy(F.col("exact_count").desc(), F.col("token").asc())
    top = (
        counts.withColumn("_pr", F.row_number().over(pre))
        .filter(F.col("_pr") <= top_n)
        .drop("_pr")
        .withColumn("rank", F.row_number().over(glob))
        .filter(F.col("rank") <= top_n)
    )
    return cms_estimate(sketch, top, w, d).select(
        "rank", "token", "exact_count", "cms_estimate"
    )
