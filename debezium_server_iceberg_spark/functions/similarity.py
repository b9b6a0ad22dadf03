"""Similarity search over embedding columns.

- cosine_topk: brute-force exact top-k (baseline; the oracle-checkable path).
  Dot products run JVM-side via ``zip_with`` + ``aggregate`` over double
  arrays — sequential per-array accumulation, so the result is IEEE-stable
  and reproducible by an SQL oracle summing in list order.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH buckets shrink
  the candidate set from N to ~N/2^bits per query before the exact rerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids.

    The query side is tiny -> broadcast; candidates stream through one
    narrow projection (no shuffle until the per-query top-k window, which
    is partitioned by query id)."""
    base = df.select(F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cvec"))
    queries = base.filter(F.col("cid").isin(query_ids)).select(
        F.col("cid").alias("qid"), F.col("cvec").alias("qvec")
    )
    pairs = base.join(F.broadcast(queries), F.col("cid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "cid",
        (_dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).alias(
            "cos"
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("rank"),
            F.col("cid").alias("neighbor_id"),
            F.round("cos", 3).alias("cosine"),
        )
    )


def lsh_bucketed_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets, exact rerank
    inside the query's bucket. Deterministic planes from a seeded xorshift-free
    recurrence on (seed, plane, dim) via md5 — no RNG state.

    Scale path: one narrow map to compute signatures, then an equi-join on
    the signature (shuffle keyed by bucket), then the same windowed top-k.
    """
    dim_df = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = dim_df["d"]

    def plane_component(p: int, i: int) -> float:
        # deterministic pseudo-random in [-1, 1) from md5 — pure python,
        # computed once on the driver and baked into the plan as literals
        import hashlib

        h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
        return (int(h[:8], 16) / 0x7FFFFFFF) - 1.0

    vec = _as_double(F.col(vec_col))
    sig_bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(plane_component(p, i)) for i in range(dim)])
        sig_bits.append(F.when(_dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    sig = F.concat(*sig_bits)

    base = df.select(
        F.col(id_col).alias("cid"), vec.alias("cvec"), sig.alias("bucket")
    )
    queries = base.filter(F.col("cid").isin(query_ids)).select(
        F.col("cid").alias("qid"), F.col("cvec").alias("qvec"), "bucket"
    )
    pairs = base.join(F.broadcast(queries), "bucket").filter(F.col("cid") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "cid",
        (_dot(F.col("qvec"), F.col("cvec")) / (_norm(F.col("qvec")) * _norm(F.col("cvec")))).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            F.col("cid").alias("neighbor_id"),
            F.round("cos", 3).alias("cosine"),
        )
    )
