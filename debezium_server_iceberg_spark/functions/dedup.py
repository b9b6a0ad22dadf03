"""Deduplication operator family for training-data pipelines.

- exact_dedup: content-hash groupBy (one shuffle on the hash)
- minhash_signatures / minhash_near_dup_pairs: MinHash + LSH banding
  (shingle -> md5 minhash -> band -> bucket join) — candidate generation is
  an equi-join on band values, never an O(n^2) cross join, so it scales to
  100 TB (shuffle keyed on band hashes; hot bands are bounded by band width).
- simhash32: 32-bit SimHash from md5 hex-digit parity (each of the 32 hex
  digits contributes one bit), reproducible in ANSI SQL.

All hashing is md5-based so a DuckDB oracle computes identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per identical content; report group size.
    Single hash-shuffle; survivors = one row per distinct content."""
    h = F.md5(F.col(text_col)).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"))
    )


def _doc_shingles(df: DataFrame, text_col: str, id_col: str, size: int) -> DataFrame:
    """Distinct ``size``-token shingles per doc (word n-grams joined by a
    space). Far more discriminative than unigrams on small vocabularies —
    keeps LSH candidate sets sparse at scale."""
    # tokens materialized first — see doc_fingerprint for why (6x at sf0.1)
    with_toks = df.select(
        F.col(id_col).alias("doc"), tokens_col(F.col(text_col)).alias("_tk")
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size("_tk") - size, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, size)),
    )
    return (
        with_toks.select("doc", F.explode(F.array_distinct(grams)).alias("tok"))
        .filter(F.col("tok") != "")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """(doc, seed, minhash) rows: minhash for seed s = min over shingles of
    the 16-hex-char window of md5(shingle) starting at position 2s+1.

    One md5 per shingle (not per shingle*seed) and all seed minima in a
    single groupBy — the per-seed orderings come from different digest
    offsets, which is as independent as LSH candidate generation needs.
    Long form (doc, seed, minhash) so band construction, agreement, and the
    SQL oracle (``min(substr(md5(tok), 2*seed+1, 16))``) all derive from it
    verbatim.
    """
    if num_hashes > 8:
        raise ValueError("num_hashes > 8 would slide windows past the 32-hex digest")
    toks = _doc_shingles(df, text_col, id_col, shingle_size)
    hashed = toks.select("doc", F.md5("tok").alias("h"))
    wide = hashed.groupBy("doc").agg(
        *[
            F.min(F.substring("h", 2 * s + 1, 16)).alias(f"m{s}")
            for s in range(num_hashes)
        ]
    )
    seed_structs = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"m{s}").alias("minhash"))
            for s in range(num_hashes)
        ]
    )
    return wide.select("doc", F.explode(seed_structs).alias("sm")).select(
        "doc", F.col("sm.seed").alias("seed"), F.col("sm.minhash").alias("minhash")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    shingle_size: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via LSH banding.

    bands of ``band_size`` consecutive seeds; candidates share >=1 band;
    agreement = matching signature positions / num_hashes >= threshold.
    Returns (doc_a, doc_b, agreement) with doc_a < doc_b.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size).cache()
    bands = (
        sig.withColumn("band", (F.col("seed") / F.lit(band_size)).cast("int"))
        .groupBy("doc", "band")
        .agg(F.concat_ws("|", F.sort_array(F.collect_list("minhash"))).alias("band_val"))
    )
    b2 = bands.select(
        F.col("doc").alias("doc_b"), F.col("band"), F.col("band_val")
    )
    cand = (
        bands.join(b2, on=["band", "band_val"])
        .filter(F.col("doc") < F.col("doc_b"))
        .select(F.col("doc").alias("doc_a"), "doc_b")
        .distinct()
    )
    s_a = sig.select(F.col("doc").alias("doc_a"), "seed", F.col("minhash").alias("h_a"))
    s_b = sig.select(F.col("doc").alias("doc_b"), "seed", F.col("minhash").alias("h_b"))
    agree = (
        cand.join(s_a, "doc_a")
        .join(s_b, ["doc_b", "seed"])
        .withColumn("m", (F.col("h_a") == F.col("h_b")).cast("int"))
        .groupBy("doc_a", "doc_b")
        .agg((F.sum("m") / F.lit(float(num_hashes))).alias("agreement"))
        .filter(F.col("agreement") >= F.lit(threshold))
    )
    return agree


def simhash32(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """32-bit SimHash: bit i set iff sum over distinct tokens of
    (+1 if hex digit i of md5(token) >= '8' else -1) > 0.

    Returned as a 32-char '0'/'1' string (bit 1 = first md5 hex digit) —
    cross-engine-stable without any bigint bit twiddling.
    """
    toks = _doc_tokens(df, text_col, id_col).withColumn("h", F.md5("tok"))
    digit_votes = [
        F.sum(
            F.when(F.substring("h", i + 1, 1).isin(*"89abcdef"), 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(32)
    ]
    votes = toks.groupBy("doc").agg(*digit_votes)
    bits = F.concat(
        *[F.when(F.col(f"v{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(32)]
    )
    return votes.select(F.col("doc"), bits.alias("simhash"))
