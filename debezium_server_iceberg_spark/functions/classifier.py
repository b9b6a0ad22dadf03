"""Hashing-trick linear classifier inference at corpus scale — the
fastText-style quality-filter pass (Joulin et al. 2016, "Bag of Tricks
for Efficient Text Classification"; the filtering recipe popularized by
GPT-3/LLaMA-era pipelines: score every crawl document with a small
linear model and keep the high-margin side).

Reference parity: model-based filtering is outside
memiiso/debezium-server-iceberg's CDC scope; it belongs to the §2.8
training-data surface this engine adds (rule-based filtering lives in
``functions/curation.py:gopher_rules``; this module is the
learned-model face of the same stage).

Pipeline shape, and why it scales:

- **Featureization is the hashing trick**: every token occurrence and
  every adjacent word-bigram occurrence maps to a bucket
  ``b = md5(gram) % n_buckets`` inside the scan projection — no
  vocabulary lookup, no dictionary state, the exact trick fastText
  uses for its n-gram features.
- **Weights arrive as a table and broadcast**: a linear model is
  ``n_buckets`` rows of ``(bucket, weight)`` — kilobytes to a few MB
  for any real model, always broadcast-joinable.  The corpus-sized
  feature stream never shuffles for the lookup.
- **The margin is one partial-aggregated groupBy**: ``margin(doc) =
  sum(w[b])`` over the document's feature occurrences, combinable
  map-side, one narrow shuffle row per (doc, partition).
- **Integer contract**: weights are integers, the margin is an exact
  BIGINT sum, and the decision is ``margin > 0`` — no sigmoid is
  needed for a keep/drop decision (sigmoid is monotone in the margin),
  so the oracle reproduces every score bit-for-bit.

The default ``weights_df=None`` builds a deterministic stand-in model
— ``w(b)`` derived from ``md5(b)``, centered on a small positive bias
so both classes occur — which exercises the full production plumbing
(hashing, broadcast lookup, margin aggregation) with an engine-portable
closed form.  Production swaps in a real learned table with the same
two-column schema; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens_col


def _bucket(col: F.Column, n_buckets: int) -> F.Column:
    """md5-derived bucket in [0, n_buckets) — the same first-8-hex-digit
    idiom as ``curation.dsir_weights`` so any engine replays it."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets


def hash_weights(
    spark: SparkSession, n_buckets: int = 4096, w_range: int = 50, bias: int = 3
) -> DataFrame:
    """The deterministic stand-in model: ``weight(b)`` is an integer in
    ``[-w_range + bias, w_range + bias]`` derived from ``md5(b)``.
    Same shape as a learned table: (bucket long, weight long)."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            _bucket(F.col("id").cast("string"), 2 * w_range + 1)
            - w_range
            + bias
        ).alias("weight"),
    )


def quality_classifier(
    docs: DataFrame,
    weights_df: DataFrame | None = None,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the hashed linear model; returns
    ``(id_col, n_features, margin, keep)``.

    Features = unigram occurrences + adjacent word-bigram occurrences
    (fastText's wordNgrams=2 configuration).  Documents with zero
    tokens have no features and are absent from the output — a
    classifier cannot score an empty feature vector.
    """
    if weights_df is None:
        weights_df = hash_weights(docs.sparkSession, n_buckets)
    toks = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_tk")
    ).filter(F.size("_tk") >= 1)
    # unigrams ++ bigrams built in-array inside the scan stage: one
    # explode, no per-feature pass over the corpus
    bigrams = F.when(
        F.size("_tk") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_tk") - 2),
            lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(F.col("_tk"), bigrams)
    occ = (
        toks.filter(F.size("_tk") >= 1)
        .select(F.col(id_col), F.explode(feats).alias("_g"))
        .select(F.col(id_col), _bucket(F.col("_g"), n_buckets).alias("bucket"))
    )
    return (
        occ.join(F.broadcast(weights_df), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("weight").alias("margin"),
        )
        .select(
            id_col,
            "n_features",
            "margin",
            (F.col("margin") > 0).alias("keep"),
        )
    )
