"""Hashed linear quality classifier (functions/classifier.py)."""

import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.classifier import (
    hash_weights,
    quality_classifier,
)


def test_margin_matches_hand_computed_weights(spark):
    """One doc, known features: margin = sum of the broadcast table's
    weights for the exact unigram+bigram bucket sequence."""
    docs = spark.createDataFrame([(1, "red fox")], "doc_id long, text string")
    wt = hash_weights(spark)
    weights = {r["bucket"]: r["weight"] for r in wt.collect()}

    def bucket(g):
        import hashlib

        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % 4096

    expect = sum(weights[bucket(g)] for g in ["red", "fox", "red fox"])
    row = quality_classifier(docs).collect()[0]
    assert row["n_features"] == 3
    assert row["margin"] == expect
    assert row["keep"] == (expect > 0)


def test_single_token_doc_has_no_bigram_and_empty_doc_absent(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "a b c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    assert set(rows) == {1, 3}  # empty doc unscorable
    assert rows[1]["n_features"] == 1  # unigram only
    assert rows[3]["n_features"] == 5  # 3 unigrams + 2 bigrams


def test_learned_weight_table_override(spark):
    """Production path: a supplied (bucket, weight) table is used as-is."""
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    allneg = spark.range(4096).select(
        F.col("id").alias("bucket"), F.lit(-1).alias("weight")
    )
    row = quality_classifier(docs, weights_df=allneg).collect()[0]
    assert row["margin"] == -3 and not row["keep"]


def test_weights_are_deterministic_and_centered(spark):
    w = [r["weight"] for r in hash_weights(spark).collect()]
    assert len(w) == 4096
    assert min(w) >= -47 and max(w) <= 53  # [-50+3, 50+3]
    # both classes must be reachable
    assert any(x > 0 for x in w) and any(x < 0 for x in w)
