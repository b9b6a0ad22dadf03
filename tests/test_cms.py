"""Count-min sketch (functions/cms.py): one-sided error guarantee,
exact-on-unique-buckets, and the heavy-hitters report."""

import pytest
from pyspark.sql import functions as F

from debezium_server_iceberg_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_estimate_never_underestimates_and_hits_exact_without_collisions(spark):
    docs = _docs(spark, ["aa bb aa cc aa bb", "dd aa bb"])
    exact = {"aa": 4, "bb": 3, "cc": 1, "dd": 1}
    sketch = cms_build(docs, w=1024, d=3)
    cand = spark.createDataFrame([(t,) for t in exact], "token string")
    est = {r["token"]: r["cms_estimate"] for r in cms_estimate(sketch, cand).collect()}
    for t, c in exact.items():
        assert est[t] >= c
    # 4 tokens in 1024 buckets: no collisions, every estimate is exact
    assert est == exact


def test_total_mass_per_row_equals_occurrences(spark):
    docs = _docs(spark, ["x y z x", "y x"])
    sk = cms_build(docs, w=64, d=3).groupBy("row").agg(F.sum("counter").alias("m"))
    assert {r["row"]: r["m"] for r in sk.collect()} == {0: 6, 1: 6, 2: 6}


def test_forced_collision_overestimates(spark):
    """w=1 forces every token into one bucket per row: every estimate
    becomes the total occurrence count."""
    docs = _docs(spark, ["p q r"])
    sk = cms_build(docs, w=1, d=2)
    cand = spark.createDataFrame([("p",), ("q",)], "token string")
    est = {r["token"]: r["cms_estimate"] for r in cms_estimate(sk, cand, w=1, d=2).collect()}
    assert est == {"p": 3, "q": 3}


def test_heavy_hitters_ranked_and_bounded(spark):
    docs = _docs(spark, ["a a a b b c"] * 3)
    out = cms_heavy_hitters(docs, top_n=2).collect()
    assert [(r["rank"], r["token"], r["exact_count"]) for r in out] == [
        (1, "a", 9),
        (2, "b", 6),
    ]
    assert all(r["cms_estimate"] >= r["exact_count"] for r in out)


def test_out_of_corpus_candidate_estimates_zero(spark):
    """ADVICE r10: a candidate token absent from the corpus must
    survive with estimate 0 (min over counters INCLUDING implicit-zero
    cells), not be dropped by an inner join against the sparse
    sketch."""
    docs = _docs(spark, ["aa bb aa"])
    sketch = cms_build(docs, w=1024, d=3)
    cand = spark.createDataFrame(
        [("aa",), ("zz_never_seen",)], "token string"
    )
    est = {
        r["token"]: r["cms_estimate"]
        for r in cms_estimate(sketch, cand).collect()
    }
    assert est == {"aa": 2, "zz_never_seen": 0}
