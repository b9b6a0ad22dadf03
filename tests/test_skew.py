"""Salting helpers: results must equal the unsalted equivalents."""

from pyspark.sql import functions as F

from debezium_server_iceberg_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # one hot key (0) with 500 rows, 50 cold keys with 2 rows each
    hot = spark.range(500).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(100).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(51)], "k long, name string"
    )
    plain = left.join(right, "k").groupBy("k", "name").count()
    salted = salted_join(left, right, ["k"], salt=4).groupBy("k", "name").count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([(0, "zero")], "k long, name string")
    plain = left.join(right, "k", "left").groupBy("name").count()
    salted = salted_join(left, right, ["k"], how="left", salt=4).groupBy("name").count()
    assert {r["name"]: r["count"] for r in salted.collect()} == {
        r["name"]: r["count"] for r in plain.collect()
    }


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n"], r["s"])
        for r in salted_agg(
            df,
            ["k"],
            partial_aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
            final_aggs={"n": F.sum("n"), "s": F.sum("s")},
            salt=4,
        ).collect()
    }
    assert salted == plain
