"""Driver-gate query catalog: every implemented operator as a
(PySpark callable, DuckDB oracle SQL) pair over /root/testdata tables.

Determinism contract with the oracle (the driver hash-compares values):
- money/measure aggregates go through exact ``decimal`` sums of per-term
  decimal casts, surfaced as double at the end — bit-identical across
  engines (no float-accumulation-order dependence);
- all content hashing is ``md5`` (identical function in Spark and DuckDB);
- every computed column is aliased identically on both sides;
- timestamps are surfaced as formatted strings or dates, never raw
  timestamps.

Reference-parity queries (cdc_*) exercise the engine operators from
SURVEY.md §2 (dedup A1/A2, merge W4, routing P1/P2, projection P4);
tpch-ish/read-path queries cover the reference's Spark-SQL read side
(BaseSparkTest.java:170-178); the rest are the training-data extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .functions.dedup import exact_dedup, minhash_near_dup_pairs, simhash32
from .functions.similarity import cosine_topk
from .functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    with_token_stats,
)
from .operators.dedup import dedup_batch, op_priority_col
from .operators.merge import merge_dataframes
from .schema.converter import DebeziumSchemaConverter

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver's harness builds a vanilla SparkSession (it never calls our
    # session.get_spark()).  Two runtime-settable confs at the single
    # chokepoint every gate query reads tables through:
    # - nanosAsLong: historical testdata generations stored events.ts as
    #   INT64(TIMESTAMP(NANOS)), which vanilla Spark refuses to read;
    # - inferTimestampNTZ=false: current generations store TIMESTAMP(MICROS,
    #   isAdjustedToUTC=false), which Spark 4 otherwise surfaces as
    #   TIMESTAMP_NTZ — a type that rejects numeric casts and diverges from
    #   the TIMESTAMP plans every query was verified against.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # - session.timeZone=UTC: ltz timestamps render/parse in UTC wall clock
    #   on any host, matching the DuckDB oracle (tz-free timestamps) and the
    #   lakehouse tables' declared write timezone (WRITE_TZ_PROP) — a
    #   non-UTC driver host would otherwise shift date_format/window results
    #   and trip the temporally-partitioned write guard.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ts normalized to microsecond TIMESTAMP.

    Handles both testdata generations: timestamp[ns] (read as a nanos long
    via ``nanosAsLong`` — truncate to µs) and timestamp[us] (read directly as
    TIMESTAMP with NTZ inference disabled). Oracle equivalent:
    ``make_timestamp(epoch_ns(ts) // 1000)``.
    """
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") in ("bigint", "long"):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev


# oracle fragment: events.ts (ns) -> µs timestamp
_TS_US = "make_timestamp(epoch_ns(ts) // 1000)"

# Exact-decimal casts for money/measure columns (the testdata generators
# produce 2-decimal money and 4-decimal event values stored as doubles, so
# these casts are exact) — keeps every aggregate bit-identical between Spark
# and the DuckDB oracle regardless of float summation order.


def _money(col):
    return col.cast("decimal(18,2)")


def _rate(col):
    return col.cast("decimal(4,2)")


def _val4(col):
    return col.cast("decimal(18,4)")


def _multisets_equal(a: DataFrame, b: DataFrame) -> bool:
    """Distributed multiset equality in ONE shuffle: tag each side ±1,
    union, hash-aggregate per distinct row, and check every per-row sum
    is zero (count_a == count_b for every distinct tuple — the same
    duplicate-sensitive contract as the former two-sided ``exceptAll``
    symmetric difference, which scanned both inputs twice and ran two
    replicate-rows aggregations).  Map-side partial aggregation shrinks
    the exchange to distinct-row granularity."""
    cols = a.columns
    tagged = a.withColumn("_s", F.lit(1)).unionByName(
        b.select(*cols).withColumn("_s", F.lit(-1))
    )
    return (
        tagged.groupBy(*cols)
        .agg(F.sum("_s").alias("_d"))
        .filter(F.col("_d") != 0)
        .isEmpty()
    )


# =====================================================================
# CDC / engine-semantics queries (operators A1/A2, W4, P1/P2)
# =====================================================================


@_register(
    "cdc_dedup_last_wins",
    f"""
    WITH ranked AS (
      SELECT user_id, event_type, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY {_TS_US} DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_events
      FROM events
    )
    SELECT user_id, event_type AS last_event_type,
           value AS last_value, n_events
    FROM ranked WHERE rn = 1
    """,
)
def cdc_dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 'last event wins': one surviving event per key, explicit total order
    (ts, then event_id) — the window-dedup at the heart of upsert batches
    (IcebergTableOperator.java:58-125)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            "n_events",
        )
    )


_OP_MAP_SQL = (
    "CASE event_type WHEN 'signup' THEN 'i' WHEN 'view' THEN 'r' "
    "WHEN 'purchase' THEN 'u' WHEN 'error' THEN 'd' ELSE 'c' END"
)


@_register(
    "cdc_dedup_op_priority",
    f"""
    WITH tagged AS (
      SELECT user_id, event_id, {_OP_MAP_SQL} AS __op,
             date_trunc('day', {_TS_US}) AS ts_day
      FROM events
    ), ranked AS (
      SELECT user_id, event_id, __op,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts_day DESC,
                        CASE __op WHEN 'i' THEN 1 WHEN 'r' THEN 2
                                  WHEN 'u' THEN 3 WHEN 'd' THEN 4 ELSE 1 END DESC,
                        event_id DESC) AS rn
      FROM tagged
    )
    SELECT user_id, event_id AS surviving_event_id, __op AS surviving_op
    FROM ranked WHERE rn = 1
    """,
)
def cdc_dedup_op_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 dedup with the reference's op-priority map i=1<r=2<u=3<d=4
    (IcebergTableOperator.java:49-51): day-truncated ts forces ties so the
    priority comparator decides, event_id as the final tiebreak."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr(_OP_MAP_SQL).alias("__op"),
        F.date_trunc("day", F.col("ts")).alias("ts_day"),
    )
    survived = dedup_batch(ev, ["user_id"], dedup_column="ts_day", tiebreak_col="event_id")
    return survived.select(
        "user_id",
        F.col("event_id").alias("surviving_event_id"),
        F.col("__op").alias("surviving_op"),
    )


@_register(
    "cdc_upsert_orders",
    """
    WITH final_state AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))
                  ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
      FROM orders
      WHERE o_orderkey % 20 != 3
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(price) AS DOUBLE) AS total_price
    FROM final_state GROUP BY o_orderstatus
    """,
)
def cdc_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 MERGE semantics end-to-end on DataFrames: snapshot ('r') + update
    pass (+10% price on keys %10==0) + hard-delete pass (keys %20==3),
    applied via dedup_batch + merge_dataframes (hard-delete mode), then
    aggregated. The oracle states the equivalent final relation directly."""
    orders = _t(spark, sf_dir, "orders")
    price = _money(F.col("o_totalprice"))
    snapshot = orders.select(
        "o_orderkey",
        "o_orderstatus",
        price.cast("decimal(20,3)").alias("price"),
        F.lit("r").alias("__op"),
        F.lit(0).alias("__source_ts_ms"),
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            (price * F.lit(1.1).cast("decimal(2,1)")).cast("decimal(20,3)").alias("price"),
            F.lit("u").alias("__op"),
            F.lit(1).alias("__source_ts_ms"),
        )
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 20 == 3)
        .select(
            "o_orderkey",
            "o_orderstatus",
            price.cast("decimal(20,3)").alias("price"),
            F.lit("d").alias("__op"),
            F.lit(2).alias("__source_ts_ms"),
        )
    )
    changes = dedup_batch(
        updates.unionByName(deletes),
        ["o_orderkey"],
        dedup_column="__source_ts_ms",
    )
    final = merge_dataframes(
        snapshot, changes, ["o_orderkey"], keep_deletes=False
    )
    return final.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("total_price"),
    )


@_register(
    "cdc_route_by_destination",
    """
    WITH routed AS (
      SELECT 'srv.app.' || event_type AS destination, value
      FROM events
      WHERE NOT ('srv.app.' || event_type LIKE '__debezium-heartbeat%')
    )
    SELECT replace(destination, '.', '_') AS table_name, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM routed GROUP BY replace(destination, '.', '_')
    """,
)
def cdc_route_by_destination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P7: destination routing + heartbeat filter + table-name mapping
    as one declarative pass (groupBy destination == the reference's
    groupingBy at IcebergChangeConsumer.java:142-154)."""
    from .operators.router import filter_heartbeats

    ev = _t(spark, sf_dir, "events").withColumn(
        "destination", F.concat(F.lit("srv.app."), F.col("event_type"))
    )
    ev = filter_heartbeats(ev)
    return (
        ev.groupBy(F.regexp_replace("destination", r"\.", "_").alias("table_name"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_val4(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


# =====================================================================
# Read-path queries (the reference verifies everything via Spark SQL —
# BaseSparkTest.java:170-178; these are the analytical surface over the
# same tables)
# =====================================================================


@_register(
    "q1_pricing_summary",
    """
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS DECIMAL(18,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l_discount AS DECIMAL(4,2)) AS disc,
             CAST(l_tax AS DECIMAL(4,2)) AS tax
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qty) AS DOUBLE) AS sum_qty,
           CAST(sum(price) AS DOUBLE) AS sum_base_price,
           round(CAST(sum(price * (1 - disc)) AS DOUBLE), 2) AS sum_disc_price,
           round(CAST(sum(price * (1 - disc) * (1 + tax)) AS DOUBLE), 2) AS sum_charge,
           round(CAST(sum(qty) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(disc) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM t
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    qty = _money(F.col("l_quantity"))
    price = _money(F.col("l_extendedprice"))
    disc = _rate(F.col("l_discount"))
    tax = _rate(F.col("l_tax"))
    one = F.lit(1).cast("decimal(3,2)")
    # wide-scale decimal sums: the exact sf1 sums need 17 significant
    # digits, where engines' decimal->double conversions legally differ by
    # 1 ulp (DuckDB converts int128->double then divides by 10^scale —
    # two roundings).  round(double, 2) on BOTH sides absorbs the ulp
    # (a decimal-scale-2 pre-cast would instead hit Spark-HALF_UP vs
    # DuckDB-half-even tie breaks on the frequent exact .xx5 sums)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.round(F.sum(price * (one - disc)).cast("double"), 2).alias("sum_disc_price"),
        F.round(F.sum(price * (one - disc) * (one + tax)).cast("double"), 2).alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / F.count(F.lit(1)), 4).alias("avg_qty"),
        F.round(F.sum(disc).cast("double") / F.count(F.lit(1)), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join chain with a broadcast-able dimension (customer) and a top-k.
    Catalyst broadcasts the filtered customer side automatically under AQE."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                _money(F.col("l_extendedprice"))
                * (F.lit(1).cast("decimal(3,2)") - _rate(F.col("l_discount")))
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@_register(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                _money(F.col("l_extendedprice"))
                * (F.lit(1).cast("decimal(3,2)") - _rate(F.col("l_discount")))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@_register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_money(F.col("l_extendedprice")) * _rate(F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@_register(
    "topk_orders_per_priority",
    """
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders
    )
    SELECT o_orderpriority, rnk, o_orderkey, o_totalprice AS totalprice
    FROM ranked WHERE rnk <= 3
    """,
)
def topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "rnk",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
        )
    )


@_register(
    "events_hourly_rollup",
    f"""
    SELECT strftime(date_trunc('hour', {_TS_US}), '%Y-%m-%d %H') AS hour,
           event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup (T6 extension): expressed with date_trunc so the
    same plan serves batch and Structured Streaming (groupBy window(ts))."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_val4(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


# =====================================================================
# Training-data pipeline operators (SURVEY.md §7 phase 6)
# =====================================================================

_TOKENS_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')"


@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS group_size
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_t(spark, sf_dir, "documents"))


@_register(
    "token_stats",
    f"""
    SELECT doc_id,
           len({_TOKENS_SQL}) AS n_tokens,
           len(list_distinct({_TOKENS_SQL})) AS n_distinct_tokens
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_token_stats(_t(spark, sf_dir, "documents"))


@_register(
    "quality_score",
    f"""
    WITH feat AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n,
             len(list_distinct({_TOKENS_SQL})) AS nd,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             length(text) AS total
      FROM documents
    )
    SELECT doc_id, n AS n_tokens,
           round(CAST(nd AS DOUBLE) / n, 4) AS distinct_ratio,
           round(CAST(alpha AS DOUBLE) / total, 4) AS alpha_ratio,
           round(0.5 * (CAST(nd AS DOUBLE) / n)
                 + 0.3 * (CAST(least(n, 100) AS DOUBLE) / 100.0)
                 + 0.2 * (CAST(alpha AS DOUBLE) / total), 4) AS quality
    FROM feat
    """,
)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(_t(spark, sf_dir, "documents"))


def _langid_oracle() -> str:
    from .functions.text import STOPWORDS

    langs = sorted(STOPWORDS)
    hits_exprs = []
    for lang in langs:
        arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hits_exprs.append(
            f"len(list_filter({_TOKENS_SQL}, x -> list_contains([{arr}], x))) AS hits_{lang}"
        )
    best = f"greatest({', '.join(f'hits_{lang}' for lang in langs)})"
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN {best} > 0 AND hits_{lang} = {best} THEN '{lang}' ELSE {pred} END"
    return f"""
    WITH hits AS (
      SELECT doc_id, {', '.join(hits_exprs)} FROM documents
    )
    SELECT doc_id, {', '.join(f'hits_{lang}' for lang in langs)}, {pred} AS pred_lang
    FROM hits
    """


@_register("lang_id", None)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(_t(spark, sf_dir, "documents"))


_ORACLES["lang_id"] = _langid_oracle()


@_register(
    "doc_fingerprint",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             md5(array_to_string(t[i:i+3], ' ')) AS h
      FROM toks, UNNEST(range(1, greatest(len(t) - 3, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+3], ' ') <> ''
    ), dist AS (
      SELECT DISTINCT doc_id, h FROM grams
    ), ranked AS (
      SELECT doc_id, h, row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
      FROM dist
    )
    SELECT doc_id, string_agg(h, '' ORDER BY h) AS fingerprint,
           count(*) AS k_actual
    FROM ranked WHERE rn <= 4 GROUP BY doc_id
    """,
)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(_t(spark, sf_dir, "documents"))


@_register(
    "minhash_near_dup",
    f"""
    WITH tk AS (
      SELECT doc_id AS doc, {_TOKENS_SQL} AS t FROM documents
    ), toks AS (
      SELECT DISTINCT doc, array_to_string(t[i:i+2], ' ') AS tok
      FROM tk, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+2], ' ') <> ''
    ), hashed AS (
      SELECT doc, seed, min(substr(md5(tok), CAST(2*seed+1 AS INT), 16)) AS minhash
      FROM toks, UNNEST(range(0, 8)) AS s(seed)
      GROUP BY doc, seed
    ), bands AS (
      SELECT doc, CAST(seed // 2 AS INT) AS band,
             string_agg(minhash, '|' ORDER BY minhash) AS band_val
      FROM hashed GROUP BY doc, CAST(seed // 2 AS INT)
    ), cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
      WHERE a.doc < b.doc
    )
    SELECT c.doc_a, c.doc_b,
           CAST(sum(CASE WHEN ha.minhash = hb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / 8 AS agreement
    FROM cand c
      JOIN hashed ha ON ha.doc = c.doc_a
      JOIN hashed hb ON hb.doc = c.doc_b AND hb.seed = ha.seed
    GROUP BY c.doc_a, c.doc_b
    HAVING CAST(sum(CASE WHEN ha.minhash = hb.minhash THEN 1 ELSE 0 END) AS DOUBLE) / 8 >= 0.5
    """,
)
def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dup_pairs(_t(spark, sf_dir, "documents"))


_MINHASH_PAIRS_ORACLE = _ORACLES["minhash_near_dup"]


@_register(
    "dedup_canonical_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_MINHASH_PAIRS_ORACLE}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc,
           least(u, min(v)) AS cluster_id,
           (u = least(u, min(v))) AS is_canonical
    FROM reach GROUP BY u
    """,
)
def dedup_canonical_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup endgame: MinHash-LSH pairs -> connected components (min-
    label propagation, iterated to convergence) -> canonical doc per
    cluster. Oracle computes the same transitive closure with a recursive
    CTE."""
    from .functions.dedup import near_dup_clusters

    pairs = minhash_near_dup_pairs(_t(spark, sf_dir, "documents"))
    return near_dup_clusters(pairs)


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN substr(h, {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{i}"
        for i in range(32)
    )
    bits = " || ".join(
        f"CASE WHEN v{i} > 0 THEN '1' ELSE '0' END" for i in range(32)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id AS doc, md5(unnest(list_distinct({_TOKENS_SQL}))) AS h
      FROM documents
    ), votes AS (
      SELECT doc, {votes} FROM toks GROUP BY doc
    )
    SELECT doc, {bits} AS simhash FROM votes
    """


@_register("simhash", None)
def simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash32(_t(spark, sf_dir, "documents"))


_ORACLES["simhash"] = _simhash_oracle()


def _simhash64_oracle() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN substr(h{j + 1}, {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v{j * 32 + i}"
        for j in range(2)
        for i in range(32)
    )
    bits = " || ".join(
        f"CASE WHEN v{i} > 0 THEN '1' ELSE '0' END" for i in range(64)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id AS doc, unnest(list_distinct({_TOKENS_SQL})) AS t
      FROM documents
    ), toks AS (
      SELECT doc, md5(t) AS h1, md5('x:' || t) AS h2 FROM tok
    ), votes AS (
      SELECT doc, {votes} FROM toks GROUP BY doc
    )
    SELECT doc, {bits} AS simhash FROM votes
    """


def _simhash_near_dup_oracle(max_hamming: int = 3) -> str:
    base = _simhash64_oracle()
    ham = " + ".join(
        f"CASE WHEN substr(a.simhash, {i + 1}, 1) <> substr(b.simhash, {i + 1}, 1) "
        f"THEN 1 ELSE 0 END"
        for i in range(64)
    )
    bands = " OR ".join(
        f"substr(a.simhash, {16 * b + 1}, 16) = substr(b.simhash, {16 * b + 1}, 16)"
        for b in range(4)
    )
    # gate scope: doc_id % 10 = 0 — this synthetic corpus is template-heavy,
    # so unrestricted Hamming<=3 yields hundreds of thousands of true pairs;
    # the subset keeps the oracle compare meaningful and bounded
    return f"""
    WITH sigs AS ({base})
    SELECT a.doc AS doc_a, b.doc AS doc_b, ({ham}) AS hamming
    FROM sigs a JOIN sigs b ON a.doc < b.doc AND ({bands})
    WHERE a.doc % 10 = 0 AND b.doc % 10 = 0 AND ({ham}) <= {max_hamming}
    """


@_register("simhash_near_dup", None)
def simhash_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.dedup import simhash_near_dup_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return simhash_near_dup_pairs(docs)


_ORACLES["simhash_near_dup"] = _simhash_near_dup_oracle()


@_register(
    "ann_cosine_topk",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 10
    ), scored AS (
      SELECT q.qid, b.vec_id AS cid,
             list_cosine_similarity(q.qv, b.v) AS cos
      FROM base b, q WHERE b.vec_id != q.qid
    ), ranked AS (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
      FROM scored
    )
    SELECT qid AS query_id, rank, cid AS neighbor_id, round(cos, 3) AS cosine
    FROM ranked WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_t(spark, sf_dir, "embeddings"), query_ids=list(range(10)), k=5)


# =====================================================================
# Read-path wave 2: joins/set-ops/windows the reference gets "for free"
# from Spark SQL (SURVEY.md §2.5 ⊘ rows, demonstrated as first-class ops)
# =====================================================================


@_register(
    "ann_ivf_index_topk",
    None,  # oracle assigned below: probing ALL cells makes IVF exact
)
def ann_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistent disk-level IVF: build the cell-partitioned lakehouse
    index, then search with n_probe = n_cells — exhaustive probing makes
    the result EXACT, so the brute-force cosine oracle checks the entire
    build+assign+scan+rerank machinery (the approximate n_probe < n_cells
    mode exercises the same code with fewer files read)."""
    import shutil as _sh
    import tempfile as _tf

    from .functions.ann_index import IVFIndex
    from .lakehouse import LakeCatalog

    emb = _t(spark, sf_dir, "embeddings")
    wh = _tf.mkdtemp(prefix="ivf_idx_")
    try:
        idx = IVFIndex.build(LakeCatalog(wh), "ann", "ivf", emb, n_cells=8)
        return idx.search(
            spark, query_ids=list(range(10)), k=5, n_probe=8
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


_ORACLES["ann_ivf_index_topk"] = _ORACLES["ann_cosine_topk"]


@_register(
    "iceberg_export_mor_roundtrip",
    """
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 500 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus
      FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT o_orderstatus, count(*) AS n_orders
    FROM t GROUP BY o_orderstatus
    """,
)
def iceberg_export_mor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg export WITH outstanding merge-on-read deletes: upsert a
    slice (equality-delete file stays live), publish WITHOUT
    materializing, and re-read through the standard metadata chain only —
    the content=1 delete manifest must be written and applied, so a
    dropped delete file (stale rows back) or an over-applied one (rows
    missing) hash-mismatches against the oracle's restated final state."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .lakehouse.iceberg_export import export_iceberg_table, read_iceberg_table
    from .operators.merge import merge_into

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="ice_mor_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns", "orders_mor_pub", sub.schema, identifier_fields=["o_orderkey"]
        )
        t.append(sub)
        upd = sub.filter(F.col("o_orderkey") % 500 == 0).withColumn(
            "o_orderstatus", F.lit("X")
        ).withColumn("__op", F.lit("u"))
        merge_into(t, upd, mode="merge-on-read", delete_style="equality")
        assert t.current_deletes(), "gate precondition: live delete files"
        dest = _os.path.join(wh, "published")
        export_iceberg_table(t, dest)
        back = read_iceberg_table(spark, dest)
        return (
            back.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "iceberg_export_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders WHERE o_orderkey % 50 = 0
    GROUP BY o_orderstatus
    """,
)
def iceberg_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interop fidelity end-to-end (the reference's 'any engine can read
    the tables' contract, IcebergChangeConsumer.java:100-102 /
    BaseSparkTest.java:170-178): write orders into a lakehouse table,
    publish it as a REAL Iceberg v2 table (v1.metadata.json + Avro
    manifest list + Avro manifest, written per the public spec by
    lakehouse/iceberg_export.py), then read it back through the standard
    Iceberg metadata chain ONLY — version-hint -> metadata.json ->
    manifest list -> manifests -> parquet — and aggregate.  The oracle
    computes the same aggregate from the source rows, so a wrong manifest
    entry, a missing file, or a mis-encoded Avro field changes the result
    and hash-mismatches.  (tests/test_iceberg_export.py additionally
    validates the Avro bytes with the real Apache Avro Java library.)"""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .lakehouse.iceberg_export import (
        export_iceberg_table,
        read_iceberg_table,
    )

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_orderstatus", _money(F.col("o_totalprice")).alias("price"))
    )
    wh = _tf.mkdtemp(prefix="ice_exp_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns", "orders_pub", sub.schema, identifier_fields=["o_orderkey"]
        )
        t.append(sub)
        dest = _os.path.join(wh, "published")
        export_iceberg_table(t, dest)
        back = read_iceberg_table(spark, dest)
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price").cast("double").alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "iceberg_export_partitioned_roundtrip",
    """
    SELECT CAST(month(o_orderdate) AS INTEGER) AS month_no,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 2 = 0 AND year(o_orderdate) = 1995
    GROUP BY 1
    """,
)
def iceberg_export_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Faithful TRANSFORM-partitioned metadata export (closing the
    reference's full partition surface, IcebergUtil.java:214-297 /
    docs/iceberg.md:148-182): write orders into a lakehouse table
    partitioned by ``bucket(4, o_custkey), year(o_orderdate)`` — the
    bucket IS Iceberg's murmur3 bucket (lakehouse/murmur3.py) — publish
    it as Iceberg v2 metadata, then read ONE year back through the
    standard metadata chain using a from-spec PARTITION PRUNER on the
    exported per-file partition values.  Mid-query asserts prove pruning
    eliminated files (not just that values decode); the oracle recomputes
    the same aggregate from source rows, so a lying partition value
    (files wrongly pruned or kept) changes the result and
    hash-mismatches."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .lakehouse.iceberg_export import (
        export_iceberg_table,
        plan_iceberg_scan,
        read_iceberg_table,
    )

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            _money(F.col("o_totalprice")).alias("price"),
        )
    )
    wh = _tf.mkdtemp(prefix="ice_part_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_part",
            sub.schema,
            identifier_fields=["o_orderkey"],
            partition_spec="bucket(4, o_custkey), year(o_orderdate)",
        )
        t.append(sub)
        dest = _os.path.join(wh, "published")
        export_iceberg_table(t, dest)
        # 1995 as the spec's years-since-1970 partition value
        full = plan_iceberg_scan(dest)
        pruned = plan_iceberg_scan(
            dest, partition_filter={"o_orderdate_year": 1995 - 1970}
        )
        assert pruned["pruned_files"] > 0, "partition pruning eliminated nothing"
        assert len(pruned["data_files"]) < len(full["data_files"])
        back = read_iceberg_table(
            spark, dest, partition_filter={"o_orderdate_year": 1995 - 1970}
        )
        return (
            back.filter(F.year("o_orderdate") == 1995)
            .groupBy(F.month("o_orderdate").cast("int").alias("month_no"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price").cast("double").alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "wap_branch_publish",
    """
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 400 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus
      FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT o_orderstatus, count(*) AS n_orders
    FROM t GROUP BY o_orderstatus
    """,
)
def wap_branch_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish end-to-end (Iceberg branch workflow; the
    reference inherits refs/branches from the Iceberg library): load orders
    into a lakehouse table, stage a merge-on-read upsert on an ``audit``
    BRANCH (main is provably untouched — asserted mid-query), then publish
    with an atomic ``fast_forward`` and read main.  The oracle recomputes
    the post-publish state from the source rows, so a branch commit that
    leaked onto main early, a lost upsert, or a bad publish all
    hash-mismatch."""
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="wap_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns", "orders_wap", sub.schema, identifier_fields=["o_orderkey"]
        )
        n_before = t.append(sub)
        t.create_branch("audit")
        upd = sub.filter(F.col("o_orderkey") % 400 == 0).withColumn(
            "o_orderstatus", F.lit("X")
        )
        t.commit_row_delta(upd, upd, branch="audit")
        # audit step: staging must not have leaked onto main
        assert t.to_df(spark).filter(F.col("o_orderstatus") == "X").count() == 0
        assert t.row_count() == n_before
        t.fast_forward("audit")
        return (
            t.to_df(spark)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "row_lineage_upsert",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderstatus, (o_orderkey % 400 = 0) AS updated
      FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT o_orderstatus, updated,
           count(*) AS n_rows,
           count(*) AS n_distinct_ids,
           CAST(CASE WHEN updated THEN count(*) ELSE 0 END AS BIGINT) AS n_fresh_ids
    FROM t GROUP BY o_orderstatus, updated
    """,
)
def row_lineage_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v3 row lineage end-to-end (spec: Row Lineage; the reference
    defaults to v3, IcebergConfig.java:106-108): append a batch into a
    format-version=3 table, upsert a subset (merge-on-read position
    deletes), then read with ``lineage=True`` and aggregate the lineage
    invariants the spec guarantees — every row has a unique ``_row_id``
    (n_distinct_ids == n_rows), untouched rows keep ids from the first
    commit's range with ``_last_updated_sequence_number`` = 1, and
    upserted rows carry fresh ids >= the first batch's count with
    sequence = 2.  Physical file enumeration (which ids land in which
    file) is non-deterministic, so the gate checks exactly the invariant
    set; the oracle restates it from the source rows."""
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .lakehouse.table import LAST_SEQ_COL, ROW_ID_COL
    from .operators.merge import merge_into

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="lineage_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_lineage",
            sub.schema,
            identifier_fields=["o_orderkey"],
            properties={"format-version": "3"},
        )
        n_before = t.append(sub)
        upd = sub.filter(F.col("o_orderkey") % 400 == 0).withColumn(
            "__op", F.lit("u")
        )
        merge_into(t, upd)
        out = t.to_df(spark, lineage=True)
        updated = (F.col(LAST_SEQ_COL) == 2).alias("updated")
        fresh = F.col(ROW_ID_COL) >= n_before
        return (
            out.groupBy("o_orderstatus", updated)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(ROW_ID_COL).alias("n_distinct_ids"),
                F.sum(F.when(fresh, 1).otherwise(0)).alias("n_fresh_ids"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "pruned_point_lookup",
    """
    WITH k AS (
      SELECT min(o_custkey) AS ck FROM orders WHERE o_custkey % 7 = 3
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders, k
    WHERE o_custkey = k.ck
      AND o_orderdate >= TIMESTAMP '1993-01-01 00:00:00'
      AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59'
    GROUP BY 1
    """,
)
def pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg planFiles on the ENGINE read path: a point lookup against a
    bucket+year partitioned table goes through ``to_df(row_filter=...)``,
    which prunes files driver-side from hidden-partition transform values
    (murmur3 bucket of the key, year encodings for the date range) and
    column bounds, then applies the residual filter in-plan — identical
    results to a full-scan filter, manifest-planning cost.  Mid-query
    asserts prove files were actually pruned; the oracle recomputes from
    the raw rows, so over-pruning (lost rows) hash-mismatches."""
    import shutil as _sh
    import tempfile as _tf
    from datetime import datetime as _dtt

    from .lakehouse import LakeCatalog
    from .lakehouse.table import _prune_files_by_filter

    orders = _t(spark, sf_dir, "orders")
    # deterministic existing key (planning-scale fetch, like a threshold)
    ck = orders.filter(F.col("o_custkey") % 7 == 3).agg(
        F.min("o_custkey")
    ).collect()[0][0]
    sub = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        _money(F.col("o_totalprice")).alias("price"),
    )
    wh = _tf.mkdtemp(prefix="lookup_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_lookup",
            sub.schema,
            identifier_fields=["o_orderkey"],
            partition_spec="bucket(8, o_custkey), year(o_orderdate)",
        )
        t.append(sub)
        flt = {
            "o_custkey": ck,
            "o_orderdate": (
                _dtt(1993, 1, 1), _dtt(1997, 12, 31, 23, 59, 59)
            ),
        }
        files = t.current_files()
        kept = _prune_files_by_filter(t.metadata(), files, flt)
        assert len(kept) < len(files), "row_filter pruned nothing"
        return (
            t.to_df(spark, row_filter=flt)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price").cast("double").alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "iceberg_export_lineage_roundtrip",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderstatus, (o_orderkey % 400 = 0) AS updated
      FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT o_orderstatus, updated,
           count(*) AS n_rows,
           count(*) AS n_distinct_ids,
           CAST(CASE WHEN updated THEN count(*) ELSE 0 END AS BIGINT) AS n_fresh_ids
    FROM t GROUP BY o_orderstatus, updated
    """,
)
def iceberg_export_lineage_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3 METADATA export of row lineage: the same invariants as
    ``row_lineage_upsert``, but read through the standard Iceberg
    metadata chain (format-version 3 doc + per-file ``first_row_id`` in
    the Avro manifests + ``read_iceberg_table(lineage=True)`` deriving
    ``_row_id``), not the engine's native manifests.  A missing or wrong
    first_row_id, a lineage column lost in export, or a derivation bug
    breaks uniqueness/freshness counts and hash-mismatches.  Mid-query
    assert pins the chain lineage EQUAL to the engine's native lineage
    read, row for row."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .lakehouse.iceberg_export import (
        export_iceberg_table,
        read_iceberg_table,
    )
    from .lakehouse.table import LAST_SEQ_COL, ROW_ID_COL
    from .operators.merge import merge_into

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="lin_exp_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_linexp",
            sub.schema,
            identifier_fields=["o_orderkey"],
            properties={"format-version": "3"},
        )
        n_before = t.append(sub)
        upd = sub.filter(F.col("o_orderkey") % 400 == 0).withColumn(
            "__op", F.lit("u")
        )
        # equality deletes: position-delete files are v2-only constructs,
        # a v3 export would refuse them (spec: v3 uses deletion vectors)
        merge_into(t, upd, delete_style="equality")
        dest = _os.path.join(wh, "published")
        export_iceberg_table(t, dest)
        # materialize the chain read ONCE: both the equality assert and
        # the final aggregate consume it, and the MoR+lineage chain read
        # (delete application + lineage attach) is the gate's most
        # expensive scan — replaying it per consumer doubled the cost
        # (guide §1.2 "don't compute things twice"; needed columns =
        # status + key + both lineage cols, i.e. the whole narrow table)
        out = read_iceberg_table(spark, dest, lineage=True).localCheckpoint(
            eager=True
        )
        # distributed multiset-equality check: pins chain lineage
        # row-for-row equal to the engine's native lineage without
        # materializing either side on the driver (duplicate-sensitive,
        # like the symmetric exceptAll it replaces, at one shuffle)
        cols = ["o_orderkey", ROW_ID_COL, LAST_SEQ_COL]
        chain_l, native_l = out.select(*cols), t.to_df(
            spark, lineage=True
        ).select(*cols)
        assert _multisets_equal(
            chain_l, native_l
        ), "chain lineage diverges from engine lineage"
        updated = (F.col(LAST_SEQ_COL) == 2).alias("updated")
        fresh = F.col(ROW_ID_COL) >= n_before
        return (
            out.groupBy("o_orderstatus", updated)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(ROW_ID_COL).alias("n_distinct_ids"),
                F.sum(F.when(fresh, 1).otherwise(0)).alias("n_fresh_ids"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "iceberg_export_dv_roundtrip",
    """
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 400 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus
      FROM orders
      WHERE o_orderkey % 40 = 0 AND o_orderkey % 400 <> 200
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(sum(o_orderkey) AS BIGINT) AS sum_key
    FROM t GROUP BY o_orderstatus
    """,
)
def iceberg_export_dv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3 deletion-vector export (W17, final edge): a format-version 3
    table with LIVE merge-on-read position deletes publishes them as
    puffin ``deletion-vector-v1`` blobs — one DV per referenced data
    file (spec rule), roaring-bitmap encoded (puffin.py, byte-validated
    against Spark's org.roaringbitmap jar) — and the standard
    metadata-chain read applies the vectors executor-side.  Mid-query
    asserts pin that the plan carries PUFFIN DV entries (no
    position-delete parquet, which v3 forbids) and that the chain read
    equals the engine-native read row-for-row.  A wrong bitmap byte, a
    bad blob offset, or a missed vector surfaces as a count/sum
    mismatch against the oracle.

    Reference: the reference engine inherits DV support from the Iceberg
    library's puffin writers (iceberg-core); this engine owns the codec
    (docs/iceberg.md:19-33 positions v3 support as core)."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .lakehouse.iceberg_export import (
        export_iceberg_table,
        plan_iceberg_scan,
        read_iceberg_table,
    )
    from .operators.merge import merge_into

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="dv_exp_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_dv",
            sub.schema,
            identifier_fields=["o_orderkey"],
            properties={"format-version": "3"},
        )
        t.append(sub)
        upd = sub.filter(F.col("o_orderkey") % 400 == 0).withColumn(
            "o_orderstatus", F.lit("X")
        ).withColumn("__op", F.lit("u"))
        dels = sub.filter(F.col("o_orderkey") % 400 == 200).withColumn(
            "__op", F.lit("d")
        )
        merge_into(
            t, upd.unionByName(dels), keep_deletes=False,
            delete_style="position",
        )
        dest = _os.path.join(wh, "published")
        export_iceberg_table(t, dest)
        plan = plan_iceberg_scan(dest)
        assert plan["doc"]["format-version"] == 3
        assert plan["dv_deletes"] and not plan["pos_deletes"], (
            "v3 export must carry puffin deletion vectors, "
            "not position-delete parquet"
        )
        # materialize the chain read once: the DV-applying chain read is
        # consumed by BOTH the equality assert and the final aggregate —
        # replaying it per consumer doubled the gate's dominant scan
        out = read_iceberg_table(spark, dest).localCheckpoint(eager=True)
        native = t.to_df(spark)
        assert _multisets_equal(
            out, native
        ), "chain read diverges from engine read under DVs"
        return (
            out.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.min("o_orderkey").alias("min_key"),
                F.sum("o_orderkey").alias("sum_key"),
            )
            # the source parquet lives in the tmpdir removed below
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "sql_read_surface",
    """
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 400 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus
      FROM orders WHERE o_orderkey % 40 = 0
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(min(o_orderkey) AS BIGINT) AS min_key
    FROM t GROUP BY o_orderstatus
    """,
)
def sql_read_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own verification surface: after CDC writes land,
    users read replicated tables with plain ``spark.sql`` over registered
    views (BaseSparkTest.java:170-178 — spark.sql("SELECT * FROM <table>")).
    Load + upsert a lakehouse table, ``register_views``, and aggregate
    through SQL text — the view resolves to the current-snapshot
    merge-on-read scan, so a stale view, a missed delete file, or broken
    name registration all hash-mismatch."""
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .operators.merge import merge_into

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="sqlv_")
    try:
        cat = LakeCatalog(wh)
        t = cat.create_table(
            "ns", "orders_sql", sub.schema, identifier_fields=["o_orderkey"]
        )
        t.append(sub)
        upd = sub.filter(F.col("o_orderkey") % 400 == 0).withColumn(
            "o_orderstatus", F.lit("X")
        ).withColumn("__op", F.lit("u"))
        merge_into(t, upd)
        cat.register_views(spark, "ns", prefix="gate_")
        return spark.sql(
            """
            SELECT o_orderstatus, count(*) AS n_orders,
                   min(o_orderkey) AS min_key
            FROM gate_orders_sql GROUP BY o_orderstatus
            """
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "changed_rows_scan",
    """
    SELECT o_orderstatus, count(*) AS n_changed
    FROM orders
    WHERE o_orderkey % 40 = 0 AND o_orderkey % 400 = 0
    GROUP BY o_orderstatus
    """,
)
def changed_rows_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v3 changed-row scan: after an upsert into a lineage-tracking table,
    ``changed_rows_since(first_snapshot)`` must surface EXACTLY the
    upserted rows' post-images, once each — manifest pruning skips every
    pre-existing file (seq <= snapshot), so the scan cost is ∝ the new
    data.  The oracle restates the changed set from the source rows; a
    scan that leaks unchanged rows, misses an update, or double-counts a
    twice-written key hash-mismatches."""
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .operators.merge import merge_into

    sub = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select("o_orderkey", "o_orderstatus")
    )
    wh = _tf.mkdtemp(prefix="chg_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_chg",
            sub.schema,
            identifier_fields=["o_orderkey"],
            properties={"format-version": "3"},
        )
        t.append(sub)                                     # snapshot 1
        upd = sub.filter(F.col("o_orderkey") % 400 == 0).withColumn(
            "__op", F.lit("u")
        )
        merge_into(t, upd)                                # snapshot 2
        return (
            t.changed_rows_since(spark, 1)
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n_changed"))
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "changed_rows_with_deletes",
    """
    WITH base AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 30 = 0
    ),
    changes AS (
      SELECT 'upsert' AS change_type, 'X' AS o_orderstatus, o_orderkey
      FROM base WHERE o_orderkey % 300 = 0
      UNION ALL
      SELECT 'delete', o_orderstatus, o_orderkey
      FROM base WHERE o_orderkey % 90 = 0 AND o_orderkey % 300 <> 0
      UNION ALL
      SELECT 'upsert', 'N', o_orderkey
      FROM orders WHERE o_orderkey % 31 = 0 AND o_orderkey % 30 <> 0
    )
    SELECT change_type, o_orderstatus, count(*) AS n_rows
    FROM changes GROUP BY 1, 2
    """,
)
def changed_rows_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full changelog granularity (Iceberg ``create_changelog_view``
    semantics — the reference's consumers chain pipelines off such feeds):
    after a MERGE with updates, HARD deletes and inserts,
    ``changed_rows_since(sid, include_deletes=True)`` must emit post-image
    upserts AND pre-image delete rows, exactly once each.  The oracle
    replays the lifecycle in SQL — grouping by (change_type,
    o_orderstatus) pins that delete images carry the ORIGINAL column
    values, not the tombstone's; a leaked unchanged row, a missing delete
    image, or a post-image-valued delete all hash-mismatch."""
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog
    from .operators.merge import merge_into

    orders = _t(spark, sf_dir, "orders")
    sub = orders.filter(F.col("o_orderkey") % 30 == 0).select(
        "o_orderkey", "o_orderstatus"
    )
    wh = _tf.mkdtemp(prefix="chgdel_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns",
            "orders_chgdel",
            sub.schema,
            identifier_fields=["o_orderkey"],
            properties={"format-version": "3"},
        )
        t.append(sub)                                     # snapshot 1
        upd = (
            sub.filter(F.col("o_orderkey") % 300 == 0)
            .withColumn("o_orderstatus", F.lit("X"))
            .withColumn("__op", F.lit("u"))
        )
        dels = (
            sub.filter(
                (F.col("o_orderkey") % 90 == 0)
                & (F.col("o_orderkey") % 300 != 0)
            )
            .withColumn("__op", F.lit("d"))
        )
        ins = (
            orders.filter(
                (F.col("o_orderkey") % 31 == 0)
                & (F.col("o_orderkey") % 30 != 0)
            )
            .select(
                "o_orderkey",
                F.lit("N").alias("o_orderstatus"),
                F.lit("c").alias("__op"),
            )
        )
        merge_into(
            t, upd.unionByName(dels).unionByName(ins), keep_deletes=False
        )                                                 # snapshot 2
        return (
            t.changed_rows_since(spark, 1, include_deletes=True)
            .groupBy(
                F.col("_change_type").alias("change_type"), "o_orderstatus"
            )
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "incremental_append_scan",
    """
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey % 30 = 0 AND o_orderkey % 60 <> 0
    GROUP BY o_orderstatus
    """,
)
def incremental_append_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog tailing (Iceberg appendsBetween / Spark incremental read):
    commit two append batches, then incrementally scan ONLY what landed
    after the first snapshot.  The oracle computes the second batch's
    aggregate from the source, so an incremental scan that leaks batch-1
    rows (or drops batch-2 files) hash-mismatches.  File selection is a
    manifest sequence-number filter — cost ∝ new data, the property that
    makes downstream pipelines tail a 100 TB table cheaply."""
    import shutil as _sh
    import tempfile as _tf

    from .lakehouse import LakeCatalog

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", _money(F.col("o_totalprice")).alias("price")
    )
    batch1 = orders.filter(F.col("o_orderkey") % 60 == 0)
    batch2 = orders.filter(
        (F.col("o_orderkey") % 30 == 0) & (F.col("o_orderkey") % 60 != 0)
    )
    wh = _tf.mkdtemp(prefix="incr_")
    try:
        t = LakeCatalog(wh).create_table(
            "ns", "orders_incr", batch1.schema, identifier_fields=["o_orderkey"]
        )
        t.append(batch1)
        first = t.metadata().current_snapshot_id
        t.append(batch2)
        inc = t.incremental_scan(spark, from_snapshot_id=first)
        return (
            inc.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("price").cast("double").alias("total_price"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (Catalyst's native strategy for it)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@_register(
    "setops_customer_status",
    """
    SELECT 'open_not_full' AS kind, count(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'open_and_full' AS kind, count(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
    )
    """,
)
def setops_customer_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    full_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    ex = open_c.exceptAll(full_c).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("open_not_full").alias("kind"), "n")
    inter = open_c.intersect(full_c).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("open_and_full").alias("kind"), "n"
    )
    return ex.unionByName(inter)


@_register(
    "rollup_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP (absent in the reference, free in
    Spark — SURVEY.md §2.3 ⊘ row)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@_register(
    "pivot_user_event_matrix",
    f"""
    SELECT user_id,
           {', '.join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def pivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES
    ]
    return out.select(*cols)


@_register(
    "asof_last_click_before_purchase",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, {_TS_US} AS ts,
             max(CASE WHEN event_type = 'click' THEN {_TS_US} END)
               OVER (PARTITION BY user_id ORDER BY {_TS_US} ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM events
    )
    SELECT event_id AS purchase_event_id, user_id,
           strftime(last_click_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_at
    FROM ordered WHERE event_type = 'purchase'
    """,
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — composed as a conditional
    running max over an event-time window; same plan shape scales as a
    single per-key sort, no cross join)."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_click_at"
            ),
        )
    )


@_register(
    "interval_join_attribution",
    f"""
    WITH c AS (
      SELECT user_id, event_id AS click_event_id, {_TS_US} AS cts
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_event_id, {_TS_US} AS pts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, click_event_id, purchase_event_id
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND p.pts >= c.cts
     AND p.pts <= c.cts + INTERVAL 30 MINUTE
    """,
)
def interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (attribution) join: every (click, purchase) pair of the
    same user within 30 minutes — the BATCH face of the stream-stream
    watermarked join (streaming/windows.interval_join): the identical
    operator backfills history as a range join and runs live with bounded
    state.  The oracle restates the range join directly."""
    from .streaming.windows import interval_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return interval_join(clicks, purchases, max_gap="30 minutes").select(
        F.col("l.user_id"), "click_event_id", "purchase_event_id"
    )


@_register(
    "asof_join_purchases_clicks",
    f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, {_TS_US} AS ts FROM events
    ), purchases AS (
      SELECT user_id, ts, event_id AS purchase_event_id FROM ev
      WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, max(event_id) AS click_event_id FROM ev
      WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.purchase_event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_at,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_at,
           c.click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_join_purchases_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class as-of join operator (operators/temporal.asof_join: union +
    single per-key window pass, no conditional join) checked against
    DuckDB's native ASOF JOIN. Right side deduped to one row per (key, ts)
    so tie-breaking is engine-independent."""
    from .operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_event_id")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(purchases, clicks, ["user_id"], "ts", "ts")
    return out.select(
        "purchase_event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_at"),
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_at"),
        F.col("click_event_id_right").alias("click_event_id"),
    )


@_register(
    "range_join_order_overlaps",
    """
    WITH iv AS (
      SELECT o_custkey, o_orderkey,
             epoch(o_orderdate) AS s, epoch(o_orderdate) + 604800 AS e
      FROM orders WHERE o_custkey % 10 = 0
    )
    SELECT a.o_custkey, count(*) AS n_overlapping_pairs
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.o_custkey
    """,
)
def range_join_order_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-overlap) join via bucketing (operators/temporal.
    range_join): 7-day order windows of the same customer that overlap.
    The oracle is the naive non-equi join — same pairs, different plan."""
    from .operators.temporal import range_join

    iv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.unix_timestamp(F.col("o_orderdate").cast("timestamp")).alias("s"),
            (F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) + 604800).alias("e"),
        )
    )
    left = iv.select("o_custkey", F.col("o_orderkey").alias("k_a"), "s", "e")
    right = iv.select(
        "o_custkey",
        F.col("o_orderkey").alias("k_b"),
        F.col("s").alias("rs"),
        F.col("e").alias("re"),
    )
    pairs = range_join(
        left, right, ["o_custkey"], "s", "e", "rs", "re", bucket_width=604800
    ).filter(F.col("k_a") < F.col("k_b"))
    return pairs.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_overlapping_pairs")
    )


@_register(
    "sessionize_events",
    f"""
    WITH ordered AS (
      SELECT user_id, {_TS_US} AS ts, event_id,
             lag({_TS_US}) OVER (PARTITION BY user_id
                                 ORDER BY {_TS_US} ASC, event_id ASC) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id, event_id,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, count(*) AS session_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id, count(*) AS n_sessions, max(session_events) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + cumulative-sum windows —
    the batch twin of streaming session_window(ts, gap)."""
    ev = _events(spark, sf_dir)
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_cum = w_lag.rowsBetween(Window.unboundedPreceding, 0)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w_lag).isNull()
            | (
                F.col("ts").cast("double") - F.lag("ts").over(w_lag).cast("double")
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("session_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("session_events").alias("max_session_events"),
    )


# =====================================================================
# Training-data wave 2: remaining dedup families + similarity variants
# =====================================================================


# RETIRED from the driver registry in r15 (cap swap for
# cluster_strict_split_pairs — VERDICT r14 item 6): the n-gram Jaccard
# family keeps full driver coverage via minhash_near_dup (bands +
# Jaccard verification over the same shingle machinery) and
# containment_near_dup (the asymmetric variant with the PPJoin prefix
# filter); exact-set verification on LSH-pruned candidates is precisely
# what those gates verify.  The function stays: pytest pins it against
# its DuckDB oracle (tests/test_entry.py::
# test_retired_ngram_jaccard_gate_still_matches_its_oracle) and SURVEY
# §2.9 records the retirement.
_NGRAM_JACCARD_PAIRS_ORACLE = f"""
    WITH tk AS (
      SELECT doc_id AS doc, {_TOKENS_SQL} AS t FROM documents
    ), shingles AS (
      -- duckdb list slices are inclusive: t[i:i+1] is a 2-token shingle
      SELECT DISTINCT doc, array_to_string(t[i:i+1], ' ') AS g
      FROM tk, UNNEST(range(1, greatest(len(t) - 1, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+1], ' ') <> ''
    ), sizes AS (
      SELECT doc, count(*) AS n FROM shingles GROUP BY doc
    ), hashed AS (
      SELECT doc, seed, min(substr(md5(g), CAST(2*seed+1 AS INT), 16)) AS minhash
      FROM shingles, UNNEST(range(0, 8)) AS s(seed) GROUP BY doc, seed
    ), bands AS (
      SELECT doc, CAST(seed // 2 AS INT) AS band,
             string_agg(minhash, '|' ORDER BY minhash) AS band_val
      FROM hashed GROUP BY doc, CAST(seed // 2 AS INT)
    ), cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.band_val = b.band_val
      WHERE a.doc < b.doc
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS both
      FROM cand c
        JOIN shingles sa ON sa.doc = c.doc_a
        JOIN shingles sb ON sb.doc = c.doc_b AND sb.g = sa.g
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(i.both AS DOUBLE) / (za.n + zb.n - i.both), 4) AS jaccard
    FROM inter i JOIN sizes za ON za.doc = i.doc_a
                 JOIN sizes zb ON zb.doc = i.doc_b
    WHERE CAST(i.both AS DOUBLE) / (za.n + zb.n - i.both) >= 0.4
    """


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on LSH-pruned candidates: MinHash bands generate
    the candidate pairs (scales), then the true Jaccard is computed from the
    shingle sets only for those pairs."""
    from .functions.dedup import _doc_shingles, minhash_near_dup_pairs

    docs = _t(spark, sf_dir, "documents")
    shingles = _doc_shingles(docs, "text", "doc_id", 2).cache()
    cand = minhash_near_dup_pairs(
        docs, threshold=0.0, shingle_size=2, shingles=shingles
    ).select("doc_a", "doc_b")
    # per-doc shingle SET as one array row: the exact intersection then runs
    # in-row (array_intersect, codegen'd) on the LSH-pruned candidates only —
    # two doc-keyed joins instead of a shingle-level join + re-aggregation.
    # Scale-safe: the array is bounded by document length, never corpus size.
    sets = shingles.groupBy(F.col("doc")).agg(
        F.collect_set("tok").alias("gs"), F.count(F.lit(1)).alias("n")
    )
    sa = sets.select(F.col("doc").alias("doc_a"), F.col("gs").alias("ga"), F.col("n").alias("na"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("gs").alias("gb"), F.col("n").alias("nb"))
    jac = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("both", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jac_raw",
            F.col("both").cast("double") / (F.col("na") + F.col("nb") - F.col("both")),
        )
        .filter(F.col("jac_raw") >= 0.4)
    )
    return jac.select(
        "doc_a", "doc_b", F.round("jac_raw", 4).alias("jaccard")
    )


@_register(
    "containment_near_dup",
    f"""
    WITH tk AS (
      SELECT doc_id AS doc, {_TOKENS_SQL} AS t FROM documents
    ), sh AS (
      -- duckdb list slices are inclusive: t[i:i+4] is a 5-token shingle
      SELECT DISTINCT doc, array_to_string(t[i:i+4], ' ') AS tok
      FROM tk, UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+4], ' ') <> ''
    ), freq AS (
      SELECT tok, count(*) AS freq FROM sh GROUP BY tok
    ), ranked AS (
      SELECT s.doc, s.tok,
             row_number() OVER (PARTITION BY s.doc ORDER BY f.freq, s.tok) AS rn,
             count(*) OVER (PARTITION BY s.doc) AS sz
      FROM sh s JOIN freq f USING (tok)
    ), prefix AS (
      -- m = ceil(0.8*sz) matches needed => prefix is the sz-m+1 rarest
      SELECT doc, tok FROM ranked WHERE rn <= sz - ((4*sz + 4) // 5) + 1
    ), cand AS (
      SELECT DISTINCT p.doc AS doc_a, s.doc AS doc_b
      FROM prefix p JOIN sh s USING (tok) WHERE p.doc <> s.doc
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS inter_size
      FROM cand c
        JOIN sh sa ON sa.doc = c.doc_a
        JOIN sh sb ON sb.doc = c.doc_b AND sb.tok = sa.tok
      GROUP BY c.doc_a, c.doc_b
    ), sizes AS (
      SELECT doc, count(*) AS size_a FROM sh GROUP BY doc
    )
    SELECT i.doc_a, i.doc_b, i.inter_size, z.size_a,
           CAST(i.inter_size AS DOUBLE) / z.size_a AS containment
    FROM inter i JOIN sizes z ON z.doc = i.doc_a
    WHERE 5 * i.inter_size >= 4 * z.size_a
    """,
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric set-containment join (prefix filter): directed pairs
    where >=80% of doc_a's 5-token shingles appear in doc_b — the
    subset/quotation relationships symmetric Jaccard LSH can't see."""
    from .functions.containment import containment_pairs

    return containment_pairs(_t(spark, sf_dir, "documents"))


_BOILER = " all rights reserved terms of service apply worldwide"
_BOILER_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(concat(text,"
    f" '{_BOILER}')), '[^a-z0-9]+'), x -> x <> '')"
)


@_register(
    "containment_capped_near_dup",
    f"""
    WITH tk AS (
      SELECT doc_id AS doc, {_BOILER_TOKS_SQL} AS t
      FROM documents WHERE doc_id % 4 = 0
    ), sh0 AS (
      SELECT DISTINCT doc, array_to_string(t[i:i+4], ' ') AS tok
      FROM tk, UNNEST(range(1, greatest(len(t) - 4, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+4], ' ') <> ''
    ), cap AS (
      SELECT greatest(count(*) // 2, 1) AS k FROM tk
    ), kept AS (
      -- stop-shingles leave the universe BEFORE sizes/prefixes/verify
      SELECT tok, count(*) AS freq FROM sh0 GROUP BY tok
      HAVING count(*) <= (SELECT k FROM cap)
    ), sh AS (
      SELECT s.doc, s.tok FROM sh0 s JOIN kept USING (tok)
    ), ranked AS (
      SELECT s.doc, s.tok,
             row_number() OVER (PARTITION BY s.doc ORDER BY f.freq, s.tok) AS rn,
             count(*) OVER (PARTITION BY s.doc) AS sz
      FROM sh s JOIN kept f USING (tok)
    ), prefix AS (
      SELECT doc, tok FROM ranked WHERE rn <= sz - ((4*sz + 4) // 5) + 1
    ), cand AS (
      SELECT DISTINCT p.doc AS doc_a, s.doc AS doc_b
      FROM prefix p JOIN sh s USING (tok) WHERE p.doc <> s.doc
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS inter_size
      FROM cand c
        JOIN sh sa ON sa.doc = c.doc_a
        JOIN sh sb ON sb.doc = c.doc_b AND sb.tok = sa.tok
      GROUP BY c.doc_a, c.doc_b
    ), sizes AS (
      SELECT doc, count(*) AS size_a FROM sh GROUP BY doc
    )
    SELECT i.doc_a, i.doc_b, i.inter_size, z.size_a,
           CAST(i.inter_size AS DOUBLE) / z.size_a AS containment
    FROM inter i JOIN sizes z ON z.doc = i.doc_a
    WHERE 5 * i.inter_size >= 4 * z.size_a
    """,
)
def containment_capped_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle-capped containment join — the 100-TB boilerplate-skew
    escape hatch, oracle-checked: every doc carries a planted boilerplate
    footer whose pure-footer shingles appear corpus-wide; with
    ``max_shingle_freq = n_docs/2`` they leave the shingle universe
    BEFORE sizes are computed, so the join is the exact containment join
    over the filtered sets (functions/containment.py:56-74).  A semantics
    drift (cap applied after sizes, prefix ranks on unfiltered freq,
    verify over unfiltered sets) hash-mismatches against the oracle's
    filtered-universe replay."""
    from .functions.containment import containment_pairs

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 0)
        .withColumn("text", F.concat(F.col("text"), F.lit(_BOILER)))
    )
    # planning-scale: one count of the quarter-slice fixes the cap
    cap = max(docs.count() // 2, 1)
    return containment_pairs(docs, max_shingle_freq=cap)


@_register(
    "source_overlap_matrix",
    f"""
    WITH tk AS (
      SELECT source AS doc, {_TOKENS_SQL} AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc, array_to_string(t[i:i+2], ' ') AS tok
      FROM tk, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+2], ' ') <> ''
    ), sizes AS (
      SELECT doc, count(*) AS n FROM sh GROUP BY doc
    ), inter AS (
      SELECT a.doc AS source_a, b.doc AS source_b, count(*) AS inter_size
      FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc < b.doc
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.inter_size,
           za.n AS size_a, zb.n AS size_b,
           CAST(i.inter_size AS DOUBLE) / (za.n + zb.n - i.inter_size) AS jaccard,
           CAST(i.inter_size AS DOUBLE) / za.n AS containment_a,
           CAST(i.inter_size AS DOUBLE) / zb.n AS containment_b
    FROM inter i JOIN sizes za ON za.doc = i.source_a
                 JOIN sizes zb ON zb.doc = i.source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram contamination matrix: distinct-shingle
    intersection, Jaccard, and directed containments per source pair."""
    from .functions.corpus import source_overlap

    return source_overlap(_t(spark, sf_dir, "documents"))


@_register(
    "source_overlap_sketch",
    f"""
    WITH tk AS (
      SELECT source AS doc, {_TOKENS_SQL} AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc, array_to_string(t[i:i+2], ' ') AS tok
      FROM tk, UNNEST(range(1, greatest(len(t) - 2, 1) + 1)) AS u(i)
      WHERE array_to_string(t[i:i+2], ' ') <> ''
    ), sizes AS (
      SELECT doc, count(*) AS n FROM sh GROUP BY doc
    ), hx AS (
      SELECT DISTINCT doc,
             CAST(CAST(concat('0x', substr(md5(tok), 1, 15)) AS UBIGINT)
                  AS BIGINT) AS h
      FROM sh
    ), bounds AS (
      SELECT doc,
             CAST(least(floor(1.1805916207174113e+21 / n),
                        1.152921504606847e+18) AS BIGINT) AS bound
      FROM sizes
    ), ranked AS (
      SELECT hx.doc, h, row_number() OVER (PARTITION BY hx.doc ORDER BY h) AS rn
      FROM hx JOIN bounds ON bounds.doc = hx.doc WHERE h <= bound
    ), kept AS (
      SELECT doc, h FROM ranked WHERE rn <= 256
    ), theta AS (
      SELECT k.doc,
             CASE WHEN count(*) >= 256 THEN max(k.h)
                  ELSE min(b.bound) + 1 END AS theta
      FROM kept k JOIN bounds b ON b.doc = k.doc GROUP BY k.doc
    ), cstat AS (
      SELECT c.source_a, c.source_b, count(*) AS c,
             min(least(ta.theta, tb.theta)) AS theta_p
      FROM (
        SELECT a.doc AS source_a, b.doc AS source_b, a.h
        FROM kept a JOIN kept b ON a.h = b.h AND a.doc < b.doc
      ) c JOIN theta ta ON ta.doc = c.source_a
          JOIN theta tb ON tb.doc = c.source_b
      WHERE c.h < least(ta.theta, tb.theta)
      GROUP BY c.source_a, c.source_b
    ), abelow AS (
      SELECT s.source_a, s.source_b, count(*) AS na_t
      FROM cstat s JOIN kept k ON k.doc = s.source_a AND k.h < s.theta_p
      GROUP BY s.source_a, s.source_b
    ), bbelow AS (
      SELECT s.source_a, s.source_b, count(*) AS nb_t
      FROM cstat s JOIN kept k ON k.doc = s.source_b AND k.h < s.theta_p
      GROUP BY s.source_a, s.source_b
    )
    SELECT s.source_a, s.source_b,
           least(CAST(floor(CAST(s.c AS DOUBLE) * 1.152921504606847e+18
                            / s.theta_p) AS BIGINT), za.n, zb.n) AS inter_size,
           za.n AS size_a, zb.n AS size_b,
           s.c / (a.na_t + b.nb_t - s.c) AS jaccard,
           least(CAST(floor(CAST(s.c AS DOUBLE) * 1.152921504606847e+18
                            / s.theta_p) AS BIGINT), za.n, zb.n)
             / za.n AS containment_a,
           least(CAST(floor(CAST(s.c AS DOUBLE) * 1.152921504606847e+18
                            / s.theta_p) AS BIGINT), za.n, zb.n)
             / zb.n AS containment_b,
           true AS is_estimate
    FROM cstat s
      JOIN abelow a ON a.source_a = s.source_a AND a.source_b = s.source_b
      JOIN bbelow b ON b.source_a = s.source_a AND b.source_b = s.source_b
      JOIN sizes za ON za.doc = s.source_a
      JOIN sizes zb ON zb.doc = s.source_b
    """,
)
def source_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch contamination matrix — the thousands-of-sources
    scale path (functions/corpus.py _sketch_overlap): per-source 256-min
    sketches of 60-bit md5 hashes behind a deterministic threshold
    prefilter; the pair join touches k-row sketches, never raw shingles.
    Sizes exact, intersection columns estimates.  The oracle replays the
    whole sketch closed-form (hashing, threshold, k-min window, theta
    rule, below-theta counting, clamped estimator) — any drift in the
    sketch definition hash-mismatches."""
    from .functions.corpus import source_overlap

    return source_overlap(_t(spark, sf_dir, "documents"), sketch_k=256)


@_register(
    "quality_top_p_docs",
    f"""
    WITH feat AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n,
             len(list_distinct({_TOKENS_SQL})) AS nd,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             length(text) AS total
      FROM documents
    ), scored AS (
      SELECT doc_id,
             CAST(round((0.5 * (CAST(nd AS DOUBLE) / n)
                   + 0.3 * (CAST(least(n, 100) AS DOUBLE) / 100.0)
                   + 0.2 * (CAST(alpha AS DOUBLE) / total)) * 10000, 0)
                  AS BIGINT) AS milli
      FROM feat
    ), docs AS (
      SELECT d.doc_id, d.lang, s.milli
      FROM documents d JOIN scored s USING (doc_id)
    ), grp AS (
      SELECT lang, milli, CAST(sum(milli) AS BIGINT) AS mass
      FROM docs GROUP BY 1, 2
    ), cum AS (
      SELECT lang, milli,
             CAST(sum(mass) OVER (PARTITION BY lang ORDER BY milli DESC)
                  - mass AS BIGINT) AS mass_before,
             CAST(sum(mass) OVER (PARTITION BY lang) AS BIGINT) AS total_mass
      FROM grp
    ), sel AS (
      SELECT lang, milli FROM cum WHERE 5 * mass_before < 4 * total_mass
    )
    SELECT d.doc_id, d.lang, d.milli FROM docs d JOIN sel USING (lang, milli)
    """,
)
def quality_top_p_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) selection per language: highest-quality docs
    carrying 80% of the language's quality mass, boundary score group
    kept whole. Cutoff computed on the distinct-score distribution —
    no per-document window over a language."""
    from .functions.corpus import quality_top_p

    return quality_top_p(_t(spark, sf_dir, "documents"))


@_register(
    "embedding_cosine_near_dup",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 3) AS cosine
    FROM base a JOIN base b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    """,
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via blocked GEMM — exact, but
    never materializes the N² pair relation (see cosine_pairs_blocked)."""
    from .functions.similarity import cosine_pairs_blocked

    pairs = cosine_pairs_blocked(_t(spark, sf_dir, "embeddings"), threshold=0.45)
    return pairs.select("id_a", "id_b", F.round("cosine", 3).alias("cosine"))


@_register(
    "semantic_dedup_embeddings",
    """
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
      SELECT v,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
               AS cell
      FROM (SELECT vec_id, v FROM emb
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)
    ), scored AS (
      SELECT e.vec_id, c.cell, list_cosine_similarity(e.v, c.v) AS cos
      FROM emb e CROSS JOIN cent c
    ), assigned AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell ASC) AS rn
        FROM scored
      ) WHERE rn = 1
    ), pairs AS (
      SELECT b.vec_id AS id_b
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN emb ea ON ea.vec_id = a.vec_id
      JOIN emb eb ON eb.vec_id = b.vec_id
      WHERE list_cosine_similarity(ea.v, eb.v) >= 0.45
    )
    SELECT s.vec_id, s.cell, (r.id_b IS NULL) AS keep
    FROM assigned s
    LEFT JOIN (SELECT DISTINCT id_b FROM pairs) r ON s.vec_id = r.id_b
    """,
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (cluster, then drop in-cluster cosine
    near-dups keeping the lowest id).  Centroids are hash-picked
    deterministically, so the DuckDB oracle replays the full pipeline —
    centroid pick, argmax assignment (ties to lowest cell), in-cluster
    pairing, greedy keep — in plain SQL.  The engine runs it as one
    broadcast-GEMM assignment map + a per-cluster pairwise pass
    (functions/similarity.py:semantic_dedup)."""
    from .functions.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.45
    )


@_register(
    "vector_stream_semantic_pairs",
    """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
           round(list_cosine_similarity(a.v, b.v), 3) AS cosine
    FROM base a JOIN base b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 3) >= 0.45
    """,
)
def vector_stream_semantic_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the CONTINUOUS semantic-dedup loop
    (streaming/windows.run_vector_index_stream(pairs_dir=) — r13's
    flagship): the corpus streams into an initially-EMPTY IVFIndex in
    epochs through the feed's own per-trigger body
    (emit_vector_epoch_pairs — the exact code the StreamingQuery runs),
    and the union of the per-epoch pairs_dir output must equal the
    ONE-SHOT cosine near-dup pairs over the whole corpus: every pair
    has at least one endpoint that is new exactly once, so it is
    emitted exactly once — either in-batch (chunked exact GEMM) or
    new-vs-history (the index's own search, run here with n_probe =
    n_cells and a k above the corpus' max near-dup degree so the
    probe is exact, the oracle-checked mode).  Both sources threshold
    on the ROUNDED (3-decimal) cosine — one boundary, the knife-edge
    discipline from bitext margins.  The equivalence is also pinned
    against a live StreamingQuery + numpy oracle in
    tests/test_ann_index.py:test_vector_index_stream_pairs_semantic_dedup."""
    import shutil as _sh
    import tempfile as _tf

    from .functions.ann_index import IVFIndex
    from .lakehouse import LakeCatalog
    from .streaming.windows import emit_vector_epoch_pairs

    emb = _t(spark, sf_dir, "embeddings")
    wh = _tf.mkdtemp(prefix="vecstream_idx_")
    pairs_dir = _tf.mkdtemp(prefix="vecstream_pairs_")
    try:
        # train-then-add: codebook from the corpus, zero rows stored —
        # the stream-seeding shape (admit_rows=False)
        idx = IVFIndex.build(
            LakeCatalog(wh), "idx", "vec", emb, n_cells=8, admit_rows=False
        )
        n_epochs = 2  # one cold epoch (all in-batch) + one against history
        for e in range(n_epochs):
            batch = emb.filter(F.col("vec_id") % n_epochs == e)
            emit_vector_epoch_pairs(
                idx,
                batch,
                pairs_dir=pairs_dir,
                epoch_id=e,
                pair_threshold=0.45,
                pair_k=256,
                pair_n_probe=8,  # = n_cells: exact probe, no recall dial
                max_pair_batch_rows=200_000,
            )
            idx.add_batch(batch, epoch_id=e)
        # each pair lands in exactly one epoch (see docstring); the
        # defensive max() collapses nothing on exact-probe settings
        return (
            spark.read.parquet(pairs_dir)
            .groupBy("doc_a", "doc_b")
            .agg(F.max("cosine").alias("cosine"))
            .localCheckpoint(eager=True)  # safe after the tmp dirs go
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)
        _sh.rmtree(pairs_dir, ignore_errors=True)


@_register(
    "cluster_strict_split_pairs",
    """
    WITH eligible AS (
      SELECT doc_id, lang FROM documents
      WHERE lang IN (SELECT lang FROM documents
                     GROUP BY lang HAVING count(*) >= 2)
    ), ordered AS (
      SELECT doc_id, lang,
             lag(doc_id) OVER (PARTITION BY lang ORDER BY doc_id) AS prev_id
      FROM eligible
    ), surv AS (
      SELECT doc_id, lang,
             CASE WHEN prev_id IS NULL OR prev_id % 17 = 3
                  THEN 1 ELSE 0 END AS brk
      FROM ordered
      WHERE doc_id % 17 <> 3
    ), grp AS (
      SELECT doc_id, lang,
             sum(brk) OVER (PARTITION BY lang ORDER BY doc_id) AS g
      FROM surv
    )
    SELECT doc_id AS doc,
           min(doc_id) OVER (PARTITION BY lang, g) AS cluster_id
    FROM grp
    """,
)
def cluster_strict_split_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-split removal through the durable pairs log — r14's
    flagship semantic promoted to an oracle gate (r15 cap swap for the
    retired ngram_jaccard_pairs): per-lang doc chains (consecutive
    doc_ids linked — lag window) stream into a persistent
    ``ClusterIndex`` in two epochs writing the pairs log, the log is
    COMPACTED into the bucket-partitioned live-pairs table
    (``PairsLog`` — the r15 lifecycle), then every doc with
    ``doc_id % 17 == 3`` is erased with
    ``maintain(removed_docs=, pairs_log=)``: removing a mid-chain doc
    must genuinely disconnect its neighbors (each chain splits into
    maximal surviving runs, canonical = min run member).  The oracle
    states the same semantics closed-form: chain components after node
    removal are consecutive-survivor runs, a window-function
    computation DuckDB replays exactly — one-shot clustering of the
    surviving pairs, no recursion needed for chain graphs.

    The reference's delete contract never leaves ghost state either
    (BaseDeltaTaskWriter.java:60-71); at 100 TB the split stays
    component-sized: the compacted log is scanned bucket-PRUNED to the
    affected members' bucket set, never the raw epoch history."""
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql import Window

    from .functions.incremental import ClusterIndex, PairsLog
    from .lakehouse import LakeCatalog

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    # one lag-window pass, materialized once: each epoch filter below
    # would otherwise re-run the scan + window shuffle
    edges = (
        docs.select("doc_id", "lang")
        .withColumn("prev_id", F.lag("doc_id").over(w))
        .filter(F.col("prev_id").isNotNull())
        .select(
            F.col("prev_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
        )
        .localCheckpoint(eager=True)
    )
    wh = _tf.mkdtemp(prefix="strictsplit_wh_")
    pairs_dir = _tf.mkdtemp(prefix="strictsplit_pairs_")
    try:
        cat = LakeCatalog(wh)
        # 8 buckets: the gate's corpora are bench-scale — fewer
        # partition files per commit, identical pruning semantics
        idx = ClusterIndex.create(cat, "gate", "cl", partition_buckets=8)
        log = PairsLog.create(cat, "gate", "plog", partition_buckets=8)
        for e in range(2):
            # the stream feeds' shape: pairs land durably per epoch,
            # admission reads the durable copy back; epoch 0 is the
            # cold admission, epoch 1 merges against stored history
            batch = edges.filter(F.col("doc_b") % 2 == e)
            batch.write.mode("overwrite").parquet(f"{pairs_dir}/epoch={e}")
            idx.add_batch(
                spark.read.parquet(f"{pairs_dir}/epoch={e}"), epoch_id=e
            )
        log.compact(spark, pairs_dir)  # raw dirs fold; scan prunes by bucket
        removed = docs.filter(F.col("doc_id") % 17 == 3).select(
            F.col("doc_id").alias("doc")
        )
        idx.maintain(spark, removed_docs=removed, pairs_log=log)
        return (
            idx.resolve(spark)
            .select("doc", "cluster_id")
            .localCheckpoint(eager=True)  # safe after the tmp dirs go
        )
    finally:
        _sh.rmtree(wh, ignore_errors=True)
        _sh.rmtree(pairs_dir, ignore_errors=True)


# =====================================================================
# Wave 3: remaining §2 engine branches (soft delete, envelope parse,
# schema evolution) + deeper read-path coverage
# =====================================================================


@_register(
    "cdc_soft_delete_orders",
    """
    WITH merged AS (
      SELECT o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
             (o_orderkey % 20 = 3) AS __deleted
      FROM orders
    )
    SELECT o_orderstatus, __deleted, count(*) AS n,
           CAST(sum(price) AS DOUBLE) AS sum_price
    FROM merged GROUP BY o_orderstatus, __deleted
    """,
)
def cdc_soft_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 keep-deletes branch: delete events UPDATE the row in place (kept,
    flagged __deleted) instead of removing it — BaseDeltaTaskWriter.java:61-71,
    verified by IcebergChangeConsumerUpsertTest.java:69-73."""
    orders = _t(spark, sf_dir, "orders")
    price = _money(F.col("o_totalprice"))
    snapshot = orders.select(
        "o_orderkey", "o_orderstatus", price.alias("price"),
        F.lit("r").alias("__op"), F.lit(0).alias("__source_ts_ms"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 20 == 3).select(
        "o_orderkey", "o_orderstatus", price.alias("price"),
        F.lit("d").alias("__op"), F.lit(1).alias("__source_ts_ms"),
    )
    changes = dedup_batch(deletes, ["o_orderkey"], dedup_column="__source_ts_ms")
    merged = merge_dataframes(snapshot, changes, ["o_orderkey"], keep_deletes=True)
    return (
        merged.withColumn("__deleted", F.col("__op") == "d")
        .groupBy("o_orderstatus", "__deleted")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("double").alias("sum_price"),
        )
    )


_ENVELOPE_SAMPLE_VALUE = {
    "schema": {
        "type": "struct",
        "fields": [
            {"field": "o_orderkey", "type": "int64", "optional": False},
            {"field": "o_orderstatus", "type": "string", "optional": True},
            {"field": "o_totalprice", "type": "double", "optional": True},
            {
                "field": "o_orderdate",
                "type": "int64",
                "optional": True,
                "name": "io.debezium.time.Timestamp",
            },
            {"field": "__op", "type": "string", "optional": True},
        ],
    },
    "payload": {},
}
_ENVELOPE_SAMPLE_KEY = {
    "schema": {
        "type": "struct",
        "fields": [{"field": "o_orderkey", "type": "int64", "optional": False}],
    },
    "payload": {},
}


@_register(
    "cdc_envelope_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           strftime(max(date_trunc('second', o_orderdate)), '%Y-%m-%d %H:%M:%S') AS max_orderdate
    FROM orders GROUP BY o_orderstatus
    """,
)
def cdc_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+P4 end-to-end: rows serialized into Debezium JSON envelopes
    (epoch-millis temporal wire form), schema inferred from a sample event
    (JsonSchemaConverter parity), then parsed back columnar with from_json +
    normalization expressions — the whole ingest front-end as one query."""
    from .sources.debezium_json import infer_event_schema, parse_events

    orders = _t(spark, sf_dir, "orders")
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice"),
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_orderdate"),
            F.lit("r").alias("__op"),
        )
    )
    raw = orders.select(
        F.lit("srv.public.orders").alias("destination"),
        F.to_json(F.struct(F.col("o_orderkey"))).alias("key"),
        F.concat(F.lit('{"payload":'), payload, F.lit("}")).alias("value"),
    )
    inferred = infer_event_schema(_ENVELOPE_SAMPLE_VALUE, _ENVELOPE_SAMPLE_KEY)
    typed = parse_events(raw, inferred)
    return typed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_money(F.col("o_totalprice"))).cast("double").alias("sum_price"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_orderdate"),
    )


@_register(
    "cdc_struct_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           strftime(max(date_trunc('second', o_orderdate)), '%Y-%m-%d %H:%M:%S') AS max_orderdate
    FROM orders WHERE o_orderkey % 100 = 0 AND o_orderkey < 4000000
    GROUP BY o_orderstatus
    """,
)
def cdc_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 end-to-end: one bounded engine batch of Connect-Struct events
    (typed Python values — datetime, Decimal — standing in for Kafka Connect
    Structs) through StructSchemaConverter + the wire serializer + the
    columnar parse, then aggregated.  The driver-side batch is the format's
    contract: the embedded engine hands the consumer at most max.batch.size
    in-memory Structs per batch (BatchConfig.java:16-18); everything after
    ``struct_events_to_df`` is distributed."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    from .sources.connect_struct import (
        ConnectSchema as CS,
        StructEvent,
        parse_struct_events,
    )

    vschema = CS.struct(
        [
            ("o_orderkey", CS.primitive("int64", optional=False)),
            ("o_orderstatus", CS.primitive("string")),
            ("o_totalprice", CS.primitive(
                "bytes", name="org.apache.kafka.connect.data.Decimal",
                parameters={"scale": "2", "connect.decimal.precision": "18"})),
            ("o_orderdate", CS.primitive(
                "int64", name="io.debezium.time.MicroTimestamp")),
            ("__op", CS.primitive("string", optional=False)),
        ],
        name="Value",
    )
    kschema = CS.struct([("o_orderkey", CS.primitive("int64", optional=False))])
    # key-bounded fixture batch: deterministic at every sf (unlike limit)
    # and caps the driver-side collect at ~40k rows even at sf10+
    batch = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") % 100 == 0) & (F.col("o_orderkey") < 4_000_000))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .collect()
    )
    events = [
        StructEvent(
            "srv.public.orders",
            {"o_orderkey": r["o_orderkey"]},
            {
                "o_orderkey": r["o_orderkey"],
                "o_orderstatus": r["o_orderstatus"],
                "o_totalprice": _Dec(str(r["o_totalprice"])),
                "o_orderdate": r["o_orderdate"],
                "__op": "r",
            },
            kschema,
            vschema,
        )
        for r in batch
    ]
    conv = DebeziumSchemaConverter(decimal_handling_mode="precise")
    typed, _ = parse_struct_events(spark, events, conv)
    return typed.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_totalprice").cast("double").alias("sum_price"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_orderdate"),
    )


@_register(
    "cdc_schema_evolution",
    """
    WITH unioned AS (
      SELECT o_orderstatus,
             CASE WHEN year(o_orderdate) >= 1997 THEN o_orderpriority END AS pri,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    )
    SELECT o_orderstatus, count(*) AS n, count(pri) AS n_with_priority,
           min(pri) AS min_priority,
           CAST(sum(price) AS DOUBLE) AS sum_price
    FROM unioned GROUP BY o_orderstatus
    """,
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W14 union-by-name evolution: an early event wave lacking a column is
    conformed to the merged (widened) schema with null fill, then unioned
    with the later wave — IcebergTableOperator.java:136-151 re-expressed as
    merge_schemas + conform_to_schema."""
    from .operators.project import conform_to_schema
    from .schema.evolution import merge_schemas

    orders = _t(spark, sf_dir, "orders")
    price = _money(F.col("o_totalprice"))
    wave1 = orders.filter(F.year("o_orderdate") < 1997).select(
        "o_orderkey", "o_orderstatus", price.alias("price")
    )
    wave2 = orders.filter(F.year("o_orderdate") >= 1997).select(
        "o_orderkey", "o_orderstatus", price.alias("price"),
        F.col("o_orderpriority").alias("pri"),
    )
    merged_schema = merge_schemas(wave1.schema, wave2.schema)
    unioned = conform_to_schema(wave1, merged_schema).unionByName(
        conform_to_schema(wave2, merged_schema)
    )
    return unioned.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("pri").alias("n_with_priority"),
        F.min("pri").alias("min_priority"),
        F.sum("price").cast("double").alias("sum_price"),
    )


@_register(
    "token_count_bpe",
    """
    WITH p AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS pieces
      FROM documents
    )
    SELECT doc_id, len(pieces) AS n_pieces,
           len(list_filter(pieces, x -> regexp_matches(x, '^[a-z]+$'))) AS n_word_pieces,
           len(list_filter(pieces, x -> regexp_matches(x, '^[0-9]+$'))) AS n_digit_pieces,
           len(pieces)
             - len(list_filter(pieces, x -> regexp_matches(x, '^[a-z]+$')))
             - len(list_filter(pieces, x -> regexp_matches(x, '^[0-9]+$'))) AS n_symbol_pieces
    FROM p
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.text import bpe_token_count

    return bpe_token_count(_t(spark, sf_dir, "documents"))


@_register(
    "json_props_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON functions (§2.5): get_json_object over the props column —
    the same path the engine uses for variant-mode fields."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "events_sliding_counts",
    f"""
    WITH base AS (
      SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v,
             epoch_us({_TS_US}) AS us
      FROM events
    ), assigned AS (
      SELECT event_type, v,
             make_timestamp((us // 1800000000 - shift) * 1800000000) AS win_start
      FROM base, UNNEST([0, 1]) s(shift)
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS window_start, event_type,
           count(*) AS n, CAST(sum(v) AS DOUBLE) AS sum_value
    FROM assigned GROUP BY window_start, event_type
    """,
)
def events_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows, T6 extension: 1-hour windows every 30
    minutes — each event lands in exactly two. Same plan serves
    readStream; the oracle states the window assignment arithmetic
    directly."""
    from .streaming.windows import sliding_counts

    ev = _events(spark, sf_dir).withColumn("value", _val4(F.col("value")))
    out = sliding_counts(ev, "1 hour", "30 minutes")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@_register(
    "variant_props_extract",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark VariantType path (format-v3 variant mode): parse_json into a
    variant column, extract typed values with variant_get — same results the
    JSON-text oracle computes, proving the two carriers agree."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json(F.col("props")).alias("props_v"))
    k = F.variant_get(F.col("props_v"), "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "decontaminate_docs",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 != 0
      UNION ALL
      -- leaked eval examples: benchmark docs re-enter the training corpus
      -- under new ids (doc_id % 3 = 0 third of the benchmark)
      SELECT doc_id + 10000000 AS doc_id, text FROM documents
      WHERE doc_id % 97 = 0 AND doc_id % 3 = 0
    ), btoks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id % 97 = 0
    ), bench AS (
      SELECT DISTINCT array_to_string(t[i.i + 1 : i.i + 8], ' ') AS g
      FROM btoks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    ), ttoks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM corpus
    ), grams AS (
      SELECT doc_id, array_to_string(t[i.i + 1 : i.i + 8], ' ') AS g
      FROM ttoks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    )
    SELECT grams.doc_id, count(DISTINCT g) AS n_hits
    FROM grams JOIN bench USING (g)
    GROUP BY grams.doc_id
    """,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (training-data leakage filter): flag
    training docs sharing any word 8-gram with the benchmark set.  Every
    97th doc stands in for an eval set, and a third of it is planted back
    into the training corpus under new ids — the leaked examples the
    operator MUST flag (n_hits = their full distinct-gram count), so an
    empty result can never pass vacuously.  The corpus side is one narrow
    (id, md5(gram)) explode in the scan stage; the benchmark's distinct
    gram hashes broadcast, so the plan is scan -> explode -> broadcast
    join -> per-doc count at any corpus size."""
    from .functions.text import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    leaked = bench.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"), "text"
    )
    train = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "text")
        .unionByName(leaked)
    )
    return decontaminate(train, bench, n=8)


@_register(
    "decontaminate_bloom_docs",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 != 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text FROM documents
      WHERE doc_id % 97 = 0 AND doc_id % 3 = 0
    ), btoks AS (
      SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents WHERE doc_id % 97 = 0
    ), bench AS (
      SELECT DISTINCT array_to_string(t[i.i + 1 : i.i + 8], ' ') AS g
      FROM btoks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    ), ttoks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM corpus
    ), grams AS (
      SELECT doc_id, array_to_string(t[i.i + 1 : i.i + 8], ' ') AS g
      FROM ttoks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    )
    SELECT grams.doc_id, count(DISTINCT g) AS n_hits
    FROM grams JOIN bench USING (g)
    GROUP BY grams.doc_id
    """,
)
def decontaminate_bloom_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered decontamination: the SAME leakage contract as
    ``decontaminate_docs`` (same planted-leak construction, same oracle —
    the bloom is a prefilter whose false positives the verifying join
    removes, so results are bit-identical to the exact operator), but the
    100-TB plan kills non-candidate grams inside the scan stage via
    ``might_contain`` on a broadcast ``bloom_filter_agg`` scalar instead
    of streaming every corpus gram into the join."""
    from .functions.text import decontaminate_bloom

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    leaked = bench.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"), "text"
    )
    train = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "text")
        .unionByName(leaked)
    )
    return decontaminate_bloom(train, bench, n=8)


@_register(
    "dsir_importance_weights",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ), grams AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(array_to_string(t[i.i + 1 : i.i + 2], ' ')), 1, 8))
                       AS UBIGINT) % 4096 AS BIGINT) AS b
      FROM toks, unnest(range(len(t) - 1)) AS i(i)
      WHERE len(t) >= 2
    ), rawg AS (
      SELECT doc_id, b FROM grams WHERE doc_id % 97 <> 0
    ), tgtg AS (
      SELECT doc_id, b FROM grams WHERE doc_id % 97 = 0
    ), rc AS (
      SELECT b, count(*) AS r_b FROM rawg GROUP BY b
    ), tc AS (
      SELECT b, count(*) AS t_b FROM tgtg GROUP BY b
    ), tot AS (
      SELECT (SELECT count(*) FROM rawg) AS r_tot,
             (SELECT count(*) FROM tgtg) AS t_tot
    ), sc AS (
      SELECT COALESCE(rc.b, tc.b) AS b,
             CAST((CAST(1000000 AS HUGEINT) * (COALESCE(t_b, 0) + 1)
                   * (r_tot + 4096))
                  // (CAST(COALESCE(r_b, 0) + 1 AS HUGEINT) * (t_tot + 4096))
                  AS BIGINT) AS s
      FROM rc FULL JOIN tc ON rc.b = tc.b, tot
    )
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(s) AS BIGINT) AS weight,
           CAST(sum(s) AS BIGINT) / count(*) AS weight_per_gram
    FROM rawg g JOIN sc ON sc.b = g.b
    GROUP BY g.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (hashed-bigram likelihood ratios vs a
    target domain — the every-97th-doc eval split doubles as the target):
    the data-SELECTION face of the curation family, complementing the
    quality (gopher/top-p) and balance (unimax/mixture) faces.  Integer
    score contract in decimal/hugeint — the oracle reproduces every
    weight bit-for-bit, so a drift in bucketing, smoothing, or the
    ratio arithmetic hash-mismatches."""
    from .functions.curation import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=2,
    )


@_register(
    "bm25_topk_docs",
    f"""
    WITH docs0 AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ), stats AS (
      SELECT count(*) AS n, sum(len(t)) AS tt FROM docs0
    ), q AS (
      SELECT doc_id AS qid, list_slice(t, 1, 8) AS qt
      FROM docs0 WHERE doc_id % 101 = 7 AND doc_id < 5051 AND len(t) >= 1
    ), qterms AS (
      SELECT DISTINCT qid, term FROM q, unnest(qt) AS u(term)
    ), terms AS (
      SELECT DISTINCT term FROM qterms
    ), postings AS (
      SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
      FROM (SELECT doc_id, len(t) AS dl, term
            FROM docs0, unnest(t) AS u(term)) tok
      JOIN terms USING (term)
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM postings GROUP BY term
    ), scored AS (
      SELECT qt.qid, p.doc_id,
             CAST(sum(
               (CAST(1000000 AS HUGEINT) * (2 * s.n - 2 * d.df + 1)
                * (22 * p.tf) * s.tt)
               // (CAST(2 * d.df + 1 AS HUGEINT)
                   * (10 * s.tt * p.tf + 3 * s.tt + 9 * p.dl * s.n))
             ) AS BIGINT) AS score
      FROM qterms qt
      JOIN postings p USING (term)
      JOIN dfreq d USING (term), stats s
      GROUP BY qt.qid, p.doc_id
    )
    SELECT qid AS query_id, rank, doc_id, score FROM (
      SELECT qid, doc_id, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval: every 101st document (id-capped so the
    batch is ~50 queries at every SF — a production query batch is
    workload-sized, not corpus-sized; uncapped, the gate's cost grows
    queries x corpus = quadratically in SF) contributes its first 8
    tokens as a query; the engine builds posting lists for exactly the
    queried terms and ranks the corpus under the integer BM25 contract
    (``functions/retrieval.py`` — rational idf, cleared denominators,
    DECIMAL(38,0)/HUGEINT), so the oracle reproduces every score
    bit-for-bit.  The lexical face of the similarity family — the
    dense face is the ann_* gates."""
    from .functions.retrieval import bm25_topk
    from .functions.text import tokens_col

    docs = _t(spark, sf_dir, "documents")
    queries_df = (
        docs.filter((F.col("doc_id") % 101 == 7) & (F.col("doc_id") < 5051))
        .select(
            F.col("doc_id").alias("query_id"),
            F.slice(tokens_col(F.col("text")), 1, 8).alias("terms"),
        )
        .filter(F.size("terms") >= 1)
    )
    return bm25_topk(docs, queries_df, k=5)


def _pagerank_oracle(iterations: int = 4) -> str:
    base = """
    WITH nodes AS (SELECT doc_id AS node FROM documents),
    cnt AS (SELECT count(*) AS n FROM nodes),
    edges AS (
      SELECT node AS src,
             CAST(CAST(concat('0x', substr(md5(concat(CAST(node AS VARCHAR),
                                                      ':', CAST(j AS VARCHAR))),
                                           1, 8)) AS UBIGINT)
                  % (SELECT n FROM cnt) AS BIGINT) AS dst
      FROM nodes, unnest([0, 1, 2]) AS t(j)
    ),
    r0 AS (SELECT node, CAST(1000000000000 AS HUGEINT) AS r FROM nodes)"""
    step = """,
    r{k} AS (
      SELECT n.node, CAST(150000000000 AS HUGEINT) + COALESCE(i.inc, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, sum((p.r * 17) // 60) AS inc
        FROM edges e JOIN r{prev} p ON p.node = e.src
        GROUP BY e.dst
      ) i ON i.node = n.node
    )"""
    sql = base
    for k in range(1, iterations + 1):
        sql += step.format(k=k, prev=k - 1)
    sql += f"""
    SELECT node AS doc_id, CAST(r AS BIGINT) AS pr_scaled FROM r{iterations}
    """
    return sql


@_register("pagerank_link_graph", _pagerank_oracle(4))
def pagerank_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-centrality quality prior: 4 fixed-point PageRank iterations
    over the deterministic md5-derived link graph (out-degree 3) on the
    documents corpus.  Integer mass contract (``functions/graph.py``) —
    the oracle unrolls the iterations as chained CTEs and reproduces
    every rank exactly, so a drift in damping, teleport, edge
    derivation, or the floor arithmetic hash-mismatches."""
    from .functions.graph import pagerank

    return pagerank(_t(spark, sf_dir, "documents"), iterations=4)


@_register(
    "decontaminate_fuzzy_docs",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, text
      FROM documents WHERE doc_id % 97 = 0 AND doc_id % 3 = 0
    ), btoks AS (
      SELECT {_TOKENS_SQL} AS t FROM documents WHERE doc_id % 97 = 0
    ), bench AS (
      SELECT DISTINCT md5(array_to_string(t[i.i + 1 : i.i + 8], ' ')) AS h
      FROM btoks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    ), ttoks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM corpus
    ), grams AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(t[i.i + 1 : i.i + 8], ' ')) AS h
      FROM ttoks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(b.h) AS BIGINT) AS n_hits,
           10 * count(b.h) >= 2 * count(*) AS flagged
    FROM grams g LEFT JOIN bench b ON b.h = g.h
    GROUP BY g.doc_id
    """,
)
def decontaminate_fuzzy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination: the same planted-leak construction as
    ``decontaminate_docs`` (every-97th-doc eval split; every 3rd eval
    doc re-inserted into training under doc_id+10M), but scoring every
    training doc's distinct-8-gram overlap FRACTION and flagging at the
    20% integer threshold — the production-shaped contract (GPT-3/PaLM
    era pipelines threshold high-order n-gram overlap rather than
    zero-tolerance matching).  Planted leaks score 100% and are
    flagged; organic boilerplate overlap stays below threshold, which
    the zero-tolerance operator cannot distinguish."""
    from .functions.text import contamination_fraction

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    leaked = bench.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"), "text"
    )
    train = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "text")
        .unionByName(leaked)
    )
    return contamination_fraction(train, bench, n=8)


@_register(
    "ann_filtered_topk",
    """
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 10
    ), scored AS (
      SELECT q.qid, b.vec_id AS cid,
             list_cosine_similarity(q.qv, b.v) AS cos
      FROM base b, q WHERE b.vec_id != q.qid AND b.label % 3 = 1
    ), ranked AS (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid ASC) AS rank
      FROM scored
    )
    SELECT qid AS query_id, rank, cid AS neighbor_id, round(cos, 3) AS cosine
    FROM ranked WHERE rank <= 5
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: exact top-k cosine neighbors restricted
    to candidates satisfying a metadata predicate (``label % 3 = 1``)
    — filter-THEN-search semantics, the standard vector-store feature
    (post-filtering would under-fill k).  The predicate applies in the
    scan projection ahead of the Arrow GEMM stage; queries are looked
    up unfiltered, so a query need not satisfy the predicate."""
    from .functions.similarity import cosine_topk

    return cosine_topk(
        _t(spark, sf_dir, "embeddings"),
        query_ids=list(range(10)),
        k=5,
        candidate_filter=F.col("label") % 3 == 1,
    )


_PQ_CTES = """
    WITH pts AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), seeds AS (
      SELECT vec_id AS code_id, v FROM pts ORDER BY vec_id LIMIT 16
    ), sub AS (
      SELECT vec_id, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS sv
      FROM pts, unnest(range(8)) AS t(s)
    ), cent AS (
      SELECT code_id, s, list_slice(v, s * 8 + 1, s * 8 + 8) AS sc
      FROM seeds, unnest(range(8)) AS t(s)
    ), scored AS (
      SELECT sub.vec_id, sub.s, cent.code_id,
             list_sum(list_transform(range(1, 9),
                      i -> (sub.sv[i] - cent.sc[i]) * (sub.sv[i] - cent.sc[i])))
               AS d2
      FROM sub JOIN cent USING (s)
    ), codes AS (
      SELECT vec_id, s, code_id FROM (
        SELECT vec_id, s, code_id,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, code_id) AS rn
        FROM scored) WHERE rn = 1
    )"""


@_register(
    "pq_encode_codes",
    _PQ_CTES
    + """
    SELECT vec_id, CAST(s AS INTEGER) AS subspace, code_id AS code FROM codes
    """,
)
def pq_encode_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: every 64-dim embedding compressed
    to 8 one-byte codes (64x) against the deterministic seed codebooks
    (``functions/pq.py``).  Distances are the exact kmeans-contract
    sequential folds, so the argmin needs no rounding and the oracle
    replays every code assignment bit-for-bit; the argmin itself is a
    ``min_by`` partial aggregate, not a window sort."""
    from .functions.pq import pq_encode

    return pq_encode(_t(spark, sf_dir, "embeddings"), dim=64).select(
        "vec_id", F.col("_s").alias("subspace"), "code"
    )


@_register(
    "pq_adc_topk",
    _PQ_CTES
    + """
    , qsub AS (
      SELECT vec_id AS qid, s, sv FROM sub WHERE vec_id < 10
    ), lut AS (
      SELECT qsub.qid, qsub.s, cent.code_id AS code,
             list_sum(list_transform(range(1, 9),
                      i -> (qsub.sv[i] - cent.sc[i]) * (qsub.sv[i] - cent.sc[i])))
               AS qd2
      FROM qsub JOIN cent USING (s)
    ), adc AS (
      SELECT l.qid, c.vec_id, round(sum(l.qd2), 4) AS adc_dist2
      FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code_id
      WHERE c.vec_id != l.qid
      GROUP BY l.qid, c.vec_id
    ), ranked AS (
      SELECT qid, vec_id, adc_dist2,
             row_number() OVER (PARTITION BY qid
                                ORDER BY adc_dist2 ASC, vec_id ASC) AS rank
      FROM adc
    )
    SELECT qid AS query_id, rank, vec_id AS neighbor_id, adc_dist2
    FROM ranked WHERE rank <= 5
    """,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: queries stay raw,
    candidates are the 8-byte codes, scores come from a broadcast
    per-query lookup table — the memory-bound ANN scan (IVF prunes
    which vectors, PQ shrinks what is read; compose for IVF-PQ).  The
    rounded-sum + (score, id) ordering is the one float aggregation in
    the pipeline (oracle-parity rounding rule); everything upstream is
    exact."""
    from .functions.pq import pq_adc_topk

    return pq_adc_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=list(range(10)), k=5, dim=64
    )


@_register("ann_ivf_incremental_topk", None)  # oracle assigned below
def ann_ivf_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE face of the persistent IVF index: build on the
    even half of the corpus (codebook frozen there), ``add_batch`` the
    odd half against the frozen codebook, then search with exhaustive
    probing — exact, so the whole incremental path (assignment GEMM,
    cell-partitioned append commit, post-append manifest planning) is
    checked by the same brute-force oracle as the one-shot index.  The
    incremental-index pattern matches ``functions/incremental.py``
    (minhash) and ``SubstringIndex``: batch update ≡ rebuild."""
    import shutil as _sh
    import tempfile as _tf

    from .functions.ann_index import IVFIndex
    from .lakehouse import LakeCatalog

    emb = _t(spark, sf_dir, "embeddings")
    wh = _tf.mkdtemp(prefix="ivf_incr_")
    try:
        idx = IVFIndex.build(
            LakeCatalog(wh), "ann", "ivf", emb.filter(F.col("vec_id") % 2 == 0),
            n_cells=8,
        )
        idx.add_batch(emb.filter(F.col("vec_id") % 2 == 1))
        return idx.search(
            spark, query_ids=list(range(10)), k=5, n_probe=8
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


_ORACLES["ann_ivf_incremental_topk"] = _ORACLES["ann_cosine_topk"]


@_register(
    "hard_negative_mining",
    """
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS qid, label AS ql, v AS qv FROM base WHERE vec_id < 10
    ), scored AS (
      SELECT q.qid, b.vec_id AS cid, b.label AS cl,
             list_cosine_similarity(q.qv, b.v) AS cos
      FROM base b, q WHERE b.vec_id != q.qid AND b.label != q.ql
    ), ranked AS (
      SELECT qid, cid, cl, cos,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, cid ASC) AS rank
      FROM scored
    )
    SELECT qid AS query_id, rank, cid AS neighbor_id, cl AS neighbor_label,
           round(cos, 3) AS cosine
    FROM ranked WHERE rank <= 5
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the 5
    MOST similar vectors of a DIFFERENT label — the negative-selection
    step of embedding/reranker training (near-miss negatives carry the
    gradient; random negatives are trivial).  The per-query label mask
    applies inside the Arrow GEMM stage BEFORE the local top-k
    pre-prune (``functions/similarity.py:hard_negatives``) — a static
    candidate filter cannot express it, and post-search filtering would
    under-fill k exactly when a query's neighborhood is dominated by
    its own class."""
    from .functions.similarity import hard_negatives

    return hard_negatives(
        _t(spark, sf_dir, "embeddings"), query_ids=list(range(10)), k=5
    )


_BM25_FUSE_CTES = f"""
    WITH docs0 AS (
      SELECT doc_id, {{tokens}} AS t FROM documents
    ), stats AS (
      SELECT count(*) AS n, sum(len(t)) AS tt FROM docs0
    ), q AS (
      SELECT doc_id AS qid, list_slice(t, 1, 8) AS qt
      FROM docs0 WHERE doc_id % 101 = 7 AND doc_id < 5051 AND len(t) >= 1
    ), qterms AS (
      SELECT DISTINCT qid, term FROM q, unnest(qt) AS u(term)
    ), terms AS (
      SELECT DISTINCT term FROM qterms
    ), postings AS (
      SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
      FROM (SELECT doc_id, len(t) AS dl, term
            FROM docs0, unnest(t) AS u(term)) tok
      JOIN terms USING (term)
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM postings GROUP BY term
    ), bscored AS (
      SELECT qt.qid, p.doc_id,
             CAST(sum(
               (CAST(1000000 AS HUGEINT) * (2 * s.n - 2 * d.df + 1)
                * (22 * p.tf) * s.tt)
               // (CAST(2 * d.df + 1 AS HUGEINT)
                   * (10 * s.tt * p.tf + 3 * s.tt + 9 * p.dl * s.n))
             ) AS BIGINT) AS score
      FROM qterms qt
      JOIN postings p USING (term)
      JOIN dfreq d USING (term), stats s
      WHERE p.doc_id != qt.qid
      GROUP BY qt.qid, p.doc_id
    ), blim AS (
      SELECT qid, doc_id, rank FROM (
        SELECT qid, doc_id,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score DESC, doc_id ASC) AS rank
        FROM bscored)
      WHERE rank <= 20
    ), ebase AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), dq AS (
      SELECT b.vec_id AS qid, b.v AS qv
      FROM ebase b JOIN (SELECT DISTINCT qid FROM q) s ON s.qid = b.vec_id
    ), dscored AS (
      SELECT dq.qid, b.vec_id AS did,
             list_cosine_similarity(dq.qv, b.v) AS cos
      FROM ebase b, dq WHERE b.vec_id != dq.qid
    ), dlim AS (
      SELECT qid, did, rank FROM (
        SELECT qid, did,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY cos DESC, did ASC) AS rank
        FROM dscored)
      WHERE rank <= 20
    )"""


@_register(
    "hybrid_rrf_retrieval",
    _BM25_FUSE_CTES.format(tokens=_TOKENS_SQL)
    + """
    , contrib AS (
      SELECT qid, doc_id AS did, 1000000 // (60 + rank) AS c FROM blim
      UNION ALL
      SELECT qid, did, 1000000 // (60 + rank) AS c FROM dlim
    ), fused AS (
      SELECT qid, did, CAST(sum(c) AS BIGINT) AS rrf_score
      FROM contrib GROUP BY qid, did
    ), franked AS (
      SELECT qid, did, rrf_score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY rrf_score DESC, did ASC) AS rank
      FROM fused
    )
    SELECT qid AS query_id, rank, did AS doc_id, rrf_score
    FROM franked WHERE rank <= 10
    """,
)
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 (lexical, self-excluded, top-20) and dense
    cosine (top-20 over the aligned embedding space) fused by
    reciprocal-rank fusion under the integer floor(1e6/(60+rank))
    contract (``functions/retrieval.py:rrf_fuse``) — the production
    RAG/search combiner, needing no score calibration across systems.
    Queries are every 101st document up to the id cap (the same
    bounded ~50-query batch as ``bm25_topk_docs`` — workload-sized,
    not corpus-sized), first 8 tokens lexically and its embedding
    densely.  The oracle replays both retrievers AND the fusion
    bit-for-bit."""
    from .functions.retrieval import bm25_topk, rrf_fuse
    from .functions.similarity import cosine_topk
    from .functions.text import tokens_col

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qdf = (
        docs.filter((F.col("doc_id") % 101 == 7) & (F.col("doc_id") < 5051))
        .select(
            F.col("doc_id").alias("query_id"),
            F.slice(tokens_col(F.col("text")), 1, 8).alias("terms"),
        )
        .filter(F.size("terms") >= 1)
    )
    lex = bm25_topk(docs, qdf, k=20, exclude_self=True)
    # query-batch id fetch: bounded by the workload size, not the corpus
    qids = [r["query_id"] for r in qdf.select("query_id").collect()]
    dense = cosine_topk(emb, qids, k=20).select(
        "query_id", "rank", F.col("neighbor_id").alias("doc_id")
    )
    return rrf_fuse([lex.select("query_id", "rank", "doc_id"), dense], k=10)


@_register("ann_ivfpq_topk", None)  # oracle assigned below (exhaustive probe)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composition with n_probe = n_cells: exhaustive probing
    makes the result exactly the pure-ADC scan, so the brute-force-over-
    codes oracle checks the whole composed machinery — coarse assignment
    GEMM, the codes-to-cells id join (the index-build join at scale),
    probe pruning, and the per-cell ADC.  ``n_probe < n_cells`` is the
    approximate production mode (pytest covers recall)."""
    from .functions.pq import ivfpq_adc_topk

    return ivfpq_adc_topk(
        _t(spark, sf_dir, "embeddings"),
        query_ids=list(range(10)),
        k=5,
        dim=64,
        n_cells=8,
        n_probe=8,
    )


_ORACLES["ann_ivfpq_topk"] = _ORACLES["pq_adc_topk"]


@_register("ann_ivfpq_index_topk", None)  # oracle assigned below
def ann_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTENT IVF-PQ (VERDICT r10 item 4): codes stored
    cell-partitioned in a lakehouse table, so the one-shot
    ``ivfpq_adc_topk``'s corpus x corpus codes-to-cells join never
    exists — the build is ONE Arrow pass (cell + m codes per vector)
    and a search is a partition-pruned file scan + two broadcast joins
    (probes, ADC LUT) + one partial-agg sum.  Incremental face included:
    build on vec_id < 16 (exactly the PQ seed set — the 16 lowest ids —
    so the frozen codebooks equal the full-corpus ones), ``add_batch``
    the rest against them; batch update == rebuild.  Exhaustive probing
    makes the result exactly the pure ADC
    scan — the brute-force-over-codes oracle (``functions/ann_index.py:
    IVFPQIndex``; query-time no-corpus-join is plan-pinned in
    ``tests/test_plans.py``)."""
    import shutil as _sh
    import tempfile as _tf

    import numpy as np

    from .functions.ann_index import IVFPQIndex
    from .lakehouse import LakeCatalog

    emb = _t(spark, sf_dir, "embeddings")
    qids = list(range(10))
    q_rows = (
        emb.filter(F.col("vec_id").isin(qids))
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in q_rows
    }
    qmat = np.array([by_id[q] for q in qids])
    wh = _tf.mkdtemp(prefix="ivfpq_idx_")
    try:
        idx = IVFPQIndex.build(
            LakeCatalog(wh), "ann", "ivfpq",
            emb.filter(F.col("vec_id") < 16), dim=64, n_cells=8,
        )
        idx.add_batch(emb.filter(F.col("vec_id") >= 16))
        return idx.search(
            spark, qids, qmat, k=5, n_probe=8
        ).localCheckpoint(eager=True)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


_ORACLES["ann_ivfpq_index_topk"] = _ORACLES["pq_adc_topk"]


def _bpe_oracle(n_merges: int, final: str) -> str:
    """Chained-CTE DuckDB replay of the BPE trainer
    (``functions/bpe.py``): per iteration — adjacent-pair counts, the
    (count DESC, left, right) argmax, and the greedy merge via the
    integer window-parity rule (running candidate count -> consecutive-
    run group -> odd row_number within run), byte-identical to Spark's
    windows.  ``final`` selects either the merge table or the vocab
    head."""
    sql = f"""
    WITH words AS (
      SELECT w, count(*) AS cnt
      FROM (SELECT unnest({{tokens}}) AS w FROM documents)
      GROUP BY w
    ), s0 AS (
      SELECT w, cnt, i.i AS pos, substr(w, i.i + 1, 1) AS sym
      FROM words, unnest(range(length(w))) AS i(i)
    )"""
    step = """,
    pc{k} AS (
      SELECT sym AS a, nxt AS b, sum(cnt) AS tot
      FROM (SELECT w, cnt, sym,
                   lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
            FROM s{prev})
      WHERE nxt IS NOT NULL GROUP BY a, b
    ), pick{k} AS (
      SELECT a, b, tot FROM pc{k} ORDER BY tot DESC, a ASC, b ASC LIMIT 1
    ), t{k} AS (
      SELECT s.w, s.cnt, s.pos, s.sym,
             lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos) AS nxt,
             p.a, p.b
      FROM s{prev} s, pick{k} p
    ), c{k} AS (
      SELECT *, (sym = a AND nxt = b) AS c,
             sum(CASE WHEN sym = a AND nxt = b THEN 1 ELSE 0 END)
               OVER (PARTITION BY w ORDER BY pos) AS crn
      FROM t{k}
    ), r{k} AS (
      SELECT *, row_number() OVER (
               PARTITION BY w, CASE WHEN c THEN pos - crn END
               ORDER BY pos) AS rn2
      FROM c{k}
    ), d{k} AS (
      SELECT *, c AND rn2 % 2 = 1 AS chosen,
             coalesce(lag(c AND rn2 % 2 = 1)
                      OVER (PARTITION BY w ORDER BY pos), false) AS dropped
      FROM r{k}
    ), s{k} AS (
      SELECT w, cnt,
             row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
             CASE WHEN chosen THEN a || b ELSE sym END AS sym
      FROM d{k} WHERE NOT dropped
    )"""
    for k in range(1, n_merges + 1):
        sql += step.format(k=k, prev=k - 1)
    return sql + final


@_register(
    "bpe_train_merges",
    _bpe_oracle(
        4,
        """
    SELECT 1 AS step, a AS left_sym, b AS right_sym,
           CAST(tot AS BIGINT) AS pair_count FROM pick1
    UNION ALL SELECT 2, a, b, CAST(tot AS BIGINT) FROM pick2
    UNION ALL SELECT 3, a, b, CAST(tot AS BIGINT) FROM pick3
    UNION ALL SELECT 4, a, b, CAST(tot AS BIGINT) FROM pick4
    """,
    ).format(tokens=_TOKENS_SQL),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016): the first 4 merge
    rules learned from the corpus word-frequency table, each the
    argmax adjacent symbol pair under (count DESC, left, right)
    tie-breaking.  The corpus is scanned once; iterations run over the
    vocabulary relation with single-word window partitions
    (``functions/bpe.py`` — greedy overlap resolution via the integer
    window-parity rule, no UDFs).  The oracle unrolls all 4 iterations
    as chained CTEs, so a drift in pair counting, argmax tie-breaks, or
    greedy merge application hash-mismatches."""
    from .functions.bpe import bpe_train

    merges, _ = bpe_train(_t(spark, sf_dir, "documents"), n_merges=4)
    return merges


@_register(
    "bpe_vocab_after_merges",
    _bpe_oracle(
        4,
        """
    , counts AS (
      SELECT sym, CAST(sum(cnt) AS BIGINT) AS total FROM s4 GROUP BY sym
    ), vranked AS (
      SELECT sym, total,
             row_number() OVER (ORDER BY total DESC, sym ASC) AS rank
      FROM counts
    )
    SELECT rank, sym, total FROM vranked WHERE rank <= 30
    """,
    ).format(tokens=_TOKENS_SQL),
)
def bpe_vocab_after_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned-vocabulary head after the 4 BPE merges: top-30
    subword symbols by weighted frequency over all word types — checks
    the final merge APPLICATION (which ``bpe_train_merges`` alone
    cannot see: the last rule's application feeds no further pair
    count).  Exact two-phase top-n, no single-partition global sort of
    the symbol table."""
    from .functions.bpe import bpe_train, bpe_vocab

    _, symbols = bpe_train(_t(spark, sf_dir, "documents"), n_merges=4)
    return bpe_vocab(symbols, top_n=30)


@_register(
    "bpe_encode_docs",
    _bpe_oracle(
        4,
        """
    , wl AS (
      SELECT w, count(*) AS nsub FROM s4 GROUP BY w
    ), tok AS (
      SELECT doc_id, unnest({tokens}) AS w FROM documents
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(nsub) AS BIGINT) AS n_subtokens,
           CAST(sum(length(w)) AS BIGINT) AS n_chars
    FROM tok JOIN wl USING (w)
    GROUP BY doc_id
    """,
    ).format(tokens=_TOKENS_SQL),
)
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization under the trained BPE model (the inference
    side of ``bpe_train``): per-doc word / subtoken / char counts —
    the token-budget numbers every pipeline reports (fertility =
    n_subtokens/n_words, compression = n_chars/n_subtokens).  The
    merge application is paid once per word TYPE; the corpus pass is
    one explode + vocabulary join + per-doc aggregate
    (``functions/bpe.py:bpe_encode``).  The oracle replays training
    AND encoding, so drift anywhere in the merge chain or the
    type-table join hash-mismatches."""
    from .functions.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    _, symbols = bpe_train(docs, n_merges=4)
    return bpe_encode(docs, symbols)


@_register(
    "quality_classifier_filter",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ), feats AS (
      SELECT doc_id, g FROM (
        SELECT doc_id, unnest(t) AS g FROM toks
        UNION ALL
        SELECT doc_id, array_to_string(t[i.i + 1 : i.i + 2], ' ') AS g
        FROM toks, unnest(range(len(t) - 1)) AS i(i)
        WHERE len(t) >= 2
      )
    ), occ AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT)
                  % 4096 AS BIGINT) AS bucket
      FROM feats
    ), wt AS (
      SELECT b.b AS bucket,
             CAST(CAST(concat('0x', substr(md5(CAST(b.b AS VARCHAR)), 1, 8))
                       AS UBIGINT) % 101 AS BIGINT) - 50 + 3 AS weight
      FROM (SELECT unnest(range(4096)) AS b) b
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
           CAST(sum(weight) AS BIGINT) AS margin,
           CAST(sum(weight) AS BIGINT) > 0 AS keep
    FROM occ JOIN wt USING (bucket)
    GROUP BY doc_id
    """,
)
def quality_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style model-based quality filtering: hashing-trick
    features (unigrams + word bigrams, md5 % 4096 buckets) scored
    against a broadcast integer weight table, keep = margin > 0 —
    the learned-model face of the filtering stage (rule-based face:
    ``gopher_rules_filter``).  The stand-in weights are md5-derived so
    the oracle replays featureization, lookup, and margin bit-for-bit;
    production swaps in a learned (bucket, weight) table unchanged
    (``functions/classifier.py``)."""
    from .functions.classifier import quality_classifier

    return quality_classifier(_t(spark, sf_dir, "documents"))


@_register(
    "bigram_logprob_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ), grams AS (
      SELECT doc_id, t[i.i + 1] AS w1,
             array_to_string(t[i.i + 1 : i.i + 2], ' ') AS pair
      FROM toks, unnest(range(len(t) - 1)) AS i(i)
      WHERE len(t) >= 2
    ), pc AS (
      SELECT pair, count(*) AS c12 FROM grams GROUP BY pair
    ), cc AS (
      SELECT w1, count(*) AS c1 FROM grams GROUP BY w1
    ), v AS (
      SELECT count(DISTINCT tok) AS vs
      FROM (SELECT unnest(t) AS tok FROM toks)
    )
    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-log2(CAST(c12 + 1 AS DOUBLE)
                           / CAST(c1 + vs AS DOUBLE))), 4)
             AS mean_neg_log2_prob
    FROM grams g JOIN pc USING (pair) JOIN cc USING (w1), v
    GROUP BY g.doc_id
    """,
)
def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency scoring (KenLM-proxy): add-one-smoothed
    conditional bigram negative log2 probability, averaged per doc —
    catches alien WORD ORDER that the unigram perplexity proxy
    (``unigram_logprob_docs``) cannot see.  Adjacency is built
    in-array inside the scan stage (no window shuffle); count tables
    are partial-agg bounded by corpus bigram/vocab diversity
    (``functions/curation.py:bigram_logprob_score``)."""
    from .functions.curation import bigram_logprob_score

    return bigram_logprob_score(_t(spark, sf_dir, "documents"))


@_register(
    "bitext_mining_pairs",
    """
    WITH base AS (
      SELECT vec_id, label % 2 AS side, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % 4 = 0
    ), src AS (
      SELECT vec_id AS sid, v FROM base WHERE side = 0
    ), tgt AS (
      SELECT vec_id AS tid, v FROM base WHERE side = 1
    ), allc AS (
      SELECT s.sid, t.tid, list_cosine_similarity(s.v, t.v) AS cos
      FROM src s, tgt t
    ), sknn AS (
      SELECT sid, tid, cos, row_number() OVER (
        PARTITION BY sid ORDER BY cos DESC, tid ASC) AS r
      FROM allc
    ), tknn AS (
      SELECT sid, tid, cos, row_number() OVER (
        PARTITION BY tid ORDER BY cos DESC, sid ASC) AS r
      FROM allc
    ), savg AS (
      SELECT sid, avg(cos) AS avg_s FROM sknn WHERE r <= 4 GROUP BY sid
    ), tavg AS (
      SELECT tid, avg(cos) AS avg_t FROM tknn WHERE r <= 4 GROUP BY tid
    ), cand AS (
      SELECT k.sid, k.tid, k.cos,
             k.cos / ((s.avg_s + t.avg_t) / 2) AS m
      FROM sknn k JOIN savg s USING (sid) JOIN tavg t USING (tid)
      WHERE k.r <= 4
    ), best AS (
      SELECT sid, tid, cos, m, row_number() OVER (
        PARTITION BY sid ORDER BY round(m, 3) DESC, tid ASC) AS rn
      FROM cand
    )
    SELECT sid AS src_id, tid AS tgt_id,
           round(cos, 3) AS cosine, round(m, 3) AS margin
    FROM best WHERE rn = 1 AND round(m, 3) > 1.0
    """,
)
def bitext_mining_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk / CCMatrix): pair
    "source-language" and "target-language" vectors (label parity
    stands in for language over the shared embedding space; every 4th
    vector participates) when the pair's cosine stands out against
    both sides' k=4 neighborhood averages — margin > 1, forward
    selection.  Cross-lingual kNN runs as block GEMM with block-local
    top-k pushdown (``functions/bitext.py``); the oracle replays kNN,
    both neighborhood averages, the margin, and the argmax."""
    from .functions.bitext import bitext_margin_pairs

    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 4 == 0)
        .select("vec_id", "embedding", (F.col("label") % 2).alias("pair_side"))
    )
    return bitext_margin_pairs(emb, lang_col="pair_side", k=4, threshold=1.0)


@_register(
    "winnowing_fingerprint_docs",
    """
    WITH s0 AS (
      SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
      FROM documents
    ), grams AS (
      SELECT doc_id, i.i + 1 AS pos,
             CAST(CAST(concat('0x', substr(md5(substr(s, i.i + 1, 5)), 1, 8))
                       AS UBIGINT) AS BIGINT) AS h
      FROM s0, unnest(range(length(s) - 5 + 1)) AS i(i)
      WHERE length(s) >= 8
    ), wm AS (
      SELECT doc_id, pos AS wstart,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
             count(*) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS cnt
      FROM grams
    ), sel AS (
      SELECT w.doc_id, w.wstart, w.mh AS h, max(g.pos) AS p
      FROM wm w JOIN grams g
        ON g.doc_id = w.doc_id
       AND g.pos BETWEEN w.wstart AND w.wstart + 3
       AND g.h = w.mh
      WHERE w.cnt = 4
      GROUP BY w.doc_id, w.wstart, w.mh
    ), fps AS (
      SELECT DISTINCT doc_id, p, h FROM sel
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(h) AS BIGINT) AS fp_checksum
    FROM fps GROUP BY doc_id
    """,
)
def winnowing_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints per document: char-5-gram hashes,
    window w=4 minima with rightmost-tie selection, deduped on
    (hash, position) — the LOCAL-guarantee fingerprint (any shared
    substring of length >= 8 chars is caught), complementing the
    bottom-k sketch (``doc_fingerprint``).  Entirely in-array in the
    scan projection — zero shuffles before the per-doc summary row
    (``functions/text.py:winnowing_fingerprints``).  The oracle
    replays gram hashing, window minima, the rightmost-tie rule, and
    the checksum row-for-row."""
    from .functions.text import winnowing_fingerprints

    return winnowing_fingerprints(_t(spark, sf_dir, "documents"), k=5, w=4)


@_register(
    "cms_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT unnest({_TOKENS_SQL}) AS t FROM documents
    ), cells AS (
      SELECT j.j AS row,
             CAST(CAST(concat('0x', substr(md5(j.j || ':' || t), 1, 8))
                       AS UBIGINT) % 1024 AS BIGINT) AS bucket
      FROM toks, unnest([0, 1, 2]) AS j(j)
    ), sketch AS (
      SELECT row, bucket, count(*) AS counter FROM cells GROUP BY row, bucket
    ), counts AS (
      SELECT t AS token, count(*) AS exact_count FROM toks GROUP BY t
    ), top AS (
      SELECT token, exact_count,
             row_number() OVER (ORDER BY exact_count DESC, token ASC) AS rank
      FROM counts QUALIFY rank <= 20
    ), addressed AS (
      SELECT p.rank, p.token, p.exact_count, j.j AS row,
             CAST(CAST(concat('0x', substr(md5(j.j || ':' || p.token), 1, 8))
                       AS UBIGINT) % 1024 AS BIGINT) AS bucket
      FROM top p, unnest([0, 1, 2]) AS j(j)
    )
    SELECT a.rank, a.token, CAST(a.exact_count AS BIGINT) AS exact_count,
           CAST(min(s.counter) AS BIGINT) AS cms_estimate
    FROM addressed a JOIN sketch s USING (row, bucket)
    GROUP BY a.rank, a.token, a.exact_count
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation: the exact top-20 tokens
    with their CMS estimates alongside — completes the sketch family
    (bloom = membership, KMV = cardinality/overlap, CMS = frequency)
    and is the fixed-memory path when the vocabulary outgrows an exact
    aggregate.  d=3 seeded md5 hash rows x w=1024 buckets built in one
    partial-agg corpus pass; estimates via broadcast of the ~KB sketch;
    est >= exact by construction (``functions/cms.py``).  Exact-integer
    contract throughout — the oracle rebuilds the sketch bit-for-bit."""
    from .functions.cms import cms_heavy_hitters as _cms

    return _cms(_t(spark, sf_dir, "documents"))


@_register(
    "retention_cohorts",
    f"""
    WITH uw AS (
      SELECT DISTINCT user_id,
             date_trunc('week', {_TS_US}) AS wk
      FROM events
    ), first AS (
      SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cohort, u.wk) // 7 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM uw u JOIN first f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis — the standard product-analytics
    rollup (users grouped by first-activity week; how many are still
    active N weeks later), complementing the funnel and sessionization
    gates on the events surface.  Shapes: one distinct on (user, week)
    (partial-agg), one per-user min, one keyed join (AQE's call — both
    sides are user-cardinality), one final aggregate.  (user, week)
    rows are unique by construction, so the cohort cell count is a
    plain count, never count_distinct."""
    ev = _events(spark, sf_dir)
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        uw.join(first, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@_register(
    "event_transition_matrix",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY {_TS_US}, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event
    sequences (ordered by ts, event_id tie-break) — the behavioral
    n-gram table behind next-action models and anomaly scoring.  One
    shuffle partitions by user for the lead() window, one partial-agg
    shuffle for the (from, to) counts.  Skew note for 100 TB: a bot
    user with 10^8 events makes its window partition a single task;
    the standard mitigation is pre-bucketing the key to (user, day)
    and accepting the loss of cross-midnight transitions (or stitching
    boundaries with a second tiny pass) — human-scale sequences need
    neither."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@_register(
    "triangle_count_graph",
    """
    WITH nodes AS (SELECT doc_id AS node FROM documents),
    cnt AS (SELECT count(*) AS n FROM nodes),
    dedges AS (
      SELECT node AS src,
             CAST(CAST(concat('0x', substr(md5(concat(CAST(node AS VARCHAR),
                                                      ':', CAST(j AS VARCHAR))),
                                           1, 8)) AS UBIGINT)
                  % (SELECT n FROM cnt) AS BIGINT) AS dst
      FROM nodes, unnest([0, 1, 2]) AS t(j)
    ), und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM dedges WHERE src != dst
    ), tri AS (
      SELECT w1.a, w1.b AS m, w2.b AS c
      FROM und w1
      JOIN und w2 ON w2.a = w1.b
      JOIN und w3 ON w3.a = w1.a AND w3.b = w2.b
    ), corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT m FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    """,
)
def triangle_count_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the (undirected) md5-derived
    link graph — link-farm / community-density features alongside the
    PageRank quality prior (same derived graph, same edge contract).
    Wedge join + closure join, every side merge-pinned (exploded-scan
    relations: the estimate-lies-by-fanout broadcast OOM class)
    (``functions/graph.py:triangle_counts``).  The oracle re-derives
    the edges and counts triangles by the same a < b < c enumeration."""
    from .functions.graph import derived_link_graph, triangle_counts

    edges, _ = derived_link_graph(_t(spark, sf_dir, "documents"))
    return triangle_counts(edges)


@_register(
    "epoch_plan_sources",
    f"""
    WITH w AS (
      SELECT source, CAST(sum(len({_TOKENS_SQL})) AS HUGEINT)
               AS tokens_available
      FROM documents GROUP BY source
    ), r AS (
      SELECT source, tokens_available,
             CAST(floor(sqrt(CAST(tokens_available AS DOUBLE))) AS HUGEINT)
               AS rs
      FROM w
    ), tot AS (
      SELECT sum(tokens_available) AS t, sum(rs) AS den FROM r
    ), plan AS (
      SELECT source, CAST(tokens_available AS BIGINT) AS tokens_available,
             CAST((t * 1 // 2) * rs // den AS BIGINT) AS alloc_tokens
      FROM r, tot
    )
    SELECT source, tokens_available, alloc_tokens,
           CAST((alloc_tokens + tokens_available - 1)
                // tokens_available AS BIGINT) AS epochs,
           (alloc_tokens + tokens_available - 1) // tokens_available > 1
             AS oversampled
    FROM plan
    """,
)
def epoch_plan_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-recipe epoch planning: temperature-flattened (alpha = 1/2)
    token allocations for a half-corpus budget and the repeat-pass
    (epoch) count each source needs — the oversampling plan a LLaMA-
    style data card publishes.  Exact integer contract throughout
    (floor(sqrt) is exact below 2^52; allocations in decimal/hugeint);
    one partial-agg groupBy + broadcast totals, output one row per
    source (``functions/curation.py:epoch_plan``)."""
    from .functions.curation import epoch_plan

    return epoch_plan(_t(spark, sf_dir, "documents"))


@_register(
    "random_projection_embed",
    f"""
    WITH dims AS (
      SELECT i.i AS i, j.j AS j,
             CASE WHEN CAST(concat('0x', substr(md5(i.i || ':' || j.j), 1, 1))
                       AS INT) % 2 = 0 THEN 1 ELSE -1 END AS s
      FROM (SELECT unnest(range(64)) AS i) i,
           (SELECT unnest(range(16)) AS j) j
    ), vecs AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT vec_id, CAST(d.j AS INT) AS j,
           round(sum(v[d.i + 1] * d.s) * 0.25, 4) + 0.0 AS c
    FROM vecs, dims d GROUP BY vec_id, d.j
    """,
)
def random_projection_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection 64 -> 16 dims (Achlioptas
    2003): the cheap pre-reduction before clustering/coarse-quantizing
    an embedding column at scale.  The +-1 matrix is an md5-derived
    constant folded into the plan; the projection is a pure in-array
    expression — zero shuffles.  1/sqrt(16) = 0.25 keeps the scale
    factor exactly representable; the oracle re-derives every sign and
    component (``functions/similarity.py:random_projection``).

    ``random_projection()`` returns ``(vec_id, proj array<double>)``
    for production use; the GATE posexplodes to scalar ``(vec_id, j,
    c)`` rows because the driver's canonicalizer hashes scalar columns
    only (every other registered gate already emits scalars — pinned by
    ``tests/test_entry.py::test_gate_outputs_are_scalar_typed``)."""
    from .functions.similarity import random_projection

    proj = random_projection(_t(spark, sf_dir, "embeddings"), d_out=16, d_in=64)
    return proj.select(
        "vec_id", F.posexplode("proj").alias("j", "c")
    ).select("vec_id", F.col("j").cast("int").alias("j"), "c")


def _hex8_to_int(expr: str) -> str:
    """SQL expression decoding the first 8 hex chars of md5 text ``expr``
    to a non-negative integer (DuckDB has no hex->int cast)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({expr}, {c + 1}, 1)) - 1) "
        f"* {16 ** (7 - c)}"
        for c in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def _ann_recall_oracle(n_planes: int = 4, seed: int = 42, k: int = 5) -> str:
    """Recall@k oracle: replays BOTH retrievers — the exact top-k and
    the full-semantics LSH pipeline (same CTE structure as
    ``_lsh_topk_oracle``) — then counts the per-query intersection."""
    comp = _hex8_to_int(f"md5(concat({seed}, ':', p.p, ':', i.i))")
    return f"""
    WITH dims AS (
      SELECT max(len(embedding)) AS d FROM embeddings
    ), planes AS (
      SELECT p.p AS p, i.i AS i,
             ({comp} / 2147483647.0) - 1.0 AS comp
      FROM range({n_planes}) AS p(p), dims, unnest(range(dims.d)) AS i(i)
    ), dots AS (
      SELECT e.vec_id, pl.p,
             sum(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.comp) AS dot
      FROM embeddings e, planes pl
      GROUP BY e.vec_id, pl.p
    ), sigs AS (
      SELECT vec_id,
             string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM dots GROUP BY vec_id
    ), base AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, s.bucket
      FROM embeddings e JOIN sigs s USING (vec_id)
    ), q AS (
      SELECT vec_id AS qid, v AS qv, bucket FROM base WHERE vec_id < 10
    ), ascored AS (
      SELECT q.qid, b.vec_id AS cid,
             list_cosine_similarity(q.qv, b.v) AS cos
      FROM base b JOIN q ON b.bucket = q.bucket AND b.vec_id != q.qid
    ), aranked AS (
      SELECT qid, cid, row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
      FROM ascored
    ), ap AS (
      SELECT qid, cid FROM aranked WHERE rank <= {k}
    ), escored AS (
      SELECT q.qid, b.vec_id AS cid,
             list_cosine_similarity(q.qv, b.v) AS cos
      FROM base b, q WHERE b.vec_id != q.qid
    ), eranked AS (
      SELECT qid, cid, row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
      FROM escored
    ), ex AS (
      SELECT qid, cid FROM eranked WHERE rank <= {k}
    ), hits AS (
      SELECT ex.qid, count(*) AS n_hits
      FROM ex JOIN ap ON ex.qid = ap.qid AND ex.cid = ap.cid
      GROUP BY ex.qid
    )
    SELECT q.qid AS query_id, {k} AS k,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
    FROM (SELECT DISTINCT qid FROM ex) q LEFT JOIN hits h USING (qid)
    """


@_register("ann_recall_eval", _ann_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH-bucketed approximate search against the
    exact GEMM top-k — the index-quality monitor that decides n_planes
    / n_probe retuning in production.  Integer contract (hit counts);
    the oracle replays the exact retriever, the FULL LSH pipeline
    (md5 planes, signatures, bucket join, in-bucket rerank), and the
    intersection (``functions/similarity.py:recall_at_k``)."""
    from .functions.similarity import cosine_topk, lsh_bucketed_topk, recall_at_k

    emb = _t(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, query_ids=list(range(10)), k=5)
    approx = lsh_bucketed_topk(emb, query_ids=list(range(10)), k=5, n_planes=4)
    return recall_at_k(exact, approx, k=5)


@_register(
    "exact_substring_dedup",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i.i + 1 : i.i + 8], ' ') AS g
      FROM toks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    ), shared AS (
      SELECT g FROM grams GROUP BY g HAVING count(*) > 1
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(s.g) AS BIGINT) AS n_shared,
           round(CAST(count(s.g) AS DOUBLE) / count(*), 4) AS shared_frac,
           (count(s.g) * 10 <= count(*) * 3) AS keep
    FROM grams g LEFT JOIN shared s ON g.g = s.g
    GROUP BY g.doc_id
    """,
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2022, word-window
    form): per document, the count of distinct 8-token windows occurring
    verbatim in another document, the shared fraction, and keep at a 0.3
    threshold (exact integer predicate).  Complements the approximate
    families (minhash/simhash/ngram-jaccard): this is the VERBATIM-copy
    detector — boilerplate, licenses, mirrored passages — that similarity
    thresholds can miss or over-fire on.  k-gram inversion plan: distinct
    (id, md5(window)) pairs, >1-doc windows via one hashed groupBy, AQE
    join back; no step carries text past the scan."""
    from .functions.dedup import exact_substring_profile

    return exact_substring_profile(_t(spark, sf_dir, "documents"), k=8)


@_register(
    "incremental_substring_profile",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i.i + 1 : i.i + 8], ' ') AS g
      FROM toks, unnest(range(len(t) - 7)) AS i(i)
      WHERE len(t) >= 8
    ), g1 AS (
      SELECT * FROM grams WHERE doc_id % 2 = 0
    ), shared1 AS (
      -- batch 1 lands on an empty index: shared iff >1 doc WITHIN batch 1
      SELECT g FROM g1 GROUP BY g HAVING count(*) > 1
    ), prof1 AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(s.g) AS BIGINT) AS n_shared,
             round(CAST(count(s.g) AS DOUBLE) / count(*), 4) AS shared_frac,
             (count(s.g) * 10 <= count(*) * 3) AS keep
      FROM g1 g LEFT JOIN shared1 s ON g.g = s.g
      GROUP BY g.doc_id
    ), shared2 AS (
      -- batch 2 probes history ∪ batch: shared iff >1 doc in the FULL corpus
      SELECT g FROM grams GROUP BY g HAVING count(*) > 1
    ), prof2 AS (
      SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(s.g) AS BIGINT) AS n_shared,
             round(CAST(count(s.g) AS DOUBLE) / count(*), 4) AS shared_frac,
             (count(s.g) * 10 <= count(*) * 3) AS keep
      FROM grams g LEFT JOIN shared2 s ON g.g = s.g
      WHERE g.doc_id % 2 = 1
      GROUP BY g.doc_id
    )
    SELECT * FROM prof1 UNION ALL SELECT * FROM prof2
    """,
)
def incremental_substring_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-substring index (functions/incremental.py
    SubstringIndex): documents arrive in two batches (doc_id parity);
    each batch's 8-token-window k-gram counts probe the persistent
    lakehouse inversion then append to it.  The contract under test:
    batch N's profile equals the one-shot operator over
    (history ∪ batch N) restricted to batch N's docs — so a recurring
    corpus refresh costs O(batch · matched grams), never a history
    re-scan.  The oracle replays both phases closed-form."""
    import shutil as _sh
    import tempfile as _tf

    from .functions.incremental import SubstringIndex
    from .lakehouse import LakeCatalog

    docs = _t(spark, sf_dir, "documents")
    wh = _tf.mkdtemp(prefix="substr_idx_")
    try:
        idx = SubstringIndex.create(LakeCatalog(wh), "idx", "grams", k=8)
        p1 = idx.add_batch(docs.filter(F.col("doc_id") % 2 == 0))
        p2 = idx.add_batch(docs.filter(F.col("doc_id") % 2 == 1))
        # in-gate scale assert (pruned_point_lookup pattern): a one-gram
        # probe reads ONE bucket's files of the bucket-partitioned
        # inversion — planning only, nothing appended, output untouched
        from .functions.incremental import (
            PBUCKET_COL,
            PBUCKETS_PROP,
            _pbucket_probe_values,
            pbucket_col,
        )
        from .functions.text import word_gram_hashes
        from .lakehouse.table import _prune_files_by_partition_values

        tiny = spark.createDataFrame(
            [(999_999_999, "eight plain tokens make exactly one probe gram")],
            "doc_id long, text string",
        )
        n_pb = int(idx.table.metadata().properties[PBUCKETS_PROP])
        pv = _pbucket_probe_values(
            idx.table,
            word_gram_hashes(tiny, 8, "text", "doc_id").withColumn(
                PBUCKET_COL, pbucket_col(F.col("_h"), n_pb)
            ),
        )
        all_files = idx.table.current_files()
        kept = _prune_files_by_partition_values(idx.table.metadata(), all_files, pv)
        assert pv and len(kept) < len(all_files), (
            f"probe scan not pruned: {len(kept)}/{len(all_files)} files"
        )
        return p1.unionByName(p2)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


@_register(
    "anti_customers_without_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    """,
)
def anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (filter pushed below the anti join)."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_money(F.col("c_acctbal"))).cast("double").alias("sum_acctbal"),
        )
    )


@_register(
    "decorrelated_above_avg",
    """
    WITH w AS (
      SELECT o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             count(*) OVER (PARTITION BY o_custkey) AS cnt,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS tot
      FROM orders
    )
    SELECT o_orderstatus, count(*) AS n_above
    FROM w WHERE p * cnt > CAST(1.5 AS DECIMAL(2,1)) * tot
    GROUP BY o_orderstatus
    """,
)
def decorrelated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated 'price > 1.5x my customer's average' decorrelated into a
    per-key window — the rewrite Catalyst itself applies to correlated
    scalar subqueries. Stated as p*cnt > 1.5*tot so both engines compare
    exact decimals (no float-division order dependence)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    p = _money(F.col("o_totalprice"))
    above = (
        orders.select("o_orderstatus", "o_custkey", p.alias("p"))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .withColumn("tot", F.sum("p").over(w))
        .filter(F.col("p") * F.col("cnt") > F.lit(1.5).cast("decimal(2,1)") * F.col("tot"))
    )
    return above.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_above"))


@_register(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@_register(
    "q19_or_of_ands",
    """
    SELECT count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicate over a join (q19 shape): Catalyst extracts the
    common p_partkey equi-key and pushes each brand/size conjunct to the
    part scan; part side broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            _money(F.col("l_extendedprice"))
            * (F.lit(1).cast("decimal(3,2)") - _rate(F.col("l_discount")))
        )
        .cast("double")
        .alias("revenue"),
    )


@_register(
    "string_functions_showcase",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
           levenshtein(c_name, 'Customer') AS lev_dist
    FROM customer WHERE c_custkey % 50 = 0
    """,
)
def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function surface (§2.5): case, substring, padding,
    regex replace, edit distance — all codegen'd built-ins."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 50 == 0)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").alias("name_len"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
            F.regexp_replace("c_name", "[0-9]", "#").alias("name_masked"),
            F.levenshtein(F.col("c_name"), F.lit("Customer")).alias("lev_dist"),
        )
    )


@_register(
    "date_functions_showcase",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS y, quarter(o_orderdate) AS q,
           month(o_orderdate) AS m, dayofmonth(o_orderdate) AS d,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00') AS days_to_1999,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders WHERE o_orderkey % 500 = 0
    """,
)
def date_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar temporal-function surface (§2.5): extraction, arithmetic,
    truncation — identical semantics both engines."""
    d = F.col("o_orderdate")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 500 == 0)
        .select(
            "o_orderkey",
            F.year(d).alias("y"),
            F.quarter(d).alias("q"),
            F.month(d).alias("m"),
            F.dayofmonth(d).alias("d"),
            F.date_format(F.date_add(d.cast("date"), 90), "yyyy-MM-dd").alias("due_date"),
            F.datediff(F.lit("1999-01-01").cast("date"), d.cast("date")).alias(
                "days_to_1999"
            ),
            F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        )
    )


@_register(
    "window_rank_functions",
    """
    SELECT o_orderstatus, o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           lead(o_orderkey, 1) OVER w AS next_orderkey
    FROM orders WHERE o_orderkey % 100 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC)
    """,
)
def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining window-function family: ntile / percent_rank / cume_dist /
    lead, deterministic under a unique-key ordering."""
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_orderkey").asc())
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        )
    )


@_register(
    "percentiles_order_value",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates (exact interpolated percentiles) — Spark
    percentile() and DuckDB quantile_cont share the interpolation formula,
    verified bit-identical at round(4)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


# RETIRED from the driver registry in r14 (cap swap for
# vector_stream_semantic_pairs — VERDICT r13 item 6): the §2.3
# aggregation family keeps full driver coverage via rollup_revenue
# (driver-r13), grouping_sets_revenue (CUBE ⊂ GROUPING SETS — the same
# Expand-based plan), pivot_user_event_matrix, percentiles_order_value
# and approx_distinct_parts.  The function stays: pytest pins it
# against its DuckDB oracle (tests/test_entry.py), and SURVEY §2.9
# records the retirement.
_CUBE_ORDER_STATS_ORACLE = """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """


def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_money(F.col("o_totalprice"))).cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "sum_price",
        )
    )


@_register(
    "window_running_revenue",
    """
    WITH mine AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_custkey % 50 = 0
    )
    SELECT o_custkey, o_orderkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY price DESC) AS price_rank,
           CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_3
    FROM mine
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame coverage beyond row_number: rank, running total, and a
    3-row moving sum (exact decimal arithmetic inside the frames)."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    price = _money(F.col("o_totalprice"))
    base = orders.select("o_custkey", "o_orderkey", "o_orderdate", price.alias("price"))
    by_time = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        F.rank()
        .over(Window.partitionBy("o_custkey").orderBy(F.col("price").desc()))
        .alias("price_rank"),
        F.sum("price")
        .over(by_time.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        F.sum("price")
        .over(by_time.rowsBetween(-2, 0))
        .cast("double")
        .alias("moving_sum_3"),
    )


# =====================================================================
# Wave 4: wider analytical surface (TPC-H-shaped over the testdata schema)
# =====================================================================

_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _revenue_col():
    return _money(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(3,2)") - _rate(F.col("l_discount"))
    )


@_register(
    "q7_nation_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(sum({_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7 shape: bilateral trade volume between two nations by year."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_revenue_col()).cast("double").alias("revenue"))


@_register(
    "q10_returned_items",
    f"""
    WITH agg AS (
      SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum({_REVENUE}) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
    )
    SELECT * FROM agg ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue_col()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_register(
    "q14_promo_share",
    f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum({_REVENUE}) AS DOUBLE) AS promo_share,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: promo revenue share. The ratio divides two exact decimal
    sums; both engines surface it as one double division."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _revenue_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias(
                "promo_share"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "q16_part_supplier_counts",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45' AND p_size IN (1, 9, 19, 29, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape: count(distinct) per group (expand + two-phase agg under
    Catalyst)."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").isin(1, 9, 19, 29, 49)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@_register(
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 180
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice AS totalprice, total_qty
    FROM big JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: HAVING-filtered aggregate joined back to dimensions."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_money(F.col("l_quantity"))).alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey", F.col("q").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


@_register(
    "q13_customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: left outer join with a join-side filter + two-level
    aggregation (count distribution)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(sum({_REVENUE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: view reuse + scalar max subquery. The revenue totals are
    exact decimal sums surfaced once as double, so the max-equality
    comparison is engine-stable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_revenue_col()).cast("double").alias("total_revenue"))
        .cache()
    )
    top = rev.agg(F.max("total_revenue").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("m"))
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_register(
    "funnel_signup_click_purchase",
    f"""
    WITH ev AS (
      SELECT user_id, event_type, {_TS_US} AS ts FROM events
    ), t1 AS (
      SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS ts1
      FROM ev GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM ev e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM ev e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT
      (SELECT count(*) FROM t1 WHERE ts1 IS NOT NULL) AS n_signup,
      (SELECT count(*) FROM t2) AS n_signup_then_click,
      (SELECT count(*) FROM t3) AS n_full_funnel
    """,
)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (signup -> click -> purchase, strictly in
    time order): stepwise conditional minima, each stage a per-key
    aggregation — the sequence-pattern workhorse for event pipelines."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    t1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("ts1")
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1.filter(F.col("ts1").isNotNull()), "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    # one plan, one job: stage frames left-join per user (t3 users ⊆ t2 ⊆ t1)
    # and a single aggregate counts the non-null stage timestamps — no
    # driver-side .count() round-trips
    return (
        t1.filter(F.col("ts1").isNotNull())
        .join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("ts1").alias("n_signup"),
            F.count("ts2").alias("n_signup_then_click"),
            F.count("ts3").alias("n_full_funnel"),
        )
    )


@_register(
    "q22_idle_balances",
    """
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: scalar-subquery threshold + anti join. The scalar average
    is exact-decimal-sum / count, divided once as double on both engines."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    # the 1-row threshold stays in the DAG (broadcast cross join) instead of
    # a driver .collect() round-trip — one job, no literal baked into the plan
    stat = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_money(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias(
            "_threshold"
        )
    )
    return (
        cust.crossJoin(F.broadcast(stat))
        .filter(F.col("c_acctbal") > F.col("_threshold"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_money(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


# ---- weak-checked entries (no SQL-expressible oracle; driver records
# rows-only) ----


@_register(
    "multimodal_resize",
    """
    WITH d AS (
      SELECT doc_id AS item_id, 4 + (doc_id // 16) % 16 AS h
      FROM documents WHERE doc_id % 10 = 0
    ), ps AS (
      SELECT item_id,
             CAST(3 * 8 * sum((item_id + (y.y * h) // 8) % 256) AS BIGINT)
               AS pixel_sum
      FROM d, unnest(range(8)) AS y(y)
      GROUP BY item_id
    )
    SELECT d.item_id, 8 AS out_width, 8 AS out_height,
           CAST(246 AS BIGINT) AS out_n_bytes, ps.pixel_sum,
           'bmp-nn' AS resizer
    FROM d JOIN ps USING (item_id)
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize over real BMP bytes: fixture BMPs are
    synthesized from doc_id (header fields SQL-derivable), decoded with the
    dependency-free BMP parser, index-mapped ``src=(dst*src_dim)//dst_dim``
    in numpy, re-encoded.  The oracle recomputes the resized pixel sum and
    output byte length from the same formulas, so a wrong row stride, an
    off-by-one in the NN index map, or padding mishandling all hash-mismatch."""
    from .functions.multimodal import resize_images, synthesize_images

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    out = resize_images(synthesize_images(docs, "doc_id"), 8, 8)
    return out.select(
        "item_id", "out_width", "out_height", "out_n_bytes", "pixel_sum", "resizer"
    )


@_register(
    "multimodal_audio_features",
    """
    WITH d AS (
      SELECT doc_id AS item_id, 64 + doc_id % 128 AS n
      FROM documents WHERE doc_id % 10 = 0
    ), samp AS (
      SELECT item_id, (((item_id + 7 * s.s) % 256) - 128) * 64 AS v
      FROM d, unnest(range(n)) AS s(s)
    ), sq AS (
      SELECT item_id, CAST(sum(v * v) AS BIGINT) AS sumsq
      FROM samp GROUP BY item_id
    )
    SELECT d.item_id, CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           8000 AS sample_rate, CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // 8000 AS BIGINT) AS est_duration_ms,
           sq.sumsq, 'wav' AS decoder
    FROM d JOIN sq USING (item_id)
    """,
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/WAVE PCM16 decode: fixture WAVs are synthesized from
    doc_id (sample values SQL-derivable), then the dependency-free chunk
    walker extracts rate/bit-depth/sample count and numpy computes the
    exact integer sum of squared samples.  The oracle regenerates the same
    samples with ``unnest(range(n))`` — a mis-parsed fmt chunk, wrong data
    offset, or byte-order bug all hash-mismatch."""
    from .functions.multimodal import audio_features, synthesize_audio

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    out = audio_features(synthesize_audio(docs, "doc_id"))
    return out.select(
        "item_id", "n_bytes", "sample_rate", "n_samples",
        "est_duration_ms", "sumsq", "decoder",
    )


@_register(
    "multimodal_frame_sample",
    """
    WITH d AS (
      SELECT doc_id AS item_id, 2 + doc_id % 4 AS nf
      FROM documents WHERE doc_id % 10 = 0
    ), fr AS (
      SELECT item_id, CAST(f.f AS INT) AS frame_index,
             4 + (item_id + f.f) % 8 AS w,
             4 + (item_id * 3 + f.f) % 8 AS h
      FROM d, unnest(range(nf)) AS f(f)
      WHERE f.f % 2 = 0
    )
    SELECT item_id, frame_index,
           CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS frame_n_bytes,
           CAST(w AS INT) AS frame_width, CAST(h AS INT) AS frame_height
    FROM fr
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame-boundary parsing: fixture videos are VID0 containers of
    BMP frames synthesized from doc_id; the sampler walks the
    length-prefixed frame table, keeps every 2nd frame, and header-decodes
    each kept frame's BMP dimensions.  The oracle regenerates frame count,
    sizes, and dims from the same formulas, so a mis-read length prefix or
    a wrong sampling stride hash-mismatches."""
    from .functions.multimodal import frame_sample, synthesize_videos

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    frames = frame_sample(synthesize_videos(docs, "doc_id"), every_n_frames=2)
    return frames.select(
        "item_id", "frame_index", "frame_n_bytes", "frame_width", "frame_height"
    )


@_register(
    "key_frame_selection",
    """
    WITH d AS (
      SELECT doc_id AS item_id, 2 + doc_id % 4 AS nf
      FROM documents WHERE doc_id % 10 = 0
    ), fr AS (
      SELECT item_id, CAST(f.f AS INT) AS frame_index,
             4 + (item_id + f.f) % 8 AS w,
             4 + (item_id * 3 + f.f) % 8 AS h
      FROM d, unnest(range(nf)) AS f(f)
    ), mass AS (
      -- exact integer pixel mass of a frame: gray value (i+f+y)%256 on
      -- every one of w columns x 3 channels of row y
      SELECT item_id, frame_index,
             3 * w * sum((item_id + frame_index + y.y) % 256) AS m
      FROM fr, unnest(range(h)) AS y(y)
      GROUP BY item_id, frame_index, w
    ), sc AS (
      -- consecutive fixture frames ALWAYS change geometry (w, h walk
      -- mod 8), so the operator's hard-cut branch applies: score =
      -- this frame's mass + the previous frame's mass
      SELECT m.item_id, m.frame_index,
             CAST(m.m + p.m AS BIGINT) AS change_score
      FROM mass m JOIN mass p
        ON p.item_id = m.item_id AND p.frame_index = m.frame_index - 1
    ), ranked AS (
      SELECT item_id, frame_index, change_score,
             row_number() OVER (
               PARTITION BY item_id
               ORDER BY change_score DESC, frame_index ASC
             ) AS rn
      FROM sc
    )
    SELECT item_id, 0 AS frame_index, 1 AS rank,
           CAST(0 AS BIGINT) AS change_score
    FROM d
    UNION ALL
    SELECT item_id, frame_index, CAST(rn + 1 AS INT) AS rank, change_score
    FROM ranked WHERE rn <= 2
    """,
)
def key_frame_selection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-frame selection by inter-frame change (r12 gate for the VID0
    shot-boundary operator, ``functions/multimodal.py keyframe_select``):
    fixture videos decode for REAL (VID0 walk + BMP parse), frame i
    scores the exact-integer pixel delta vs frame i-1 (geometry change =
    both frames' pixel mass), frame 0 is always rank 1, and the top
    k-1=2 deltas fill the remaining slots — all inside ONE Arrow
    ``mapInPandas`` pass; media bytes never shuffle.  The oracle replays
    frame geometry, pixel mass, and the ranking closed-form, so a
    mis-read frame table, wrong pixel stride, or tie-break drift all
    hash-mismatch.  Gate output is the scalar projection (binary frame
    bytes and sha stay operator-side per the gate-output contract)."""
    from .functions.multimodal import keyframe_select, synthesize_videos

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    out = keyframe_select(synthesize_videos(docs, "doc_id"), k=3)
    return out.select("item_id", "frame_index", "rank", "change_score")


@_register(
    "image_ahash_clusters",
    """
    WITH d AS (
      SELECT doc_id AS item_id, 4 + (doc_id // 16) % 16 AS h FROM documents
    ), g AS (
      SELECT item_id, y.y AS yd, (item_id + (y.y * h) // 8) % 256 AS gv
      FROM d, UNNEST(range(8)) AS y(y)
    ), bits AS (
      SELECT item_id, yd,
             CASE WHEN 8 * gv >= sum(gv) OVER (PARTITION BY item_id)
                  THEN 'ff' ELSE '00' END AS b
      FROM g
    ), hx AS (
      SELECT item_id, string_agg(b, '' ORDER BY yd) AS ahash_hex
      FROM bits GROUP BY item_id
    )
    SELECT ahash_hex, count(*) AS n_items, min(item_id) AS canonical_id
    FROM hx GROUP BY ahash_hex
    """,
)
def image_ahash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual-duplicate clusters by perceptual average-hash — the
    multimodal counterpart of exact text dedup: every fixture image is
    REALLY decoded (BMP parse), 8x8 nearest-neighbor downsampled,
    grayscaled, and aHashed executor-side; clusters group by the hash
    with the lowest item id as canonical.  The oracle replays the whole
    decode->resize->threshold->pack pipeline closed-form from the fixture
    formulas (gray of source row y of image i is (i+y)%256, so 8x8 sample
    row yd reads (i + (yd*h)//8)%256; each hash byte is ff/00 since a
    row's bits agree) — a defect anywhere in the chain (row order, index
    map, grayscale, mean threshold, bit packing) hash-mismatches."""
    from .functions.multimodal import image_ahash, synthesize_images

    docs = _t(spark, sf_dir, "documents")
    hashed = image_ahash(synthesize_images(docs, "doc_id"))
    return hashed.groupBy("ahash_hex").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.min("item_id").alias("canonical_id"),
    )


@_register(
    "image_ahash_near_dup",
    """
    WITH d AS (
      SELECT doc_id AS item, doc_id // 4 AS g, doc_id % 4 AS j FROM documents
    ), base AS (
      SELECT item, g, j, i.i AS i,
             CASE WHEN i.i < 32
               THEN CASE WHEN strpos('89abcdef',
                      substr(md5(CAST(g AS VARCHAR)), CAST(i.i + 1 AS INT), 1)) > 0
                    THEN 1 ELSE 0 END
               ELSE CASE WHEN strpos('89abcdef',
                      substr(md5(concat('x:', CAST(g AS VARCHAR))), CAST(i.i - 31 AS INT), 1)) > 0
                    THEN 1 ELSE 0 END
             END AS b0
      FROM d, UNNEST(range(64)) AS i(i)
    ), planned AS (
      SELECT item, i,
             CASE WHEN i >= g % 61 AND i < g % 61 + j THEN 1 - b0 ELSE b0 END AS pb
      FROM base
    ), th AS (
      -- replay the decoder's integer mean threshold over the {0,255} grays
      SELECT item, i,
             CASE WHEN 64 * 255 * pb >= sum(255 * pb) OVER (PARTITION BY item)
                  THEN 1 ELSE 0 END AS bit
      FROM planned
    ), bands AS (
      SELECT item, CAST(i // 16 AS INT) AS band,
             CAST(sum(bit << CAST(15 - i % 16 AS INT)) AS BIGINT) AS bits
      FROM th GROUP BY item, i // 16
    ), wide AS (
      SELECT item,
             max(CASE WHEN band = 0 THEN bits END) AS b0,
             max(CASE WHEN band = 1 THEN bits END) AS b1,
             max(CASE WHEN band = 2 THEN bits END) AS b2,
             max(CASE WHEN band = 3 THEN bits END) AS b3
      FROM bands GROUP BY item
    ), cand AS (
      SELECT DISTINCT a.item AS item_a, b.item AS item_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bits = b.bits
                                AND a.item < b.item
    )
    SELECT c.item_a, c.item_b,
           CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
              + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3))
                AS INT) AS hamming
    FROM cand c JOIN wide wa ON wa.item = c.item_a
                JOIN wide wb ON wb.item = c.item_b
    WHERE bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
        + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) <= 3
    """,
)
def image_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual NEAR-dup pairs by perceptual hash — what aHash is FOR
    (re-encodes and slight edits, not byte-identical copies): fixture
    groups of 4 images share an md5-derived 8x8 pattern differing by
    <= 3 planted bit flips; the REAL pipeline (BMP decode -> threshold ->
    64-bit pack -> 16-bit bands) feeds the same banded-hamming join the
    SimHash detector uses (functions/dedup.py banded_hamming_pairs).
    The oracle replays bit planning, mean threshold, band packing, band
    equi-join candidates, and the exact popcount closed-form — a defect
    in any stage (decode, packing order, band extraction, join, XOR
    popcount) hash-mismatches."""
    from .functions.dedup import banded_hamming_pairs
    from .functions.multimodal import image_ahash, synthesize_near_dup_images

    docs = _t(spark, sf_dir, "documents")
    hashed = image_ahash(synthesize_near_dup_images(docs, "doc_id"))
    sigi = hashed.select(
        F.col("item_id").alias("doc"),
        *[F.col(f"band{b}").cast("long").alias(f"sb{b}") for b in range(4)],
    )
    return banded_hamming_pairs(sigi).select(
        F.col("doc_a").alias("item_a"),
        F.col("doc_b").alias("item_b"),
        "hamming",
    )


@_register(
    "approx_distinct_parts",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           true AS parts_within_tol, true AS supps_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct, gated on its accuracy contract: the sketch
    estimate must land within 3x the configured rsd (0.05) of the exact
    count, surfaced as a boolean the oracle reproduces with ``true`` — a
    drifting sketch hash-mismatches.  The raw estimate itself is
    engine-specific and deliberately not compared."""
    li = _t(spark, sf_dir, "lineitem")
    tol = 0.15
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.05).alias("approx_supps"),
        F.count_distinct(F.col("l_partkey")).alias("exact_parts"),
        F.count_distinct(F.col("l_suppkey")).alias("exact_supps"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= tol * F.col("exact_parts")
        ).alias("parts_within_tol"),
        (
            F.abs(F.col("approx_supps") - F.col("exact_supps"))
            <= tol * F.col("exact_supps")
        ).alias("supps_within_tol"),
    )


@_register("ann_ivf_topk", None)  # oracle assigned below (exact-probe mode)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot IVF with n_probe = n_cells: exhaustive probing makes the
    result EXACT, so the brute-force cosine oracle checks the full
    codebook-GEMM assignment + cell-keyed probe join + rerank machinery.
    The approximate n_probe < n_cells mode runs the same code over fewer
    cells (pytest covers its recall behavior)."""
    from .functions.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        query_ids=list(range(10)),
        k=5,
        n_cells=16,
        n_probe=16,
    )


_ORACLES["ann_ivf_topk"] = _ORACLES["ann_cosine_topk"]


def _lsh_topk_oracle(n_planes: int = 4, seed: int = 42, k: int = 5) -> str:
    """Full-semantics LSH oracle: DuckDB recomputes the identical
    md5-derived hyperplanes (functions/similarity.py:plane_matrix), the
    per-vector sign signatures, the bucket equi-join, and the exact
    in-bucket rerank — so the gate verifies the approximate operator's
    actual contract, not a degenerate exact mode."""
    comp = _hex8_to_int(f"md5(concat({seed}, ':', p.p, ':', i.i))")
    return f"""
    WITH dims AS (
      SELECT max(len(embedding)) AS d FROM embeddings
    ), planes AS (
      SELECT p.p AS p, i.i AS i,
             ({comp} / 2147483647.0) - 1.0 AS comp
      FROM range({n_planes}) AS p(p), dims, unnest(range(dims.d)) AS i(i)
    ), dots AS (
      SELECT e.vec_id, pl.p,
             sum(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.comp) AS dot
      FROM embeddings e, planes pl
      GROUP BY e.vec_id, pl.p
    ), sigs AS (
      SELECT vec_id,
             string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM dots GROUP BY vec_id
    ), base AS (
      SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, s.bucket
      FROM embeddings e JOIN sigs s USING (vec_id)
    ), q AS (
      SELECT vec_id AS qid, v AS qv, bucket FROM base WHERE vec_id < 10
    ), scored AS (
      SELECT q.qid, b.vec_id AS cid,
             list_cosine_similarity(q.qv, b.v) AS cos
      FROM base b JOIN q ON b.bucket = q.bucket AND b.vec_id != q.qid
    ), ranked AS (
      SELECT qid, cid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)
               AS rank
      FROM scored
    )
    SELECT qid AS query_id, rank, cid AS neighbor_id, round(cos, 3) AS cosine
    FROM ranked WHERE rank <= {k}
    """


@_register("ann_lsh_topk", _lsh_topk_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH buckets, oracle-backed at
    FULL approximate semantics: the planes are a pure function of
    (seed, plane, dim) through md5, so DuckDB rebuilds the same matrix,
    the same sign signatures, and the same bucket-restricted exact rerank.
    A wrong signature bit, bucket-join defect, or rank tie-break all
    hash-mismatch."""
    from .functions.similarity import lsh_bucketed_topk

    return lsh_bucketed_topk(
        _t(spark, sf_dir, "embeddings"), query_ids=list(range(10)), k=5, n_planes=4
    )


@_register(
    "multimodal_image_features",
    """
    WITH d AS (
      SELECT doc_id AS item_id,
             4 + doc_id % 16 AS w,
             4 + (doc_id // 16) % 16 AS h
      FROM documents
    ), ps AS (
      SELECT item_id, CAST(3 * w * sum((item_id + y.y) % 256) AS BIGINT)
               AS pixel_sum
      FROM d, unnest(range(h)) AS y(y)
      GROUP BY item_id, w
    )
    SELECT d.item_id,
           CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS n_bytes,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           3 AS channels, ps.pixel_sum, 'bmp' AS decoder
    FROM d JOIN ps USING (item_id)
    """,
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode over mapInPandas: fixture BMPs are synthesized per
    doc_id (dimensions and the gray row gradient are pure functions of the
    id), then fully parsed — magic, data offset, BITMAPINFOHEADER dims,
    bottom-up row order, 4-byte row padding — and the exact pixel byte sum
    is computed from the decoded array.  The oracle recomputes every field
    (including the padding-sensitive file size and the pixel sum) from the
    same formulas, so any parser defect hash-mismatches."""
    from .functions.multimodal import image_features, synthesize_images

    docs = _t(spark, sf_dir, "documents")
    out = image_features(synthesize_images(docs, "doc_id"))
    return out.select(
        "item_id", "n_bytes", "width", "height", "channels", "pixel_sum", "decoder"
    )


# =====================================================================
# Wave 5: the remaining TPC-H shapes, adapted to the trimmed testdata
# schema (no partsupp / l_commitdate / l_receiptdate — lineitem stands in
# as the part-supplier link and ship-vs-order-date lag stands in for
# receipt-vs-commit lag).  Exercises the read-side query surface the
# reference exposes through Spark SQL over its tables
# (BaseSparkTest.java:170-178).
# =====================================================================


@_register(
    "q2_min_cost_supplier",
    """
    WITH costs AS (
      SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey, l_suppkey
    ), minc AS (
      SELECT l_partkey, min(cost) AS min_cost FROM costs GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_name, n_name, CAST(cost AS DOUBLE) AS min_cost
    FROM part
      JOIN costs ON costs.l_partkey = p_partkey
      JOIN minc ON minc.l_partkey = costs.l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
    WHERE p_size < 10 AND p_type = 'STANDARD' AND cost = min_cost
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2 shape (correlated min subquery), decorrelated Spark-first: per
    (part, supplier) min cost from the lineitem link, then a window min over
    the part — the window reuses the aggregation's hash partitioning prefix
    instead of a second shuffle-join back.  Dim chain supplier→nation→region
    broadcasts; the part filter broadcasts and semi-prunes lineitem before
    the aggregation shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    part_f = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") < 10) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    # prune lineitem with SEMI joins (no dim columns ride the shuffle),
    # aggregate on the two long keys only, window-min, then attach the
    # part/supplier names via broadcast joins on the tiny result — at scale
    # the aggregation exchange carries (long, long, decimal) rows instead
    # of three extra strings
    li2 = li.join(
        F.broadcast(part_f.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).join(
        F.broadcast(eu_supp.select("s_suppkey")),
        li.l_suppkey == F.col("s_suppkey"),
        "left_semi",
    )
    costs = li2.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_money(F.col("l_extendedprice"))).alias("cost")
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("min_cost_d", F.min("cost").over(w)).filter(
        F.col("cost") == F.col("min_cost_d")
    )
    return (
        best.join(F.broadcast(part_f), best.l_partkey == part_f.p_partkey)
        .join(F.broadcast(eu_supp), best.l_suppkey == eu_supp.s_suppkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("cost").cast("double").alias("min_cost"),
        )
    )


@_register(
    "q8_market_share",
    f"""
    WITH flat AS (
      SELECT year(o_orderdate) AS o_year, {_REVENUE} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        JOIN part ON p_partkey = l_partkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 market share: one conditional aggregation instead of TPC-H's
    nested-subquery formulation — a single pass over the fact join computes
    both the nation's volume and the total (map-side partial aggregation; no
    second scan).  All five dimension sides broadcast; only the
    lineitem⋈orders join shuffles.  Exact-decimal sums; the share division
    happens once per group in double."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = _t(spark, sf_dir, "supplier")
    part_f = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = nat.alias("n1")
    n2 = nat.alias("n2")
    cust_asia = (
        cust.join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(reg), F.col("n1.n_regionkey") == reg.r_regionkey)
        .select("c_custkey")
    )
    supp_nat = supp.join(
        F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey")
    ).select("s_suppkey", F.col("n2.n_name").alias("supp_nation"))
    flat = (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_asia), orders.o_custkey == cust_asia.c_custkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue_col().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return flat.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@_register(
    "q9_profit_by_nation",
    f"""
    SELECT n_name, year(o_orderdate) AS o_year,
           CAST(sum({_REVENUE}
                    - CAST(l_quantity AS DECIMAL(12,0))
                      * CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS profit
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 product-type profit (p_retailprice × 10% standing in for the
    missing ps_supplycost): the part-name filter broadcasts and prunes
    lineitem before the one fact-fact shuffle (lineitem⋈orders); supplier
    and nation broadcast.  Profit arithmetic is exact decimal end to end."""
    li = _t(spark, sf_dir, "lineitem")
    part_f = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    supp_nat = supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "n_name")
    cost = (
        F.col("l_quantity").cast("decimal(12,0)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.lit(0.10).cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "n_name",
            F.year("o_orderdate").alias("o_year"),
            (_revenue_col() - cost).alias("amount"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount").cast("double").alias("profit"))
    )


@_register(
    "q11_important_stock",
    """
    WITH vals AS (
      SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_1','NATION_2','NATION_3')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS value
    FROM vals WHERE value > (SELECT sum(value) * 0.001 FROM vals)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 important stock (lineitem value standing in for partsupp):
    per-part value vs a global-threshold scalar subquery.  The scalar is a
    second aggregation over the SAME grouped result — cached so the shuffle
    runs once — grafted back via crossJoin(broadcast(1-row)) so the whole
    thing is one job, no collect (VERDICT r3 item 9 pattern).  The exact
    decimal threshold comparison matches DuckDB bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    supp_f = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey"
    )
    # no persist: the threshold aggregation and the filtered output share
    # the identical groupBy subplan, so ReuseExchange computes the heavy
    # shuffle once within the job — and nothing leaks cached blocks into
    # the rest of the session
    vals = (
        li.join(F.broadcast(supp_f), li.l_suppkey == supp_f.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_money(F.col("l_extendedprice"))).alias("value"))
    )
    threshold = vals.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(4,3)")).alias("_thr")
    )
    return (
        vals.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("_thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("double").alias("value"),
        )
    )


@_register(
    "q17_small_qty_revenue",
    """
    WITH agg AS (
      SELECT l_partkey AS pk, count(*) AS cnt,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem JOIN part ON p_partkey = l_partkey JOIN agg ON pk = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 2 * cnt < sum_qty
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 small-quantity revenue: the correlated ``l_quantity < 0.5 *
    avg(l_quantity)`` subquery decorrelated into a per-part aggregate joined
    back — and the average REWRITTEN as ``2·qty·cnt < sum_qty`` so the
    comparison stays in exact integer/decimal arithmetic (no division, no
    float threshold drift between engines).  The brand/type part filter
    broadcasts and prunes lineitem before BOTH the aggregate and the join,
    so the heavy self-aggregation runs on ~1/brands of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    part_f = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM"))
        .select("p_partkey")
    )
    mine = li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
    per_part = mine.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty"),
    )
    return (
        mine.join(F.broadcast(per_part), mine.l_partkey == per_part.pk)
        .filter(F.col("l_quantity").cast("decimal(12,2)") * 2 * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.sum(_money(F.col("l_extendedprice"))).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@_register(
    "q20_excess_suppliers",
    """
    WITH shipped AS (
      SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4')
      AND s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 2000)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 nested-semi-join shape (shipped quantity standing in for
    ps_availqty): aggregate-then-semi-join — the HAVING-filtered aggregate
    is small (≤ #suppliers rows) so it broadcasts into a LEFT SEMI against
    the dimension side; lineitem is pruned by the broadcast part-name
    filter before its only shuffle (the suppkey aggregation)."""
    li = _t(spark, sf_dir, "lineitem")
    part_f = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*[f"NATION_{i}" for i in range(5)])
    )
    heavy = (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 2000)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@_register(
    "q21_waiting_suppliers",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 waiting-suppliers (ship-vs-order lag > 60 days standing in for
    the missing receipt-vs-commit columns), decorrelated to AGGREGATES:
    ``EXISTS (other supplier on the order)`` ⇔ the order's distinct
    supplier count ≥ 2, and ``NOT EXISTS (other LATE supplier)`` ⇔ the
    order's distinct LATE-supplier count = 1 — so instead of two
    sort-merge self-joins of raw lineitem (whose per-task sorts OOM'd a
    1 GB-heap vanilla session on the sf1 slice), lineitem is hash-
    aggregated once per key and only ORDER-sized relations join after.
    Row multiplicity is preserved exactly (numwait sums the late
    (order, supplier) row counts, = the SQL's count of l1 rows)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    late_g = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    per_order_late = late_g.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_late_supp")
    )
    per_order_all = (
        li.select("l_orderkey", "l_suppkey")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
    )
    qual = (
        late_g.join(per_order_late, "l_orderkey")
        .filter(F.col("n_late_supp") == 1)
        .join(per_order_all, "l_orderkey")
        .filter(F.col("n_supp") >= 2)
    )
    return (
        qual.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_rows").alias("numwait"))
    )


# =====================================================================
# Wave 5b: training-data pipeline shaping (chunking, deterministic
# sampling, PII redaction) — functions/pipeline.py
# =====================================================================


@_register(
    "doc_chunking",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), s AS (
      SELECT doc_id, t,
             unnest(generate_series(0, greatest(len(t) - 1, 0), 96)) AS start
      FROM toks
    )
    SELECT doc_id,
           CAST(start / 96 AS BIGINT) AS chunk_id,
           array_to_string(list_slice(t, start + 1, start + 128), ' ') AS chunk_text,
           greatest(least(128, len(t) - start), 0) AS chunk_tokens
    FROM s
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-token chunks every 96 tokens (32-token overlap) over documents —
    sequence+explode inside the scan stage, no shuffle."""
    from .functions.pipeline import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=128, stride=96
    )


@_register(
    "stratified_sample_docs",
    """
    WITH h AS (
      SELECT doc_id, lang,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                  % 1000 AS BIGINT) AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket FROM h
    WHERE bucket < CASE lang WHEN 'en' THEN 200 WHEN 'zh' THEN 700 ELSE 500 END
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (en 20%, zh 70%, rest 50%):
    md5-bucket filter, zero shuffle, rerun-stable."""
    from .functions.pipeline import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        rates_permille={"en": 200, "zh": 700},
        default_permille=500,
    )


@_register(
    "pii_redact_docs",
    """
    WITH synth AS (
      SELECT doc_id,
             concat(text,
                    repeat(concat(' user', CAST(doc_id AS VARCHAR), '@example.com'),
                           CAST(doc_id % 3 AS INTEGER)),
                    ' call 555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS s
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
           len(regexp_extract_all(s, '555-[0-9]{4}')) AS n_phones,
           md5(regexp_replace(regexp_replace(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                                             '<EMAIL>', 'g'),
                              '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5,
           length(regexp_replace(regexp_replace(s, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}',
                                                '<EMAIL>', 'g'),
                                 '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_len
    FROM synth
    """,
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction with match counts over a deterministic
    synthetic-PII tail — the whole regex scrub path oracle-checked via the
    redacted text's md5."""
    from .functions.pipeline import pii_redact

    return pii_redact(_t(spark, sf_dir, "documents"))


@_register(
    "incremental_minhash_pairs",
    None,  # oracle assigned below: identical to the one-shot minhash oracle
)
def incremental_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH index maintenance: documents arrive in two batches
    (split by doc_id parity); each batch is banded once, probed against the
    persistent lakehouse band index, and appended.  Band values depend only
    on a doc's own text, so the union of per-batch pairs is IDENTICAL to a
    full-corpus run — which is why the one-shot minhash oracle checks this
    query.  The scale property under test: admitting a batch costs
    O(batch · stored-candidates), never a corpus re-scan."""
    import shutil as _sh
    import tempfile as _tf

    from .functions.incremental import MinHashIndex
    from .lakehouse import LakeCatalog

    docs = _t(spark, sf_dir, "documents")
    wh = _tf.mkdtemp(prefix="minhash_idx_")
    try:
        idx = MinHashIndex.create(LakeCatalog(wh), "idx", "bands")
        # add_batch already returns eagerly-checkpointed pairs (safe after
        # the temp warehouse is removed) — no second checkpoint needed
        p1 = idx.add_batch(docs.filter(F.col("doc_id") % 2 == 0))
        p2 = idx.add_batch(docs.filter(F.col("doc_id") % 2 == 1))
        # the scale contract, asserted in-gate (pruned_point_lookup
        # pattern): a CDC-sized probe's stored-side scan reads a strict
        # subset of the bucket-partitioned index's files — planning only,
        # nothing is appended, the gate output is untouched
        from .functions.incremental import _pbucket_probe_values
        from .lakehouse.table import _prune_files_by_partition_values

        tiny = spark.createDataFrame(
            [(999_999_999, "tiny probe document checking pruned scans")],
            "doc_id long, text string",
        )
        pv = _pbucket_probe_values(idx.table, idx._band_rows(tiny, "text", "doc_id"))
        all_files = idx.table.current_files()
        kept = _prune_files_by_partition_values(idx.table.metadata(), all_files, pv)
        assert pv and len(kept) < len(all_files), (
            f"probe scan not pruned: {len(kept)}/{len(all_files)} files"
        )
        return p1.unionByName(p2)
    finally:
        _sh.rmtree(wh, ignore_errors=True)


_ORACLES["incremental_minhash_pairs"] = _MINHASH_PAIRS_ORACLE


@_register(
    "skew_salted_join_agg",
    """
    WITH dim(flag, label) AS (
      VALUES ('A', 'accepted'), ('N', 'neutral'), ('R', 'returned')
    )
    SELECT label, count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN dim ON l_returnflag = flag
    GROUP BY label
    """,
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join: l_returnflag has only 3 values (maximal key
    skew — a plain shuffle join melts three reducers), so the fact side is
    salted across 8 sub-partitions per key and the 3-row dim is replicated
    per salt (operators/skew.py). Result is EXACTLY the unsalted join —
    which is what the plain-SQL oracle verifies."""
    from .operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dim = spark.createDataFrame(
        [("A", "accepted"), ("N", "neutral"), ("R", "returned")],
        "l_returnflag string, label string",
    )
    joined = salted_join(li, dim, on=["l_returnflag"], salt=8)
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_price"),
    )


@_register(
    "reservoir_sample_per_lang",
    """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, lang, rn FROM r WHERE rn <= 20
    """,
)
def reservoir_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k (k=20) per-stratum sample — the deterministic twin of
    reservoir sampling: ordering by md5(id) is a uniform random draw, and
    row_number keeps exactly k per language.  One shuffle on the stratum
    key; rank truncation happens inside the window operator, so only k
    rows per stratum survive.  Complements the rate-based
    stratified_sample (exact quotas vs proportional thinning)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@_register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), idf AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(tf.tf AS DOUBLE) * n.n_docs / idf.df AS score
      FROM tf JOIN idf ON tf.term = idf.term CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, round(score, 4) AS score, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.  The idf uses the raw ratio
    N/df instead of ln(N/df): multiply and divide are IEEE
    correctly-rounded, so both engines produce bit-identical scores
    (ln differs in the last ulp between libm implementations), and the
    ranking is the same monotone order either way for a fixed tf.

    Plan shape: explode → (doc,term) partial-agg → term-keyed df agg
    joined back (term side is vocabulary-sized — broadcastable), scalar
    N grafted in-DAG via crossJoin(broadcast).  The final per-doc top-3
    truncates inside the window operator."""
    docs = _t(spark, sf_dir, "documents")
    from .functions.text import tokens_col

    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    idf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", F.round("score", 4).alias("score"), "rnk")
    )


@_register(
    "sequence_packing",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             CAST(unnest(generate_series(0, greatest(len(t) - 1, 0), 24)) / 24 AS BIGINT) AS chunk_id,
             len(t) AS n
      FROM toks
    ), sized AS (
      SELECT doc_id, chunk_id,
             greatest(least(32, n - chunk_id * 24), 0) AS chunk_tokens
      FROM chunks
    ), packed AS (
      SELECT doc_id, chunk_id, chunk_tokens,
             CAST(sum(chunk_tokens) OVER (PARTITION BY doc_id ORDER BY chunk_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
               - chunk_tokens AS before
      FROM sized
    )
    SELECT doc_id, chunk_id, chunk_tokens,
           CAST(floor(before / 64) AS BIGINT) AS pack_id,
           CAST(before - floor(before / 64) * 64 AS BIGINT) AS pack_offset
    FROM packed
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk (32/24) then pack into 64-token training sequences: windowed
    cumsum inside the doc partition + integer divide — packs never mix
    documents, one shuffle on the doc key."""
    from .functions.pipeline import chunk_documents, pack_sequences

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=24
    ).drop("chunk_text")
    return pack_sequences(chunks, seq_len=64)


@_register(
    "mixture_sample_sources",
    f"""
    WITH t AS (
      SELECT doc_id, source, len({_TOKENS_SQL}) AS n_tokens FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY source
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens FROM c
    WHERE cum_tokens - n_tokens <
          CASE source WHEN 'src0' THEN 2000 WHEN 'src1' THEN 500 ELSE 1000 END
    """,
)
def mixture_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing to per-source token budgets (src0 2k, src1 500, rest
    1k): deterministic md5-ordered greedy draw, one windowed cumsum per
    source partition — single shuffle, no iteration."""
    from .functions.pipeline import mixture_sample

    return mixture_sample(
        _t(spark, sf_dir, "documents"),
        budgets={"src0": 2000, "src1": 500},
        default_budget=1000,
    )


@_register(
    "pipeline_end_to_end",
    f"""
    WITH feat AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n,
             len(list_distinct({_TOKENS_SQL})) AS nd,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
             length(text) AS total
      FROM documents
    ), kept AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d JOIN feat f ON f.doc_id = d.doc_id
      WHERE round(0.5 * (CAST(nd AS DOUBLE) / n)
                  + 0.3 * (CAST(least(n, 100) AS DOUBLE) / 100.0)
                  + 0.2 * (CAST(alpha AS DOUBLE) / total), 4) >= 0.6
    ), canon AS (
      SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
    ), docs2 AS (
      SELECT k.doc_id, k.lang, k.text FROM kept k JOIN canon c ON c.doc_id = k.doc_id
    ), toks AS (
      SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM docs2
    ), chunks AS (
      SELECT doc_id, lang,
             CAST(unnest(generate_series(0, greatest(len(t) - 1, 0), 96)) / 96 AS BIGINT) AS chunk_id,
             len(t) AS n
      FROM toks
    ), sized AS (
      SELECT doc_id, lang, chunk_id,
             greatest(least(128, n - chunk_id * 96), 0) AS chunk_tokens
      FROM chunks
    ), sampled AS (
      SELECT * FROM sized
      WHERE CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
                                                     CAST(chunk_id AS VARCHAR))), 1, 8))
                      AS UBIGINT) % 1000 AS BIGINT) < 500
    )
    SELECT lang, count(*) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens,
           count(DISTINCT doc_id) AS n_docs
    FROM sampled GROUP BY lang
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE composed lazy plan: quality
    filter (score >= 0.6) -> exact content dedup (keep min doc_id) ->
    128/96 token chunking -> 50% deterministic chunk sampling -> per-lang
    manifest.  Every stage is the same operator the individual gate
    queries verify; composition adds no collects, no checkpoints — one
    DAG end to end, which is how the stages would run as a single job
    over 100 TB."""
    from .functions.pipeline import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs).filter(F.col("quality") >= 0.6).select("doc_id")
    kept = docs.join(q, "doc_id")
    canon = kept.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    docs2 = kept.join(canon.select("doc_id"), "doc_id", "left_semi")
    chunks = chunk_documents(docs2, chunk_size=128, stride=96)
    with_lang = chunks.join(docs2.select("doc_id", "lang"), "doc_id")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("chunk_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    sampled = with_lang.filter(bucket < 500)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").alias("n_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@_register(
    "grouping_sets_revenue",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with disjoint sets ((returnflag), (linestatus)) — not
    expressible as ROLLUP/CUBE, so it exercises Catalyst's native Expand
    operator directly (SURVEY.md §2.3 ⊘ row).  At scale Expand multiplies
    rows by the number of sets BEFORE the shuffle, but partial aggregation
    still combines map-side, so shuffle volume is one row per (set, group)
    per partition."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


@_register(
    "window_navigation_functions",
    """
    SELECT o_orderkey,
           CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER w AS DOUBLE) AS prev_price,
           CAST(lead(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER w AS DOUBLE) AS next_price,
           ntile(4) OVER w AS price_quartile,
           round(percent_rank() OVER w, 4) AS pct_rank,
           strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_order_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_navigation_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation window functions (lag/lead/ntile/percent_rank/first_value)
    over the per-customer order sequence — the §2.5 window surface beyond
    rank/running sums.  One shuffle on o_custkey serves all five functions
    (single Window operator; deterministic (date, key) sort)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.lag(_money(F.col("o_totalprice"))).over(w).cast("double").alias("prev_price"),
        F.lead(_money(F.col("o_totalprice"))).over(w).cast("double").alias("next_price"),
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.date_format(F.first("o_orderdate").over(w), "yyyy-MM-dd").alias(
            "first_order_date"
        ),
    )


@_register(
    "corpus_top_ngrams",
    f"""
    WITH toks AS (
      SELECT {_TOKENS_SQL} AS tk FROM documents
    ), grams AS (
      SELECT unnest(list_transform(range(1, len(tk) - 1),
                                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
             AS gram
      FROM toks WHERE len(tk) >= 3
    )
    SELECT gram, count(*) AS n
    FROM grams GROUP BY gram
    ORDER BY n DESC, gram ASC LIMIT 20
    """,
)
def corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-k word 3-grams — the vocabulary/contamination recon
    pass a training-data pipeline runs per corpus release.  Grams are built
    in-row inside the scan stage (sequence + transform, no Python), then one
    partial-aggregated groupBy; the global top-20 is a TakeOrderedAndProject
    (per-partition top-k, never a full sort) with a deterministic
    (count desc, gram asc) tie-break."""
    docs = _t(spark, sf_dir, "documents")
    from .functions.text import tokens_col

    with_toks = docs.select(tokens_col(F.col("text")).alias("_tk")).filter(
        F.size("_tk") >= 3
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_tk") - 3),
        lambda i: F.concat_ws(" ", F.slice("_tk", i + 1, 3)),
    )
    return (
        with_toks.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(20)
    )


@_register(
    "repetition_filter_docs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS tk FROM documents
    ), g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                                   i -> tk[i] || ' ' || tk[i+1])) AS gram
      FROM toks WHERE len(tk) >= 2
    ), c2 AS (
      SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram
    ), a2 AS (
      SELECT doc_id, max(c) AS maxc, sum(c) AS total FROM c2 GROUP BY doc_id
    ), g5 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk) - 3),
                                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                        || ' ' || tk[i+3] || ' ' || tk[i+4])) AS gram
      FROM toks WHERE len(tk) >= 5
    ), c5 AS (
      SELECT doc_id, gram, count(*) AS c FROM g5 GROUP BY doc_id, gram
    ), a5 AS (
      SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_occ,
             sum(c) AS total FROM c5 GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.tk) AS n_tokens,
           round(coalesce(CAST(a2.maxc AS DOUBLE) / a2.total, 0.0), 4) AS top2_frac,
           round(coalesce(CAST(a5.dup_occ AS DOUBLE) / a5.total, 0.0), 4) AS dup5_frac,
           (round(coalesce(CAST(a2.maxc AS DOUBLE) / a2.total, 0.0), 4) <= 0.05
            AND round(coalesce(CAST(a5.dup_occ AS DOUBLE) / a5.total, 0.0), 4) <= 0.30)
           AS keep
    FROM toks t
    LEFT JOIN a2 ON t.doc_id = a2.doc_id
    LEFT JOIN a5 ON t.doc_id = a5.doc_id
    """,
)
def repetition_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filter (top-2-gram dominance +
    duplicate-5-gram fraction).  The engine computes both metrics IN-ROW
    from each doc's sorted gram array (max count == longest sorted run) —
    zero shuffle, one codegen'd projection over the corpus scan — while the
    oracle computes them the naive explode + groupBy way, so the run-length
    identity is cross-verified."""
    from .functions.text import repetition_metrics

    docs = _t(spark, sf_dir, "documents")
    return repetition_metrics(
        docs, top_n=2, dup_n=5, max_top_frac=0.05, max_dup_frac=0.30
    )


# =====================================================================
# Wave 7b: corpus curation (segment dedup, Gopher rules, temperature
# mixing, length histogram, Lloyd k-means step) — functions/curation.py
# =====================================================================


@_register(
    "segment_dedup_docs",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS t
      FROM documents
    ), segs AS (
      SELECT doc_id,
             CAST(start / 32 AS BIGINT) AS seg_id,
             array_to_string(list_slice(t, start + 1, start + 32), ' ') AS seg_text
      FROM (SELECT doc_id, t,
                   unnest(generate_series(0, greatest(len(t) - 1, 0), 32)) AS start
            FROM toks)
    ), flagged AS (
      SELECT doc_id, seg_id, seg_text,
             row_number() OVER (PARTITION BY md5(seg_text)
                                ORDER BY doc_id, seg_id) AS rn
      FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_segments,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN seg_text END, ' '
                               ORDER BY seg_id), '') AS deduped_text
    FROM flagged
    GROUP BY doc_id
    """,
)
def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style segment-level exact dedup: 32-token segments,
    globally keep-first by (doc_id, seg_id), reassembled per doc. One
    shuffle on the segment hash + one on the doc id."""
    from .functions.curation import segment_dedup

    return segment_dedup(_t(spark, sf_dir, "documents"), seg_tokens=32)


@_register(
    "gopher_rules_filter",
    """
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN round(CAST(length(array_to_string(toks, '')) AS DOUBLE)
                             / CAST(len(toks) AS DOUBLE), 4)
             END AS mean_token_len,
             len(list_filter(toks, x -> list_contains(
                 ['the','a','of','and','to','in','is','it'], x))) AS stopword_hits
      FROM t
    )
    SELECT doc_id, n_tokens, mean_token_len, stopword_hits,
           coalesce(n_tokens >= 10 AND n_tokens <= 100000
                    AND mean_token_len >= 2.0 AND mean_token_len <= 10.0
                    AND stopword_hits >= 2, FALSE) AS passes
    FROM m
    """,
)
def gopher_rules_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (token-count bounds, mean token length,
    stopword presence) as a single codegen'd projection — no shuffle."""
    from .functions.curation import gopher_rules

    return gopher_rules(_t(spark, sf_dir, "documents"))


@_register(
    "temperature_mixture_sample",
    """
    WITH w AS (
      SELECT source, CAST(SUM(n_chars) AS HUGEINT) AS w
      FROM documents GROUP BY source
    ), m AS (SELECT MIN(w) AS min_w FROM w),
    d AS (
      SELECT doc_id, source,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS UBIGINT) % 1000 AS BIGINT) AS bucket
      FROM documents
    )
    SELECT d.doc_id, d.source, d.bucket
    FROM d JOIN w USING (source) CROSS JOIN m
    WHERE CAST(d.bucket AS HUGEINT) * CAST(d.bucket AS HUGEINT) * w.w
          < CAST(1000000 AS HUGEINT) * m.min_w
    """,
)
def temperature_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style alpha=1/2 source re-balancing; the sqrt keep-rate is
    evaluated as an exact integer predicate (bucket^2*w < 10^6*min_w) so
    both engines agree at every boundary. One per-source aggregate
    broadcast onto the scan; the corpus itself never shuffles."""
    from .functions.curation import temperature_mixture

    return temperature_mixture(_t(spark, sf_dir, "documents"))


@_register(
    "length_histogram_docs",
    """
    WITH b AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents)
    SELECT CAST(floor(((n_chars - mn) * 8) / (mx - mn + 1)) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_value,
           MAX(n_chars) AS max_value,
           CAST(SUM(n_chars) AS BIGINT) AS sum_value
    FROM documents CROSS JOIN b
    GROUP BY 1
    """,
)
def length_histogram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 8-bin histogram over n_chars with integer bucket math —
    1-row min/max broadcast, then a partial-aggregated groupBy; no global
    sort and no percentile state."""
    from .functions.curation import length_histogram

    return length_histogram(_t(spark, sf_dir, "documents"), bins=8)


@_register(
    "kmeans_lloyd_step",
    """
    WITH pts AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cents AS (
      SELECT vec_id AS cluster_id, v AS c FROM pts ORDER BY vec_id LIMIT 8
    ), scored AS (
      SELECT p.vec_id, c.cluster_id,
             list_sum(list_transform(range(1, len(p.v) + 1),
                                     i -> (p.v[i] - c.c[i]) * (p.v[i] - c.c[i])))
               AS d2,
             p.v[1] AS c1
      FROM pts p CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, cluster_id, d2, c1,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cluster_id) AS rn
      FROM scored
    )
    SELECT cluster_id,
           COUNT(*) AS n_members,
           round(AVG(d2), 4) AS avg_dist2,
           round(AVG(c1), 4) AS centroid_c1
    FROM assigned WHERE rn = 1
    GROUP BY cluster_id
    """,
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd round over the embeddings table: lowest-id
    seeds, broadcast k-row centroid crossJoin, tie-stable argmin, one
    groupBy update. The SQL oracle replays the identical fold order."""
    from .functions.curation import kmeans_lloyd_step as _kmeans

    return _kmeans(_t(spark, sf_dir, "embeddings"), k=8)


@_register(
    "unigram_logprob_docs",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                x -> x <> '')) AS tok
      FROM documents
    ), counts AS (
      SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
    ), total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           round(avg(-log2(CAST(c.cnt AS DOUBLE) / CAST(total.total AS DOUBLE))), 4)
             AS mean_neg_log2_prob
    FROM toks t JOIN counts c USING (tok) CROSS JOIN total
    GROUP BY t.doc_id
    """,
)
def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality bucketing: mean -log2 unigram probability
    per document under the corpus's own distribution — unigram table is
    vocabulary-sized, log-prob arithmetic is codegen'd columns, and the
    oracle replays the identical computation."""
    from .functions.curation import unigram_logprob_score

    return unigram_logprob_score(_t(spark, sf_dir, "documents"))


@_register(
    "curriculum_rank_shards",
    """
    WITH ranked AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
      FROM documents
    ), n AS (SELECT count(*) AS total FROM documents)
    SELECT doc_id, rank,
           CAST(floor(((rank - 1) * 8) / total) AS BIGINT) AS shard
    FROM ranked CROSS JOIN n
    """,
)
def curriculum_rank_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: exact global rank by (n_chars desc, doc_id)
    WITHOUT a single-partition window — per-value offsets (a window over
    the distinct-value relation only) + a value-partitioned intra-rank,
    composed into the identical row_number the oracle's global window
    states.  Shard assignment is pure integer math off an in-DAG total
    count."""
    from .functions.curation import global_rank

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_rank(docs, "n_chars", descending=True)
    total = docs.agg(F.count(F.lit(1)).alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "rank",
            F.floor((F.col("rank") - 1) * 8 / F.col("_total")).alias("shard"),
        )
    )




@_register(
    "collocation_lift_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ), grams AS (
      SELECT t[i.i + 1] AS w1, t[i.i + 2] AS w2
      FROM toks, unnest(range(len(t) - 1)) AS i(i)
      WHERE len(t) >= 2
    ), pc AS (
      SELECT w1, w2, count(*) AS pair_count FROM grams GROUP BY w1, w2
    ), uni AS (
      SELECT tok AS w, count(*) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS tt FROM uni
    ), cand AS (
      SELECT pc.w1, pc.w2, CAST(pc.pair_count AS BIGINT) AS pair_count,
             CAST((CAST(1000000 AS HUGEINT) * pc.pair_count * tot.tt)
                  // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT)
               AS lift_scaled
      FROM pc JOIN uni u1 ON pc.w1 = u1.w JOIN uni u2 ON pc.w2 = u2.w, tot
      WHERE pc.pair_count >= 5
    ), ranked AS (
      SELECT *, row_number() OVER (
        ORDER BY lift_scaled DESC, w1 ASC, w2 ASC) AS rank
      FROM cand
    )
    SELECT rank, w1, w2, pair_count, lift_scaled
    FROM ranked WHERE rank <= 50
    """,
)
def collocation_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining (r11): top-50 adjacent word pairs by
    scaled lift — an exact-integer, PMI-monotone association measure
    (Church & Hanks 1990; across pairs the corpus totals are constants,
    so ordering by c12/(c1*c2) IS the PMI ordering) above a support
    floor of 5.  Adjacency builds in-array inside the scan (no window
    shuffle); pair/unigram tables are partial aggregations bounded by
    distinct bigrams / vocabulary; top-n is the salted two-phase window
    (``functions/corpus.py:collocation_top_pairs``)."""
    from .functions.corpus import collocation_top_pairs

    return collocation_top_pairs(_t(spark, sf_dir, "documents"))


@_register(
    "tokenizer_fertility_by_lang",
    f"""
    WITH p AS (
      SELECT lang,
             len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS np,
             len({_TOKENS_SQL}) AS nw
      FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(np) AS BIGINT) AS n_pieces,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST((1000 * sum(np)) // greatest(sum(nw), 1) AS BIGINT)
             AS fertility_permille
    FROM p GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility (r11): pieces-per-word under the
    BPE-ish regex — the multilingual tokenizer-efficiency table a data
    card publishes (2x fertility = 2x context spent per content unit).
    Exact integer permille; one codegen'd projection + ONE bounded-key
    partial-agg groupBy (``functions/text.py:tokenizer_fertility``)."""
    from .functions.text import tokenizer_fertility

    return tokenizer_fertility(_t(spark, sf_dir, "documents"))


@_register(
    "cluster_balanced_sample",
    """
    WITH pts AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cents AS (
      SELECT vec_id AS cluster_id, v AS c FROM pts ORDER BY vec_id LIMIT 8
    ), scored AS (
      SELECT p.vec_id, c.cluster_id,
             list_sum(list_transform(range(1, len(p.v) + 1),
                                     i -> (p.v[i] - c.c[i]) * (p.v[i] - c.c[i])))
               AS d2
      FROM pts p CROSS JOIN cents c
    ), assigned AS (
      SELECT vec_id, cluster_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d2, cluster_id) AS rn
      FROM scored
    ), member AS (
      SELECT cluster_id, vec_id, md5(CAST(vec_id AS VARCHAR)) AS h
      FROM assigned WHERE rn = 1
    ), picked AS (
      SELECT cluster_id, vec_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY h ASC, vec_id ASC) AS pick_rank
      FROM member
    )
    SELECT cluster_id, vec_id, pick_rank FROM picked WHERE pick_rank <= 100
    """,
)
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced coreset selection (r11, D4-family): nearest-of-k
    deterministic-centroid assignment (the oracle-proven
    kmeans_lloyd_step fold/tie contract) + a fixed md5-ordered budget
    per cluster — balanced embedding-space coverage instead of letting
    the dominant mode eat the sample.  Per-cluster pick is the salted
    two-phase top-k, so a hot cluster never concentrates in one task
    (``functions/curation.py:cluster_balanced_sample``)."""
    from .functions.curation import cluster_balanced_sample

    return cluster_balanced_sample(
        _t(spark, sf_dir, "embeddings"), k=8, per_cluster=100
    )


@_register(
    "quality_rank_ensemble",
    f"""
    WITH sig AS (
      SELECT doc_id, length(text) AS slen,
             (1000000 * len(list_distinct({_TOKENS_SQL})))
               // greatest(len({_TOKENS_SQL}), 1) AS sdiv,
             (1000000 * len(list_filter(
                 regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'),
                 x -> regexp_matches(x, '^[a-z]+$'))))
               // greatest(len(regexp_extract_all(lower(text),
                               '[a-z]+|[0-9]+|[^a-z0-9\\s]')), 1) AS salpha
      FROM documents
    ), r AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY slen DESC, doc_id ASC) AS len_rank,
             row_number() OVER (ORDER BY sdiv DESC, doc_id ASC)
               AS diversity_rank,
             row_number() OVER (ORDER BY salpha DESC, doc_id ASC) AS alpha_rank
      FROM sig
    ), e AS (
      SELECT doc_id, len_rank, diversity_rank, alpha_rank,
             len_rank + diversity_rank + alpha_rank AS rank_sum
      FROM r
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY rank_sum ASC, doc_id ASC) AS rank
      FROM e
    )
    SELECT doc_id, len_rank, diversity_rank, alpha_rank, rank_sum, rank
    FROM ranked WHERE rank <= 100
    """,
)
def quality_rank_ensemble_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-signal quality selection by rank aggregation (r11, the
    FineWeb-style ensemble): three exact-integer signals from ONE text
    scan (length, lexical diversity, alphabetic purity), each globally
    ranked WITHOUT a single-partition corpus window (global_rank's
    per-value-offset decomposition), summed on the rank scale, top-100
    by (rank_sum, id) via the two-phase window
    (``functions/curation.py:quality_rank_ensemble``)."""
    from .functions.curation import quality_rank_ensemble

    return quality_rank_ensemble(_t(spark, sf_dir, "documents"), top_n=100)


# =====================================================================
# public surface
# =====================================================================

# The driver's correctness gate checks registered queries in dict order and
# stops after a fixed budget (~50 while 98 are registered).  Order the
# registry so every operator *family* lands inside that budget: CDC
# semantics, writer fidelity (Iceberg export, row lineage, WAP, changelog
# scans), TPC-H relational shapes, windows/setops/grouping-sets, event-time
# and temporal joins, text analysis, training-data shaping, corpus curation,
# dedup, ANN, and multimodal.  Redundant variants of already-covered
# families (extra TPC-H join+agg shapes, second as-of variant, raw simhash
# signature, the rollup/pivot/percentile cousins of grouping-sets, second
# multimodal entry) go after the fold — they stay registered, pytest-covered,
# and green in the LOCAL full-registry artifacts
# (CORRECTNESS_local_r7*.json), so losing their driver row costs no family
# coverage.
_CHECK_PRIORITY = [
    # ROUND-16 ROTATION (VERDICT r15 item 7, seed = CORRECTNESS_r13.json):
    # the driver checks the first ~50 entries.  Seed = the 50 gates whose
    # freshest driver row is r13 (recomputed: r13 keys minus r14 keys
    # minus r15 keys — exactly 50; verified zero overlap with the r15
    # window).  Slot 1 = incremental_minhash_pairs, r15's named fill that
    # rode position 51 and is first in line by that round's contract.
    # Expected post-r16 histogram ≈ {r14: 49, r15: 50, r16: 50}
    # (ngram_jaccard_pairs retired out of r14's 50 in the r15 cap swap).
    # --- the r15 position-51 carry ---
    "incremental_minhash_pairs",
    # --- r13-stale: incremental / lakehouse read paths ---
    "incremental_substring_profile",
    "changed_rows_scan",
    "changed_rows_with_deletes",
    "sql_read_surface",
    "iceberg_export_roundtrip",
    "iceberg_export_partitioned_roundtrip",
    # --- r13-stale: TPC-H / relational / event analytics ---
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    "rollup_revenue",
    "retention_cohorts",
    "event_transition_matrix",
    # --- r13-stale: dedup / decontamination / overlap ---
    "dedup_exact",
    "dedup_canonical_clusters",
    "simhash_near_dup",
    "containment_capped_near_dup",
    "source_overlap_sketch",
    "decontaminate_docs",
    "decontaminate_fuzzy_docs",
    "segment_dedup_docs",
    "winnowing_fingerprint_docs",
    # --- r13-stale: text analysis / LM / tokenizer ---
    "bigram_logprob_docs",
    "bpe_encode_docs",
    "bpe_train_merges",
    "bpe_vocab_after_merges",
    "gopher_rules_filter",
    "pii_redact_docs",
    "quality_classifier_filter",
    # --- r13-stale: curation / training-data shaping ---
    "cms_heavy_hitters",
    "dsir_importance_weights",
    "stratified_sample_docs",
    "temperature_mixture_sample",
    "hard_negative_mining",
    "epoch_plan_sources",
    # --- r13-stale: retrieval / graph ---
    "bm25_topk_docs",
    "hybrid_rrf_retrieval",
    "pagerank_link_graph",
    "triangle_count_graph",
    # --- r13-stale: ANN / vectors ---
    "ann_cosine_topk",
    "ann_filtered_topk",
    "ann_ivf_incremental_topk",
    "ann_ivfpq_topk",
    "ann_recall_eval",
    "pq_adc_topk",
    "pq_encode_codes",
    "kmeans_lloyd_step",
    "semantic_dedup_embeddings",
    "bitext_mining_pairs",
    # --- r13-stale: multimodal ---
    "multimodal_image_features",
    "image_ahash_near_dup",
]


def _reorder_registry() -> None:
    ordered: dict[str, QueryFn] = {}
    for name in _CHECK_PRIORITY:
        if name in _QUERIES:
            ordered[name] = _QUERIES.pop(name)
    ordered.update(_QUERIES)  # leftovers keep definition order, after priority
    _QUERIES.clear()
    _QUERIES.update(ordered)


_reorder_registry()


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
