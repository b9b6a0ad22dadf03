"""as-of and range joins vs naive Python models."""

from pyspark.sql import functions as F

from debezium_server_iceberg_spark.operators.temporal import asof_join, range_join

TRADES = [  # (sym, ts, qty)
    ("A", 10, 100),
    ("A", 20, 200),
    ("A", 20, 201),
    ("B", 15, 300),
    ("B", 5, 50),
]
QUOTES = [  # (sym, ts, px)
    ("A", 5, 1.0),
    ("A", 10, 1.5),
    ("A", 18, 2.0),
    ("B", 20, 9.0),
]


def _dfs(spark):
    t = spark.createDataFrame(TRADES, "sym string, ts long, qty long")
    q = spark.createDataFrame(QUOTES, "sym string, ts long, px double")
    return t, q


def test_asof_backward(spark):
    t, q = _dfs(spark)
    out = {
        (r["sym"], r["ts"], r["qty"]): r["px_right"]
        for r in asof_join(t, q, ["sym"], "ts", "ts").collect()
    }
    # latest quote at-or-before each trade
    assert out[("A", 10, 100)] == 1.5   # quote at ts=10 (<=)
    assert out[("A", 20, 200)] == 2.0
    assert out[("A", 20, 201)] == 2.0
    assert out[("B", 15, 300)] is None  # no quote yet
    assert out[("B", 5, 50)] is None
    assert len(out) == len(TRADES)      # every left row kept


def test_asof_forward(spark):
    t, q = _dfs(spark)
    out = {
        (r["sym"], r["ts"], r["qty"]): r["px_right"]
        for r in asof_join(t, q, ["sym"], "ts", "ts", direction="forward").collect()
    }
    assert out[("A", 10, 100)] == 1.5   # quote at ts=10 (>=)
    assert out[("A", 20, 200)] is None  # nothing after ts=20 for A
    assert out[("B", 5, 50)] == 9.0
    assert out[("B", 15, 300)] == 9.0


def test_range_join_overlap(spark):
    left = spark.createDataFrame(
        [("k", 0, 100, "l1"), ("k", 200, 300, "l2"), ("x", 0, 10, "l3")],
        "key string, s long, e long, lname string",
    )
    right = spark.createDataFrame(
        [("k", 50, 250, "r1"), ("k", 400, 500, "r2"), ("x", 5, 6, "r3")],
        "key string, rs long, re long, rname string",
    )
    got = {
        (r["lname"], r["rname"])
        for r in range_join(
            left, right, ["key"], "s", "e", "rs", "re", bucket_width=64
        ).collect()
    }
    assert got == {("l1", "r1"), ("l2", "r1"), ("l3", "r3")}


def test_range_join_no_duplicate_pairs(spark):
    # intervals spanning many buckets must still pair exactly once
    left = spark.createDataFrame([("k", 0, 1000, "L")], "key string, s long, e long, n string")
    right = spark.createDataFrame([("k", 500, 1500, "R")], "key string, rs long, re long, m string")
    rows = range_join(left, right, ["key"], "s", "e", "rs", "re", bucket_width=10).collect()
    assert len(rows) == 1


# ---- property-based: random instances vs naive python models

from hypothesis import HealthCheck, given, settings, strategies as st

_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 30), st.integers(0, 99)),
    min_size=1,
    max_size=15,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_rows, _rows)
def test_asof_join_matches_model(spark, lrows, rrows):
    # dedup right to one row per (key, ts) for deterministic tie-breaks
    rmap = {}
    for k, ts, v in rrows:
        if (k, ts) not in rmap or v > rmap[(k, ts)]:
            rmap[(k, ts)] = v
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts, _v) in enumerate(lrows)], "k string, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(k, ts, v) for (k, ts), v in rmap.items()], "k string, ts long, rv long"
    )
    out = {
        (r["k"], r["ts"], r["lid"]): r["rv_right"]
        for r in asof_join(left, right, ["k"], "ts", "ts").collect()
    }
    assert len(out) == len(lrows)
    for i, (k, ts, _v) in enumerate(lrows):
        eligible = [(t, v) for (kk, t), v in rmap.items() if kk == k and t <= ts]
        expect = max(eligible)[1] if eligible else None
        assert out[(k, ts, i)] == expect


_intervals = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 30)).map(lambda p: (p[0], p[0] + p[1])),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_intervals, _intervals, st.sampled_from([3, 7, 64]))
def test_range_join_matches_model(spark, livs, rivs, width):
    left = spark.createDataFrame(
        [("k", s, e, i) for i, (s, e) in enumerate(livs)], "key string, s long, e long, li long"
    )
    right = spark.createDataFrame(
        [("k", s, e, j) for j, (s, e) in enumerate(rivs)], "key string, rs long, re long, rj long"
    )
    got = {
        (r["li"], r["rj"])
        for r in range_join(left, right, ["key"], "s", "e", "rs", "re", bucket_width=width).collect()
    }
    expect = {
        (i, j)
        for i, (ls, le) in enumerate(livs)
        for j, (rs, re) in enumerate(rivs)
        if ls <= re and rs <= le
    }
    assert got == expect


def test_retention_cohort_hand_computed(spark):
    """Two users: u1 first active week W0 and again W0+2; u2 only W0+1
    -> cohorts and offsets fall out exactly."""
    from debezium_server_iceberg_spark import queries as qmod
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 10, "click", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2, 11), 10, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 15, 9), 10, "click", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 8, 9), 20, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in qmod.queries()["retention_cohorts"](spark, d).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,  # u1 W0
        ("2024-01-01", 2): 1,  # u1 back in W0+2
        ("2024-01-08", 0): 1,  # u2 cohort starts a week later
    }


def test_event_transitions_ordered_with_tiebreak(spark):
    from debezium_server_iceberg_spark import queries as qmod
    import datetime as dt
    import tempfile, os

    t = dt.datetime(2024, 3, 1, 12)
    rows = [
        (1, t, 7, "a", 0.0, "{}"),
        (2, t, 7, "b", 0.0, "{}"),  # same ts: event_id breaks the tie
        (3, t + dt.timedelta(minutes=1), 7, "c", 0.0, "{}"),
        (4, t, 8, "a", 0.0, "{}"),  # single-event user: no transition
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in qmod.queries()["event_transition_matrix"](spark, d).collect()
    }
    assert out == {("a", "b"): 1, ("b", "c"): 1}
