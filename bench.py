#!/usr/bin/env python
"""Benchmark harness: headline queries + CDC ingest at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Query timings cover every driver-gate query (read path + operator
simulations); the two ``ingest_*`` pseudo-queries measure the real write
path (append and MERGE upsert into the lakehouse table format) in seconds
for the orders table converted to CDC events.

Each timing is the MIN of $SPARK_GRAFT_BENCH_REPS runs (default 3) in one
warm session: min-of-N erases JVM/codegen cold-start landing on whichever
query happens to run first (the r2/r3 ``cdc_upsert_orders`` 8.6s-vs-2.7s
artifact) and is the steady-state number a long-lived cluster would see.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_from_dir(d: str) -> float:
    # accept both ".../sf0.1" and repo-local names like ".../testdata_sf1"
    # (the r9 sf1 artifact was mislabeled sf=-1.0 by a basename-only parse)
    import re

    m = re.search(r"sf([0-9.]+)/*$", d)
    try:
        return float(m.group(1)) if m else -1.0
    except ValueError:
        return -1.0


def bench_ingest(spark, sf_dir: str, upsert: bool) -> float:
    """orders -> CDC envelope rows -> consumer write path, end to end."""
    from pyspark.sql import functions as F

    from debezium_server_iceberg_spark.config import EngineConfig
    from debezium_server_iceberg_spark.lakehouse import LakeCatalog, LakeTable
    from debezium_server_iceberg_spark.operators.dedup import dedup_batch
    from debezium_server_iceberg_spark.operators.merge import merge_into

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    events = orders.select(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
        F.col("o_orderpriority"),
        F.lit("r").alias("__op"),
        (F.col("o_orderkey") % 1000).alias("__source_ts_ms"),
    )
    wh = tempfile.mkdtemp(prefix="bench_wh_")
    try:
        cat = LakeCatalog(wh)
        schema = events.schema
        t = cat.create_table(
            "bench", "orders_cdc", schema,
            identifier_fields=["o_orderkey"] if upsert else [],
        )
        t0 = time.time()
        if upsert:
            deduped = dedup_batch(events, ["o_orderkey"], dedup_column="__source_ts_ms")
            merge_into(t, deduped, keep_deletes=True)
            # second pass: 10% updates exercise the matched-rewrite path
            updates = events.filter(F.col("o_orderkey") % 10 == 0).withColumn(
                "__op", F.lit("u")
            )
            merge_into(t, dedup_batch(updates, ["o_orderkey"], dedup_column="__source_ts_ms"))
        else:
            t.append(events)
        return time.time() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # load average captured BEFORE the session spins up: the field
    # flags EXTERNAL contention (the thing that makes timings
    # non-comparable across rounds); bench's own load would otherwise
    # dominate a run-end sample
    try:
        loadavg_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg_start = None
    from debezium_server_iceberg_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once so query #1 isn't charged ~5s of
    # session initialization (steady-state timings are the comparable metric)
    for t in ("lineitem", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    for name, fn in entrymod.queries().items():
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    timings["ingest_append"] = round(
        min(bench_ingest(spark, sf_dir, upsert=False) for _ in range(reps)), 3
    )
    timings["ingest_upsert"] = round(
        min(bench_ingest(spark, sf_dir, upsert=True) for _ in range(reps)), 3
    )

    total = round(sum(timings.values()), 3)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # The driver's artifact keeps only the LAST ~2000 chars of stdout
    # (BENCH_r10.json: parsed null, tail-truncated) — so the END of this
    # one JSON line must carry the headline: queries ordered
    # fastest-first (the cheap entries are what truncation discards),
    # then the slowest-10 recap, then sf and the total.  Key order
    # survives json.dumps, so a truncated tail still reads
    # ..."slowest_10":{...},"sf":0.1,"value":N}.
    # start-of-run load average (1/5/15 min): timings from a contended
    # box are not comparable across rounds (the r14 verdict's first A/B
    # was distorted by post-test-suite load) — a recorded load field
    # makes every bench artifact self-describing
    payload = {
        "metric": "total_sec",
        "unit": "sec",
        "loadavg": loadavg_start,
        "queries": dict(sorted(timings.items(), key=lambda kv: kv[1])),
        "slowest_10": slowest,
        "sf": _sf_from_dir(sf_dir),
        "value": total,
    }
    line = json.dumps(payload, separators=(",", ":"))
    # The driver only keeps the tail of stdout; persist the full per-query
    # JSON to a file too so timing history is never lossy.  Default target
    # is the UNTRACKED BENCH_last_run.json (gitignored): the committed
    # BENCH_local.json is the idle-box artifact cross-round comparisons
    # use, and the driver's contended per-round run kept clobbering it
    # (r11+r12 verdict hygiene nit).  An idle run that should become the
    # committed artifact sets SPARK_GRAFT_BENCH_OUT=BENCH_local.json.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_last_run.json"
        ),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass
    print(line)
    # Tail-truncation armor (VERDICT r15 item 2): the driver keeps only
    # ~2 KB of stdout, and the full line above has outgrown that twice
    # (r10, r14 — both rounds lost their PERF comparison because the
    # line was cut mid-`queries`).  A SECOND, tiny JSON line printed
    # LAST is always inside any sane tail window, so a truncated
    # artifact still yields a parseable headline record (total + the
    # slowest-10 recap).  Addition-only: the full line above and the
    # file artifact are unchanged.
    print(
        json.dumps(
            {
                "metric": "total_sec",
                "unit": "sec",
                "loadavg": loadavg_start,
                "slowest_10": slowest,
                "sf": payload["sf"],
                "value": total,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
