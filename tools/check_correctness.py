#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column-name
set, and an order-insensitive value hash (columns sorted by name).

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v, huge=False):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        v = float(v)
    if huge and isinstance(v, int):
        # Mimic the driver: DuckDB HUGEINT becomes float64 through its
        # pandas/arrow fetch, so "5" hashes as "5.0" there.  Reproducing that
        # locally means an un-CAST sum() oracle goes red here, not just in
        # CORRECTNESS_r{N}.json (VERDICT r2 item 7).
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round defensively: engine-identical doubles stay identical anyway
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        # propagate huge: a HUGEINT nested in a LIST column must get the
        # same float normalization as a top-level one (ADVICE r3)
        return "[" + ",".join(_norm_cell(x, huge) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str], huge_cols=()) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i], colnames[i] in huge_cols) for i in order)
        for r in rows
    )
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=None, help="write driver-shaped results JSON here")
    ap.add_argument(
        "--driver-memory",
        default=None,
        help="JVM heap for the (otherwise vanilla) session. Leave unset to "
        "mirror the driver harness exactly (its 1g default); set e.g. 8g "
        "for sf1+ runs, where a 1g heap fails legitimate broadcast builds "
        "that any real deployment would have memory for — capacity, not "
        "query semantics",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Deliberately a VANILLA session (not session.get_spark()): the driver's
    # harness builds its own plain SparkSession, so any conf the queries need
    # (e.g. nanosAsLong for events.parquet) must be set inside the queries
    # themselves.  Round 1 missed that because this tool used get_spark().
    # getOrCreate() silently reuses any live session with its configs, which
    # would void the vanilla-conf guarantee — stop it first (ADVICE r2).
    # stop both the thread-local active session AND the process-wide default:
    # a session created in another thread is invisible to getActiveSession()
    # but still reused by getOrCreate() (ADVICE r3)
    for live in (SparkSession.getActiveSession(), SparkSession._instantiatedSession):
        if live is not None:
            live.stop()
    builder = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .appName("check_correctness")
    )
    if args.driver_memory:
        builder = builder.config("spark.driver.memory", args.driver_memory)
    spark = builder.getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    results: dict[str, dict] = {}

    def record(name, rows_match, schema_match, hash_match, s_rows, d_rows, err):
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": s_rows,
            "oracle_rows": d_rows,
            "err": err,
        }

    for name in names:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            record(name, None, None, None, None, None, f"spark error: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"weak  {name}: rows={len(s_rows)} (no oracle) [{t_spark:.1f}s]")
            record(name, None, None, None, len(s_rows), None, "no_oracle")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            huge_cols = {
                # substring match catches nested types too: 'HUGEINT[]',
                # 'STRUCT(x HUGEINT)' (ADVICE r3)
                c for c, t in zip(d_cols, rel.types) if "HUGEINT" in str(t).upper()
            }
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            record(name, None, None, None, len(s_rows), None, f"duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} != {sorted(d_cols)}")
        if not problems:
            hs = value_hash(s_rows, s_cols)
            hd = value_hash(d_rows, d_cols, huge_cols)
            if hs != hd:
                problems.append("value hash mismatch")
                # print first differing normalized rows for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                ls = sorted("\x01".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                ld = sorted(
                    "\x01".join(_norm_cell(r[i], d_cols[i] in huge_cols) for i in order_d)
                    for r in d_rows
                )
                for a, b in zip(ls, ld):
                    if a != b:
                        print(f"      spark : {a[:220]}")
                        print(f"      duckdb: {b[:220]}")
                        break
        record(
            name,
            len(s_rows) == len(d_rows),
            sorted(s_cols) == sorted(d_cols),
            not problems,
            len(s_rows),
            len(d_rows),
            None,
        )
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{t_spark:.1f}s]")
            failures += 1
        else:
            print(f"ok    {name}: rows={len(s_rows)} [{t_spark:.1f}s]")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if args.out:
        import json as _json

        with open(args.out, "w") as fh:
            _json.dump(results, fh, indent=2)
        print(f"wrote {args.out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
