#!/usr/bin/env python
"""Per-gate driver-action profiler (guide §1: measure first).

Monkeypatches every driver-blocking DataFrame action and the write paths,
runs the named gates once each, and prints, per gate: total wall, Spark job
count, and the top action call-sites by accumulated wall time.  Call-site
attribution = innermost repo frame outside this file.

Usage: python tools/profile_gate.py [--sf DIR] gate [gate...]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_records: list[tuple[str, str, float]] = []  # (action, site, secs)


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if fn.startswith(REPO) and "profile_gate" not in fn and "/tools/" not in fn:
            return f"{os.path.relpath(fn, REPO)}:{fr.lineno}"
    return "?"


def _wrap(cls, name, label=None):
    orig = getattr(cls, name)
    lab = label or name

    def wrapper(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            _records.append((lab, _site(), time.time() - t0))

    setattr(cls, name, wrapper)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    # Spark 4: pyspark.sql.DataFrame is the compat facade; the instances
    # gates actually hold are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES these methods — wrapping only the facade recorded
    # none of the collect/toPandas/checkpoint actions (r15's profiles
    # under-attributed everything but the writer calls).  Wrap both.
    targets = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

        targets.append(_ClassicDF)
    except ImportError:
        pass
    for cls in targets:
        for m in ("collect", "count", "toPandas", "first", "head",
                  "localCheckpoint", "persist", "isEmpty"):
            if m in cls.__dict__:  # wrap only real overrides, once each
                _wrap(cls, m)
    for m in ("save", "parquet", "csv", "json"):
        _wrap(DataFrameWriter, m, f"write.{m}")

    from debezium_server_iceberg_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="profile")
    qs = entrymod.queries()
    # warm
    for t in ("lineitem", "events", "documents", "embeddings", "orders"):
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()
    _records.clear()

    for name in args.names:
        fn = qs[name]
        sc = spark.sparkContext
        fn(spark, args.sf).count()  # warm: codegen + footers
        sc.setJobGroup(name, name)
        tracker = sc.statusTracker()
        jobs_before = set(tracker.getJobIdsForGroup(name))
        _records.clear()
        t0 = time.time()
        df = fn(spark, args.sf)
        t_build = time.time() - t0
        df.count()
        wall = time.time() - t0
        jobs = len(set(tracker.getJobIdsForGroup(name)) - jobs_before)
        agg = collections.defaultdict(lambda: [0, 0.0])
        for act, site, secs in _records:
            k = f"{act:16s} {site}"
            agg[k][0] += 1
            agg[k][1] += secs
        print(f"\n=== {name}: wall {wall:.2f}s (build+actions {t_build:.2f}s) "
              f"jobs={jobs}")
        for k, (n, s) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:20]:
            print(f"  {s:7.2f}s  x{n:<3d} {k}")
        sc.setJobGroup("", "")


if __name__ == "__main__":
    main()
