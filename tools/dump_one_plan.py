#!/usr/bin/env python
"""Dump one gate's formatted physical plan to stdout (same
localCheckpoint-spy convention as dump_plans.py — procedural gates are
documented by the LAST pre-checkpoint plan, the frame the gate's final
checkpoint collapsed).  Usage:

    python tools/dump_one_plan.py GATE [SF_DIR]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().strip()


def main() -> None:
    from pyspark.sql.classic.dataframe import DataFrame

    from debezium_server_iceberg_spark import queries as qmod
    from debezium_server_iceberg_spark.session import get_spark

    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="dump_one_plan")
    captured: dict[str, str] = {}
    orig_ckpt = DataFrame.localCheckpoint

    def spy(self, eager=True):
        captured["pre"] = _fmt(self)
        return orig_ckpt(self, eager)

    DataFrame.localCheckpoint = spy
    try:
        df = qmod.queries()[name](spark, sf)
        plan = captured.get("pre") or _fmt(df)
        note = (
            "(pre-checkpoint plan — the returned frame is a checkpoint "
            "stub)\n\n"
            if "pre" in captured
            else ""
        )
        print(f"# {name} @ {sf}\n{note}{plan}")
    finally:
        DataFrame.localCheckpoint = orig_ckpt
        spark.stop()


if __name__ == "__main__":
    main()
