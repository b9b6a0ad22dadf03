#!/usr/bin/env python
"""Synthesize an sf1 slice by replicating the driver's sf0.1 tables x10
with key-offset remapping, preserving every foreign-key relationship
(orders->customer, lineitem->orders/part/supplier, events/documents/
embeddings ids disjoint per replica; nation/region are fixed dimensions).

Purpose: SCALE validation (VERDICT r7 item 3) — correctness gates compare
Spark vs DuckDB over the SAME files, so they stay meaningful on this
synthesized slice; bench numbers show how each operator scales 10x.
The driver's own sf dirs are read-only and untouched; output goes to
testdata_sf1/ inside the repo (gitignored — ~170 MB of derived data).

Usage: python tools/make_sf1.py [--out /root/repo/testdata_sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key column -> stride source: replicate by adding i * stride(col)
# strides are per-table max+1 of the PK so replicas never collide
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "part": {"p_partkey": "p_partkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # strides from the PK domain of each referenced table
    strides: dict[str, int] = {}
    for tbl, cols in KEYED.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        for col in cols.values():
            if col in t.column_names:
                m = pc.max(t.column(col)).as_py()
                strides[col] = max(strides.get(col, 0), int(m) + 1)

    for tbl in COPY_ONLY:
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        pq.write_table(t, os.path.join(args.out, f"{tbl}.parquet"))
        print(f"{tbl}: copied {t.num_rows}")

    for tbl, cols in KEYED.items():
        t = pq.read_table(os.path.join(SRC, f"{tbl}.parquet"))
        reps = []
        for i in range(args.copies):
            if i == 0:
                reps.append(t)
                continue
            arrays = []
            for name in t.column_names:
                col = t.column(name)
                if name in cols:
                    off = i * strides[cols[name]]
                    col = pc.add(col, pa.scalar(off, type=col.type))
                arrays.append(col)
            reps.append(pa.Table.from_arrays(arrays, schema=t.schema))
        out = pa.concat_tables(reps)
        pq.write_table(
            out,
            os.path.join(args.out, f"{tbl}.parquet"),
            row_group_size=1_000_000,
        )
        print(f"{tbl}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
