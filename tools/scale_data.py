#!/usr/bin/env python3
"""Dev tool: replicate an sf directory N× with per-replica key offsets.

Usage: python3 tools/scale_data.py <srcSfDir> <dstDir> <replicas>

Join keys are offset by replica*STRIDE so every FK still lands inside
its own replica (the scaled corpus is N independent copies of the
world sharing the fixed region/nation dims — the same shape a 10×
TPC-H scale-up has). Non-key content is byte-identical, so text-dedup
groups grow N-wide — bounded, and exactly what the distinct-signature
LSH paths are built for. pyarrow round-trips the source schema (incl.
nanosecond timestamps) untouched.

Perf-evidence use only (PERF.md §scale) — correctness stays pinned to
the driver-generated /root/testdata dirs.
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000

OFFSET_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # region/nation: fixed dims, single copy
    "region": None,
    "nation": None,
}


def main(src: str, dst: str, replicas: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name, keys in OFFSET_COLS.items():
        t = pq.read_table(f"{src}/{name}.parquet")
        if keys is None:
            out = t
        else:
            parts = []
            for r in range(replicas):
                if r == 0:
                    parts.append(t)
                    continue
                cols = []
                for field in t.schema:
                    col = t.column(field.name)
                    if field.name in keys:
                        col = pc.add(col, pa.scalar(r * STRIDE, field.type))
                    cols.append(col)
                parts.append(pa.table(cols, schema=t.schema))
            out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
