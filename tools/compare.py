#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same sfDir parquet tables, and compares: row count, column names,
dtype families, and values (exact, after sorting columns by name and
rows by all columns — a superset of whatever the driver hashes).

Float columns are compared BIT-STRICTLY (round-10 lesson: a round(9)
+ string compare hid a -0.0 vs +0.0 mismatch the driver's hash saw):
each float64 is mapped to its IEEE-754 total-order bit key (16 hex
digits — monotone in value, signed-zero-sensitive, NaN-by-payload),
which serves as both the row-sort key and the equality value.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd


def float_bits_key(s: pd.Series) -> pd.Series:
    """IEEE-754 total-order key: -NaN < -inf < … < -0.0 < +0.0 < … < +NaN.

    Fixed-width hex so lexicographic string order == numeric order, and
    equality is exact bit equality (distinguishes -0.0 from +0.0 and
    NaN payloads). Nulls become NaN first (pandas float64 cannot carry
    null and NaN distinctly, and neither does the driver's view).
    """
    v = s.to_numpy(dtype="float64", na_value=np.nan).view(np.uint64)
    key = np.where((v >> np.uint64(63)) == 0,
                   v | np.uint64(1 << 63), ~v)
    vals = v.view(np.float64)
    return pd.Series([f"{k:016x} {x!r}" for k, x in zip(key, vals)],
                     index=s.index)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = float_bits_key(s)
        elif pd.api.types.is_datetime64_any_dtype(s):
            s2 = s
            try:
                s2 = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                try:
                    s2 = s.dt.tz_convert(None)
                except (TypeError, AttributeError):
                    pass
            out[c] = s2.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif s.dtype == object and s.dropna().size and all(
                hasattr(v, "year") for v in s.dropna().head(5)):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        else:
            out[c] = s.astype(str)
    res = pd.DataFrame(out)
    res = res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True)
    return res


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Optional third arg / env: DuckDB thread count. The repeated-compare
    # sweep runs this script 3x against ONE fixed engine dump to roll the
    # oracle's own fold-order dice; pinning a DIFFERENT thread count per
    # pass (e.g. 1 / 7 / 32) makes those passes roll genuinely different
    # oracle partitionings instead of re-rolling the same layout
    # (VERDICT r11 item 5).
    threads = None
    if len(sys.argv) > 3:
        threads = int(sys.argv[3])
    elif "COMPARE_DUCKDB_THREADS" in __import__("os").environ:
        threads = int(__import__("os").environ["COMPARE_DUCKDB_THREADS"])
    if threads:
        con.execute(f"PRAGMA threads={threads}")
        print(f"[compare] duckdb threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    npass = nfail = 0
    import glob
    produced = sorted(
        p.rstrip("/").split("/")[-1] for p in glob.glob(f"{out_dir}/*/"))
    for name in produced:
        try:
            mine = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            nfail += 1
            continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(mine)} rows)")
            continue
        try:
            ref = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e).splitlines()[0]}")
            nfail += 1
            continue
        a, b = normalize(mine), normalize(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            nfail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            nfail += 1
            continue
        if a.equals(b):
            print(f"PASS {name} ({len(a)} rows)")
            npass += 1
        else:
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} rows differ")
            idx = bad[bad].index[:3]
            for i in idx:
                cols = [c for c in a.columns if neq.at[i, c]]
                print(f"  row {i} differs in {cols}:")
                print(f"    engine: {a.loc[i, cols].to_dict()}")
                print(f"    oracle: {b.loc[i, cols].to_dict()}")
            nfail += 1
    print(f"\n{npass} pass, {nfail} fail, {len(produced)} produced, "
          f"{len(oracle)} oracles")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
