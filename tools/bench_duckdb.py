#!/usr/bin/env python3
"""Dev tool: time the oracle SQL suite in DuckDB over an sf directory.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [timeoutSec]

The yardstick side of PERF.md's engine-vs-DuckDB comparison: runs each
oracle query (same SQL the correctness gate uses) against the same
parquet, PRAGMA threads matching the engine's core count, and prints
per-query seconds. Queries that exceed the timeout are interrupted and
reported as >timeout — at larger scales DuckDB's un-blocked quadratic
shapes (e.g. q30's pair verify) stop terminating in useful time, which
is itself the measurement.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, oracle_json: str, timeout: float = 300.0) -> None:
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    total, timeouts = 0.0, []
    results = {}
    for name, sql in oracles.items():
        timer = threading.Timer(timeout, con.interrupt)
        timer.start()
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            results[name] = round(dt, 3)
            total += dt
        except duckdb.Error as e:
            dt = time.time() - t0
            if dt >= timeout - 1:
                results[name] = f">{timeout:.0f}"
                timeouts.append(name)
                total += dt
            else:
                results[name] = f"ERR {e}"
        finally:
            timer.cancel()
        print(f"{name}: {results[name]}", flush=True)
    print(json.dumps({"total_sec": round(total, 1), "timeouts": timeouts,
                      "queries": results}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 300.0)
