#!/usr/bin/env python3
"""Time the DuckDB oracle suite — the pinned baseline for BASELINE.md.

Usage: python3 tools/bench_oracle.py <sfDir> <oracleSqlJson> [reps]

Runs every oracle SQL from the Verify dump in a single DuckDB process
over the sfDir parquet tables, fully materializing each result
(fetchall), and prints one JSON line with per-query and total seconds
(best of `reps`, default 3 — the baseline is DuckDB at its best).
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json, reps=3):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    total = round(sum(times.values()), 3)
    print(json.dumps({"metric": "oracle_total", "value": total,
                      "unit": "sec", "queries": times, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
