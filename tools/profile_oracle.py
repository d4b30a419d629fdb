#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (driver-budget profiling — VERDICT r8
ask #1: the full sweep must stay comfortably inside the driver's
correctness time budget, so the slowest oracle SQLs get found and
cheapened here, not discovered as an empty CORRECTNESS file).

Usage: python3 tools/profile_oracle.py <sfDir> <verifyOutDir> [topN]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    t_all = time.time()
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            times[name] = time.time() - t0
        except Exception as e:
            times[name] = time.time() - t0
            print(f"ERR {name}: {e}", flush=True)
        if times[name] > 1.0:
            print(f"SLOW {times[name]:8.2f}s  {name}", flush=True)
    total = time.time() - t_all
    print(f"== total {total:.1f}s over {len(times)} oracles ==")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{t:8.2f}s  {name}")


if __name__ == "__main__":
    main()
