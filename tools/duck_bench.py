#!/usr/bin/env python3
"""Time each SparkEntry oracle SQL in DuckDB (min-of-2, same machine) —
produces the BASELINE.md comparison column. Usage:

  python3 tools/duck_bench.py [sfDir] [oracle_sql.json]

oracle_sql.json defaults to the most recent Verify dump's copy; run
tools/verify_local.py first if it doesn't exist.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r5b/oracle_sql.json"
    oracles = json.loads(Path(oracle_path).read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    # warm-up pass (page cache + duckdb compile), then two timed passes
    for name, sql in sorted(oracles.items()):
        con.execute(sql).fetchall()
    results = {}
    for _ in range(2):
        for name, sql in sorted(oracles.items()):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            results[name] = min(results.get(name, 1e9), dt)
    total = sum(results.values())
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "methodology": "min_of_passes",
                      "passes": 2, "queries": results, "sf": sf}))


if __name__ == "__main__":
    main()
