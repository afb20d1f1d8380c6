#!/usr/bin/env python3
"""One-shot DuckDB twin runner (dev tooling, like selfcheck.py).

Reads a JSON request on stdin:
    {"views": {"ontime": "/path/ontime.parquet/*.parquet"},
     "sql": "SELECT ...", "reps": 5}
runs 1 warmup + `reps` timed executions of `sql`, and prints ONE JSON
line {"reps": [..seconds..]} on stdout.

graft.BenchScale shells out to this per query, immediately after that
query's Spark repetitions — so the Spark and DuckDB timings of every
query share one measurement window (same machine state, same page
cache, same background noise). The round-7 artifact's headline ratio
moved 2.40x -> 3.11x purely because the twin was re-timed in a
different window; window-pairing removes that failure mode.
"""
import json
import sys
import time

import duckdb


def main():
    req = json.load(sys.stdin)
    con = duckdb.connect()
    for name, glob in req["views"].items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{glob}')")
    sql = req["sql"]
    con.execute(sql).fetchall()  # warmup
    out = []
    for _ in range(int(req["reps"])):
        t0 = time.time()
        con.execute(sql).fetchall()
        out.append(time.time() - t0)
    print(json.dumps({"reps": [round(r, 4) for r in out]}))


if __name__ == "__main__":
    main()
