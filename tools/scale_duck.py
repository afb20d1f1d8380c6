#!/usr/bin/env python3
"""LEGACY DuckDB twin merger (pre-r8 artifacts only): since r8 the
twin is WINDOW-PAIRED inside graft.BenchScale via tools/duck_once.py,
so fresh artifacts never need this script. Kept to re-derive ratios
for old reports.

Original behavior:
runs the same B2/B3/B4 statements over the same generated parquet,
with the same method (1 warmup + 5 timed reps, p50 = median,
p95 = max), and merges per-query timings + ratios into the
BENCH_SCALE report produced by the Spark side.

Usage: python3 tools/scale_duck.py [BENCH_SCALE_r06.json] [bench_data_root]
"""
import json
import statistics
import sys
import time

import duckdb

REPORT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_SCALE_r06.json"
ROOT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/bench_data"
# optional tag filter ("sf1,sf100"): re-twin only the listed sections
# (a re-measured Spark point needs its duck fields refreshed without
# re-timing every other scale's twin)
TAGS = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

# keep in sync with BenchScale.workload (name -> duck sql)
QUERIES = {
    "a1_count": "SELECT count(*) FROM ontime",
    "a2_agg_1pred": "SELECT sum(ArrDelay), min(DepDelay), max(ArrDelay), avg(DepDelay) FROM ontime WHERE Carrier = 'C03'",
    "a3_agg_2pred": "SELECT count(*), sum(ArrDelay), avg(ArrDelay) FROM ontime WHERE OriginState = 'S05' AND DepDelay > 10",
    "a4_groupby_1dim": "SELECT Carrier, count(*) AS c FROM ontime GROUP BY Carrier ORDER BY c DESC LIMIT 20",
    "a5_groupby_2dim": "SELECT Origin, Dest, avg(ArrDelay) AS a FROM ontime WHERE Cancelled = 0 GROUP BY Origin, Dest ORDER BY a DESC LIMIT 100",
    "a6_groupby_3dim": "SELECT DaysSinceEpoch, Carrier, OriginState, sum(DepDelay) AS s, count(*) FROM ontime WHERE ArrDelay > 0 GROUP BY DaysSinceEpoch, Carrier, OriginState ORDER BY s DESC LIMIT 100",
    "s1_filter_topn": "SELECT Origin, Dest, Carrier, ArrDelay FROM ontime WHERE ArrDelay > 300 ORDER BY ArrDelay DESC LIMIT 50",
    "s2_page": "SELECT DaysSinceEpoch, FlightNum, Origin FROM ontime ORDER BY DaysSinceEpoch, FlightNum LIMIT 100 OFFSET 1000",
    "s3_point_topn": "SELECT Carrier, DepDelay FROM ontime WHERE Dest = 'A07' ORDER BY DepDelay DESC LIMIT 10",
    "h1_hll": "SELECT approx_count_distinct(FlightNum) FROM ontime",
    "h2_pctest": "SELECT approx_quantile(ArrDelay, 0.5), approx_quantile(ArrDelay, 0.95) FROM ontime",
}

REPS = 5

# sf10000 heavy-shape twins not in QUERIES (duckdb's hash() differs
# from xxhash64 in values but not in distribution — the near-unique
# histogram twin measures the same ~8e8-distinct-key workload)
HEAVY = {
    "g1_grouped_pctl":
        "SELECT Carrier, quantile_cont(ArrDelay, 0.5) AS p50, quantile_cont(ArrDelay, 0.95) AS p95 "
        "FROM ontime GROUP BY Carrier ORDER BY p50 DESC LIMIT 15",
    "g2_nearunique_pctl":
        "SELECT quantile_cont(v, 0.5), quantile_cont(v, 0.95) FROM "
        "(SELECT CAST(hash(FlightNum, ArrTime, Distance) % 2147483648 AS DOUBLE) AS v FROM ontime)",
}


def time_sql(con, sql, reps=REPS):
    con.execute(sql).fetchall()  # warmup
    out = []
    for _ in range(reps):
        t0 = time.time()
        con.execute(sql).fetchall()
        out.append(time.time() - t0)
    return out


def merge_heavy(report, root, tag="sf10000", subdir=None):
    """Heavy-shape sections (sf1000heavy / sf10000): twin a6/h1/g1/g2
    + the a4/a5 scan entries; routed entries reuse the scan twin's
    duck_p50 (DuckDB has no rollup artifact — the routed ratio shows
    the engine capability against DuckDB's best raw-parquet answer)."""
    sec = report.get(tag)
    if not sec:
        return
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ontime AS SELECT * FROM read_parquet('{root}/scale_{subdir or tag}/ontime.parquet/*.parquet')")
    for part, statements in (("heavy", {**QUERIES, **HEAVY}), ("scan", QUERIES)):
        for name, q in sec.get(part, {}).items():
            if not isinstance(q, dict) or name not in statements:
                continue
            reps = time_sql(con, statements[name], reps=3)
            q["duck_p50"] = round(statistics.median(reps), 3)
            q["duck_reps"] = [round(r, 3) for r in reps]
            if q["duck_p50"] > 0:
                q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
    for part in ("routed", "dict"):
        for name, q in sec.get(part, {}).items():
            if not isinstance(q, dict):
                continue
            base = sec.get("scan", {}).get(name, {}) or \
                sec.get("heavy", {}).get(name, {})
            if "duck_p50" in base:
                q["duck_p50"] = base["duck_p50"]
                if q["duck_p50"] > 0:
                    q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
    con.close()
    print(f"[duck] {tag} done")


def main():
    with open(REPORT) as f:
        report = json.load(f)
    for tag in ("sf1", "sf100", "sf1000"):
        sec = report.get(tag)
        if not sec or (TAGS is not None and tag not in TAGS):
            continue
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW ontime AS SELECT * FROM read_parquet('{ROOT}/scale_{tag}/ontime.parquet/*.parquet')")
        for name, sql in QUERIES.items():
            con.execute(sql).fetchall()  # warmup
            reps = []
            for _ in range(REPS):
                t0 = time.time()
                con.execute(sql).fetchall()
                reps.append(time.time() - t0)
            q = sec["queries"].get(name)
            if q is not None:
                q["duck_p50"] = round(statistics.median(reps), 3)
                q["duck_p95"] = round(max(reps), 3)
                q["duck_reps"] = [round(r, 3) for r in reps]
                if q["duck_p50"] > 0:
                    q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
        # sorted-layout section: same statements over the sorted copy
        # THE SPARK SIDE READ — a2/a3 use the Carrier-sorted copy, the
        # ordered-read pages use copies sorted on their ORDER BY primary
        SORTED_COPY = {
            "a2_agg_1pred": "ontime_sorted",
            "a3_agg_2pred": "ontime_sorted",
            "s2_page": "ontime_sorted_dse",
            "s3_point_topn": "ontime_sorted_dep",
        }
        if sec.get("sorted"):
            for view in sorted(set(SORTED_COPY.values())):
                con.execute(
                    f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{ROOT}/scale_{tag}/{view}.parquet/*.parquet')")
            for name, q in sec["sorted"].items():
                if not isinstance(q, dict) or name not in QUERIES:
                    continue
                sql = QUERIES[name].replace("FROM ontime",
                                            "FROM " + SORTED_COPY[name])
                con.execute(sql).fetchall()  # warmup
                reps = []
                for _ in range(REPS):
                    t0 = time.time()
                    con.execute(sql).fetchall()
                    reps.append(time.time() - t0)
                q["duck_p50"] = round(statistics.median(reps), 3)
                if q["duck_p50"] > 0:
                    q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
        # pipeline twins: the DuckDB-expressible subset (token stats,
        # exact dedup). Near-dup/knn carry self-oracles (planted-pair
        # recall, brute-force ground truth) instead of a twin.
        if sec.get("pipeline"):
            con.execute(
                f"CREATE VIEW docs AS SELECT * FROM read_parquet('{ROOT}/scale_{tag}/documents.parquet/*.parquet')")
            PIPE = {
                "p1_token_stats":
                    "SELECT avg(len(string_split(text, ' '))), count(*) FROM docs",
                "p3_dedup_exact":
                    "SELECT count(*) FROM (SELECT md5(text) AS f, min(doc_id) FROM docs GROUP BY f)",
            }
            for name, sql in PIPE.items():
                q = sec["pipeline"].get(name)
                if q is None:
                    continue
                con.execute(sql).fetchall()  # warmup
                reps = []
                for _ in range(REPS):
                    t0 = time.time()
                    con.execute(sql).fetchall()
                    reps.append(time.time() - t0)
                q["duck_p50"] = round(statistics.median(reps), 3)
                if q["duck_p50"] > 0:
                    q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
        # native-layout section: the engine ran on its own segment
        # format (time-sorted copy + dict/star-tree/sketch sidecars,
        # automatic routing) — the twin reads the SAME time-sorted
        # parquet files, so both engines see identical bytes and the
        # sidecar artifacts are the engine capability under test
        if sec.get("native"):
            con.execute(
                f"CREATE VIEW ontime_native AS SELECT * FROM read_parquet('{ROOT}/scale_{tag}/ontime_sorted_dse.parquet/*.parquet')")
            nqueries = sec["native"].get("queries", {})
            for name, q in nqueries.items():
                if not isinstance(q, dict) or name not in QUERIES:
                    continue
                sql = QUERIES[name].replace("FROM ontime", "FROM ontime_native")
                reps = time_sql(con, sql)
                q["duck_p50"] = round(statistics.median(reps), 3)
                q["duck_reps"] = [round(r, 3) for r in reps]
                if q["duck_p50"] > 0:
                    q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
            for cls, csec in sec["native"].get("classes", {}).items():
                qs = [q for q in nqueries.values()
                      if isinstance(q, dict) and q.get("class") == cls and "duck_p50" in q]
                duck_total = sum(q["duck_p50"] for q in qs)
                csec["duck_total_p50"] = round(duck_total, 3)
                if duck_total > 0:
                    csec["ratio_p50"] = round(csec["total_p50"] / duck_total, 2)
        # star-tree-routed and dictionary-routed reruns reuse the same
        # duck statement by name (DuckDB has no rollup/dict artifact —
        # the ratio shows the engine capability against DuckDB's best
        # raw-parquet answer)
        for part in ("routed", "dict"):
            for name, q in sec.get(part, {}).items():
                if not isinstance(q, dict) or name not in QUERIES:
                    continue
                base = sec["queries"].get(name, {})
                if "duck_p50" in base:
                    q["duck_p50"] = base["duck_p50"]
                    if q["duck_p50"] > 0:
                        q["ratio_p50"] = round(q["p50"] / q["duck_p50"], 2)
        # per-class totals + ratios
        for cls, csec in sec.get("classes", {}).items():
            qs = [q for q in sec["queries"].values() if q["class"] == cls and "duck_p50" in q]
            duck_total = sum(q["duck_p50"] for q in qs)
            csec["duck_total_p50"] = round(duck_total, 3)
            if duck_total > 0:
                csec["ratio_p50"] = round(csec["total_p50"] / duck_total, 2)
        con.close()
        print(f"[duck] {tag} done")
    if TAGS is None or "sf1000heavy" in TAGS:
        merge_heavy(report, ROOT, "sf1000heavy", subdir="sf1000")
    if TAGS is None or "sf10000" in TAGS:
        merge_heavy(report, ROOT)
    with open(REPORT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[duck] merged into {REPORT}")


if __name__ == "__main__":
    main()
