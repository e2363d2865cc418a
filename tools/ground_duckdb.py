#!/usr/bin/env python3
"""DuckDB self-grounding over the WHOLE oracle-comparable bench set
(VERDICT r17 ask #2): re-measure the bench-vs-baseline ratio on the
CURRENT box instead of carrying the r16 number.

Protocol (same as the r15/r16 judge runs documented in README):
  - DuckDB PRAGMA threads=32, every headline query that has oracle SQL,
    min of N runs (default 3) per query after one warmup run;
  - the Spark side is read from an existing bench_result.json (the full
    Bench sweep's per-query minima — pass its path), restricted to the
    same query set;
  - ratio = sum(spark minima) / sum(duckdb minima) over the common set.

Usage:
  python3 tools/ground_duckdb.py <bench_result.json> [sf_dir] [oracle_sql.json] [out.json]

sf_dir defaults to /root/testdata/sf0.1. oracle_sql.json defaults to the
newest /tmp/vout*/oracle_sql.json (run `sbt "runMain graft.Verify ..."`
first if none). Writes tools/ground_duckdb.json by default.
"""
import glob
import json
import os
import sys
import time

import duckdb

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
N_RUNS = 3


def newest_oracle_json():
    cands = sorted(glob.glob("/tmp/vout*/oracle_sql.json"),
                   key=os.path.getmtime, reverse=True)
    if not cands:
        sys.exit("no /tmp/vout*/oracle_sql.json found — run graft.Verify "
                 "first or pass the path explicitly")
    return cands[0]


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    bench_path = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[3] if len(sys.argv) > 3 else newest_oracle_json()
    out_path = sys.argv[4] if len(sys.argv) > 4 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ground_duckdb.json")

    bench = json.load(open(bench_path))
    spark_q = bench["queries"] if "queries" in bench else bench
    oracle_sql = json.load(open(oracle_path))

    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    common = sorted(q for q in spark_q
                    if q in oracle_sql and oracle_sql[q] and spark_q[q] > 0)
    per_query, failed = {}, []
    for q in common:
        sql = oracle_sql[q]
        try:
            con.execute(sql).fetchall()  # warmup
            runs = []
            for _ in range(N_RUNS):
                t0 = time.monotonic()
                con.execute(sql).fetchall()
                runs.append(round(time.monotonic() - t0, 4))
            per_query[q] = {"duckdb_min_sec": min(runs),
                            "duckdb_runs_sec": runs,
                            "spark_min_sec": spark_q[q],
                            "ratio": round(spark_q[q] / max(min(runs), 1e-4), 2)}
        except Exception as e:  # noqa: BLE001 — grounding must not die on one query
            failed.append({"query": q, "error": str(e)[:200]})

    spark_total = sum(v["spark_min_sec"] for v in per_query.values())
    duck_total = sum(v["duckdb_min_sec"] for v in per_query.values())
    artifact = {
        "sf_dir": sf,
        "generated_unix": int(time.time()),
        "bench_source": bench_path,
        "n_queries": len(per_query),
        "spark_total_sec": round(spark_total, 3),
        "duckdb_total_sec": round(duck_total, 3),
        "ratio_spark_over_duckdb": round(spark_total / duck_total, 3),
        "threads": 32,
        "duckdb_version": duckdb.__version__,
        "n_runs_per_query": N_RUNS,
        "failed": failed,
        "per_query": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in (
        "n_queries", "spark_total_sec", "duckdb_total_sec",
        "ratio_spark_over_duckdb")}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
