#!/usr/bin/env python3
"""Reproducible q21_waiting_supplier floor artifact (VERDICT r15 ask #2).

One invocation produces, IN THE SAME SESSION on the same machine:
  1. the Spark side: `BenchOne q21_waiting_supplier` (warmup + min of 3)
     with SPARK_GRAFT_BENCH_TRACE=1, so the timed run's per-job start
     offsets and durations are captured — the floor decomposition
     (broadcast build + exchange+cascade + save) as re-runnable data
     instead of a README claim;
  2. the DuckDB side: the SAME oracle SQL the correctness gate uses,
     PRAGMA threads=32, min of 8 runs (DuckDB's own minima vary ~30%
     across 3-run samples — the r15 judge measured both).

Writes tools/q21_floor.json. Usage:

  python3 tools/q21_floor.py [sf_dir] [oracle_sql.json]

sf_dir defaults to /root/testdata/sf0.1. oracle_sql.json defaults to the
newest /tmp/vout*/oracle_sql.json (any `graft.Verify` dump has it; run
`sbt -batch "runMain graft.Verify <sf0.01> /tmp/vout"` first if none).
"""
import glob
import json
import os
import re
import subprocess
import sys
import time

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
QUERY = "q21_waiting_supplier"


def newest_oracle_json():
    cands = sorted(glob.glob("/tmp/vout*/oracle_sql.json"),
                   key=os.path.getmtime, reverse=True)
    if not cands:
        sys.exit("no /tmp/vout*/oracle_sql.json found — run graft.Verify "
                 "first or pass the path explicitly")
    return cands[0]


def spark_side(repo, sf):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_TRACE="1")
    p = subprocess.run(
        ["sbt", "-batch", f"runMain graft.BenchOne {QUERY}"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    out = p.stdout + p.stderr
    m = re.search(
        rf"BENCHONE {QUERY} min=([\d.]+) jobs=(\d+) stages=(\d+) runs=([\d.,]+)",
        out)
    if not m:
        sys.exit(f"BenchOne produced no result line; tail:\n{out[-3000:]}")
    n_jobs = int(m.group(2))
    trace = [
        {"job_id": int(t.group(1)), "start_offset_sec": float(t.group(2)),
         "duration_sec": float(t.group(3)), "name": t.group(4).strip()}
        for t in re.finditer(
            r"TRACEJOB id=(\d+) at=([\d.]+) dur=([\d.]+) (.*)", out)
    ]
    # the timed-run jobs are the LAST n_jobs trace lines (warmup +
    # earlier timed runs emit the preceding ones; the printed jobs=
    # counter covers the final run only)
    last_run = trace[-n_jobs:] if n_jobs and len(trace) >= n_jobs else trace
    return {
        "min_sec": float(m.group(1)),
        "runs_sec": [float(x) for x in m.group(4).split(",")],
        "jobs": n_jobs,
        "stages": int(m.group(3)),
        "last_run_job_trace": last_run,
        "serialized_job_sum_sec": round(
            sum(j["duration_sec"] for j in last_run), 3),
    }


def duckdb_side(sf, sql, n_runs=8):
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    runs = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        runs.append(round(time.monotonic() - t0, 4))
    return {"min_sec": min(runs), "runs_sec": runs,
            "threads": 32, "duckdb_version": duckdb.__version__}


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else newest_oracle_json()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sql = json.load(open(oracle_path))[QUERY]
    spark = spark_side(repo, sf)
    duck = duckdb_side(sf, sql)
    artifact = {
        "query": QUERY,
        "sf_dir": sf,
        "generated_unix": int(time.time()),
        "spark": spark,
        "duckdb": duck,
        "ratio_spark_over_duckdb": round(
            spark["min_sec"] / duck["min_sec"], 3),
        "note": "spark min is BenchOne protocol (cold JVM, warmup + min of "
                "3) — full-bench warm minima run lower; trace rows are the "
                "final timed run's jobs, serialized end-to-end",
    }
    out = os.path.join(repo, "tools", "q21_floor.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
