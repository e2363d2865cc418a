#!/usr/bin/env python3
"""Local pre-check that mimics the driver's DuckDB correctness gate.

Usage: python3 tools/check_correctness.py <sf_dir> <verify_out_dir>

Compares each <out>/<name> parquet (written by graft.Verify) against the
oracle SQL in <out>/oracle_sql.json executed by DuckDB over the same
testdata parquet. Sorts columns by name and rows by all columns, then
compares values exactly (floats exactly too — the engine is expected to
produce bit-identical deterministic results; see Queries.scala header).
"""
import glob
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got, want = norm(got), norm(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (g, w) in enumerate(zip(gv, wv)):
                if not values_equal(g, w):
                    bad = (c, i, g, w)
                    break
            if bad:
                break
        if bad:
            c, i, g, w = bad
            print(f"FAIL {name}: col {c} row {i}: spark={g!r} duckdb={w!r}")
            n_fail += 1
        else:
            # dtype note (schema-level) — warn only
            dt_g = {c: str(got[c].dtype) for c in got.columns}
            dt_w = {c: str(want[c].dtype) for c in want.columns}
            warn = " (dtype diff: " + str({c: (dt_g[c], dt_w[c]) for c in dt_g if dt_g[c] != dt_w[c]}) + ")" \
                if dt_g != dt_w else ""
            print(f"PASS {name}: {len(got)} rows{warn}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
