#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate:
run graft.Verify first (sbt "runMain graft.Verify <sfDir> <outDir>"),
then: python3 tools/check.py <sfDir> <outDir>

Compares each Spark parquet result with the DuckDB oracle: column names
(sorted), dtypes, row count, and exact values.
"""
import json, math, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_bad += 1
            continue
        got, want = got[gc], want[wc]
        gd, wd = list(map(str, got.dtypes)), list(map(str, want.dtypes))
        if gd != wd:
            print(f"FAIL {name}: dtypes {list(zip(gc, gd, wd))}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        g_rows = [tuple(norm_cell(v) for v in r) for r in got.itertuples(index=False)]
        w_rows = [tuple(norm_cell(v) for v in r) for r in want.itertuples(index=False)]
        if g_rows != w_rows:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(g_rows, w_rows)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: {diffs[0] if diffs else 'order-only'}")
            if sorted(map(repr, g_rows)) == sorted(map(repr, w_rows)):
                print(f"     (same multiset — ordering only)")
            n_bad += 1
            continue
        print(f"ok   {name} ({len(got)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
