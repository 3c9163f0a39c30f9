#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same sf tables,
and compare (column names sorted, row-by-row values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value canonicalisation: repr of float
        return repr(round(v, 9))
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ spark={gcols} oracle={wcols}")
            n_bad += 1
            continue
        want, got = want[wcols], got[gcols]
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ spark={len(got)} oracle={len(want)}")
            n_bad += 1
            continue
        diffs = []
        for i in range(len(want)):
            for c in wcols:
                a, b = want[c].iloc[i], got[c].iloc[i]
                if canon(a) != canon(b):
                    diffs.append((i, c, a, b))
        if diffs:
            print(f"FAIL {name}: {len(diffs)} value diffs, first: "
                  f"row={diffs[0][0]} col={diffs[0][1]} "
                  f"oracle={diffs[0][2]!r} spark={diffs[0][3]!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
