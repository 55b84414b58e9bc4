#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify's
parquet dumps against the DuckDB oracle SQL on the same fixture tables.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    # driver contract: sort columns by name, then compare values
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            w, g = normalize(want), normalize(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns want={list(w.columns)} got={list(g.columns)}")
                n_fail += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
                n_fail += 1
                continue
            diff_cols = []
            for c in w.columns:
                if not w[c].equals(g[c]):
                    # tolerate dtype-only difference if values compare equal
                    try:
                        if (w[c] == g[c]).all():
                            continue
                    except Exception:
                        pass
                    diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:3]:
                    neq = w[c] != g[c]
                    idx = neq[neq].index[:5]
                    for i in idx:
                        print(f"   row {i} col {c}: want={w[c][i]!r} got={g[c][i]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(w)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    # rows-only queries (no oracle entry): report row counts
    import os
    for name in sorted(os.listdir(out_dir)):
        if name in ("oracle_sql.json", "builds.json") or name in oracle:
            continue
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n}")
        except Exception as e:
            print(f"ROWS {name}: ERROR {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
