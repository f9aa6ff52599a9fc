#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each fixture parquet as a
DuckDB view named after the table, runs every oracle SQL, and compares with
the engine's parquet dump at <verifyOutDir>/<name>/ — row count, column
names (sorted), and cell values in row order.
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: engine output missing"); n_fail += 1; continue
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
            if ecols != gcols:
                print(f"FAIL {name}: columns oracle={ecols} engine={gcols}"); n_fail += 1; continue
            if exp.num_rows != got.num_rows:
                print(f"FAIL {name}: rows oracle={exp.num_rows} engine={got.num_rows}"); n_fail += 1; continue
            bad = None
            for c in ecols:
                ev = exp.column(c).to_pylist()
                gv = got.column(c).to_pylist()
                for i, (a, b) in enumerate(zip(ev, gv)):
                    if a != b:
                        bad = (c, i, a, b); break
                if bad: break
            if bad:
                c, i, a, b = bad
                print(f"FAIL {name}: col {c} row {i}: oracle={a!r} engine={b!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({exp.num_rows} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
