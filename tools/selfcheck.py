#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each fixture parquet as a
DuckDB view named after the table, runs every oracle SQL, and compares with
the engine's parquet dump at <verifyOutDir>/<name>/ — row count, column
names (sorted), arrow column TYPES, and cell values in row order with
floats compared by IEEE BIT PATTERN (the driver's hash is type- and
bit-sensitive: a DECIMAL128 oracle column vs an engine BIGINT, or a -0.0
vs +0.0, each fail the driver even when Python-level values are equal —
both classes survived two rounds because this script used to erase them).
"""
import json, struct, sys, glob
import duckdb
import pyarrow as pa


def _bits(v):
    """IEEE-754 bit pattern of a float (distinguishes -0.0 from +0.0)."""
    return struct.pack('<d', v)


def _cmp_cell(a, b, is_float):
    if a is None or b is None:
        return a is b
    if is_float:
        return _bits(float(a)) == _bits(float(b))
    return a == b

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
            # arrow TYPE compare — the driver's hash is type-sensitive, so a
            # DECIMAL128 window-sum in the oracle vs the engine's BIGINT is a
            # fail even with identical values (the r9 q_km bug class)
            tbad = None
            for c in ecols:
                et = exp.schema.field(c).type
                gt = got.schema.field(c).type
                if et != gt:
                    tbad = (c, et, gt); break
            if tbad:
                c, et, gt = tbad
                print(f"FAIL {name}: col {c} TYPE oracle={et} engine={gt}")
                n_fail += 1
                continue
            bad = None
            neg_zero = []
            for c in ecols:
                is_float = pa.types.is_floating(exp.schema.field(c).type)
                ev = exp.column(c).to_pylist()
                gv = got.column(c).to_pylist()
                for i, (a, b) in enumerate(zip(ev, gv)):
                    if not _cmp_cell(a, b, is_float):
                        bad = (c, i, a, b); break
                if bad: break
                if is_float and any(
                        v is not None and _bits(float(v)) == _bits(-0.0)
                        for v in ev):
                    neg_zero.append(c)
            if bad:
                c, i, a, b = bad
                print(f"FAIL {name}: col {c} row {i}: oracle={a!r} engine={b!r}"
                      + (" (bit-pattern mismatch)"
                         if a == b else ""))
                n_fail += 1
            else:
                # house rule: no oracle double column may emit -0.0 (the r9
                # q_dsir bug class — normalize with `round(...) + 0.0`)
                if neg_zero:
                    print(f"WARN {name}: oracle emits -0.0 in {neg_zero} "
                          "(add `+ 0.0` to the oracle expression)")
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
