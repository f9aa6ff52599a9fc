#!/usr/bin/env python3
"""Rewrite BASELINE.md's per-query table from a Bench JSON line.

Usage: python3 tools/record_baseline.py <bench.json> <date>

Keeps everything above the per-query table header intact; regenerates the
TOTAL row and one row per query from the JSON's "queries" map.
"""
import json, sys, re

def main(bench_path, date):
    with open(bench_path) as f:
        bench = json.loads(f.read().strip())
    qs = bench["queries"]
    total = bench["value"]
    with open("BASELINE.md") as f:
        lines = f.readlines()
    # find the table header of the recorded-times table
    hdr = next(i for i, l in enumerate(lines)
               if l.startswith("| bench query"))
    out = lines[:hdr + 2]  # header + separator
    out.append(f"| **TOTAL ({len(qs)} queries, noop-sink materialization, "
               f"median of 3, local[32])** | 0.1 | {total:.1f} | {date} |\n")
    for name in sorted(qs):
        out.append(f"| {name} | 0.1 | {qs[name]:.2f} | {date} |\n")
    with open("BASELINE.md", "w") as f:
        f.writelines(out)
    print(f"recorded {len(qs)} queries, total {total:.1f}s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
