#!/usr/bin/env python3
"""Bit-strict compare of two Verify dumps — engine partition-invariance.

Usage:
  sbt "runMain graft.Verify <sfDir> /tmp/a"                       # e.g. SPARK_GRAFT_CPUS=24
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/b"
  python3 tools/dump_diff.py /tmp/a /tmp/b

The DuckDB selfcheck can only see nondeterminism that diverges from the
oracle; a query that is nondeterministic the SAME WAY on one run (e.g. a
partitioning-dependent tie, an unstable sample, a sketch whose merge
order shifts with task count) slips through. Dumping the whole surface
at two different local[] parallelism levels and requiring BIT-identical
parquet (schema + row order + every value, arrow table equality) pins
engine self-consistency for all queries, including the rows-only ones
(sketches, samples, ML scoring) that have no oracle at all.

r10 state: 211/211 identical between local[24] and local[8] at sf0.01.
r11 state: 212/212 identical between local[16] (strict-codegen run) and
local[4] at sf0.01 — also pins codegen-vs-interpreted agreement.
"""
import glob
import os
import sys

import pyarrow.parquet as pq


def main(a_dir, b_dir):
    names = sorted(d for d in os.listdir(a_dir)
                   if os.path.isdir(os.path.join(a_dir, d)))
    bad = 0
    for n in names:
        fa = sorted(glob.glob(f"{a_dir}/{n}/*.parquet"))
        fb = sorted(glob.glob(f"{b_dir}/{n}/*.parquet"))
        if not fb:
            print(f"MISSING {n} in {b_dir}")
            bad += 1
            continue
        ta = pq.read_table(fa)
        tb = pq.read_table(fb)
        if ta.schema != tb.schema:
            print(f"SCHEMA {n}: {ta.schema} vs {tb.schema}")
            bad += 1
            continue
        if not ta.equals(tb):
            print(f"DIFF {n}  rows {ta.num_rows} vs {tb.num_rows}")
            bad += 1
    print(f"== {len(names) - bad} identical / {len(names)}; {bad} differ ==")
    return 1 if bad else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
