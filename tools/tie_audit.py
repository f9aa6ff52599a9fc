#!/usr/bin/env python3
"""Fleet-wide ORDER-BY totality audit — latent cross-engine order flakes.

The driver's hash is row-ORDER sensitive, so any query whose final ORDER BY
is not a total order over its output is a latent flake: two rows tied on
the sort key but differing elsewhere can legally swap between engines (or
between two Spark runs with different partitioning) and flip the hash even
though every value matches. The q_repeated_grams display-string tie was
exactly this class; this sweep finds the rest mechanically.

Usage: python3 tools/tie_audit.py <sfDir> <verifyOutDir>

For each oracle in <verifyOutDir>/oracle_sql.json: materialize the result,
resolve the LAST top-level ORDER BY (positional refs mapped to output
columns, table qualifiers and ASC/DESC stripped), and compare
count(*) with count(DISTINCT sort-key).  Ties are then classified:
  dup-rows-only — tied rows are byte-identical in EVERY column; any
                  permutation hashes the same, safe by construction.
  NONDET        — at least one tie group contains rows that differ in a
                  non-key column: a real latent flake, fix the ORDER BY.
Queries with no top-level ORDER BY and more than one row are flagged too.

r10 state: 197 total-ordered, 3 dup-rows-only (q_alloc, q_filter,
q_unpivot), 0 NONDET; q_repeated_grams needs the manual note below.

Caveat: the key re-binds against the MATERIALIZED output, so an ORDER BY
over a pre-projection expression (q_repeated_grams' list column `g`, the
group identity that never reaches the output) reports as a binder skip —
audit those by hand (q_repeated_grams is total: g is unique per group).
"""
import json, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def mask_literals(s):
    """Same-length copy with single-quoted literal spans blanked to spaces,
    so the paren-depth scans below can't be fooled by a parenthesis, comma,
    or the text 'ORDER BY' inside a quoted SQL string ('' escapes stay
    inside the literal). Indices into the mask are valid in the original."""
    out, in_lit, i, n = [], False, 0, len(s)
    while i < n:
        c = s[i]
        if in_lit:
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":  # '' = escaped quote
                    out.append('  ')
                    i += 2
                    continue
                in_lit = False
                out.append("'")
            else:
                out.append(' ')
        else:
            if c == "'":
                in_lit = True
            out.append(c)
        i += 1
    return ''.join(out)


def last_top_orderby(s):
    depth, pos, u = 0, -1, mask_literals(s).upper()
    for i, c in enumerate(u):
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif depth == 0 and u.startswith('ORDER BY', i):
            pos = i
    return pos


def split_top(s):
    # scan the literal-masked copy for structure, slice the original text
    masked = mask_literals(s)
    out, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == '(':
            depth += 1
        elif ch == ')':
            depth -= 1
        elif ch == ',' and depth == 0:
            out.append(s[start:i])
            start = i + 1
    if s[start:].strip():
        out.append(s[start:])
    return [c.strip() for c in out]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    risky, clean, skipped = [], 0, []
    for name, sql in sorted(oracle.items()):
        idx = last_top_orderby(sql)
        if idx < 0:
            n = con.execute(f"SELECT count(*) FROM ({sql}) s").fetchone()[0]
            if n > 1:
                risky.append((name, 'NO-ORDER-BY', n, '?'))
            else:
                clean += 1
            continue
        tail = sql[idx + 8:]
        m = re.search(r'\bLIMIT\s+\d+\s*$', tail, re.I)
        if m:
            tail = tail[:m.start()]
        con.execute("DROP TABLE IF EXISTS tt")
        try:
            con.execute(f"CREATE TEMP TABLE tt AS ({sql})")
        except Exception as e:
            skipped.append((name, str(e)[:90]))
            continue
        allcols = [r[0] for r in con.execute("DESCRIBE tt").fetchall()]
        cols = []
        for c in split_top(tail):
            c = re.sub(r'\s+(ASC|DESC)(\s+NULLS\s+(FIRST|LAST))?\s*$', '',
                       c, flags=re.I)
            c = re.sub(r'^\w+\.', '', c)
            if re.fullmatch(r'\d+', c):
                c = f'"{allcols[int(c) - 1]}"'
            cols.append(c)
        key = ', '.join(cols)
        try:
            tot, dk = con.execute(
                f"SELECT count(*), count(DISTINCT ({key})) FROM tt"
            ).fetchone()
        except Exception as e:
            skipped.append((name, 'KEY:' + str(e)[:90]))
            continue
        if tot == dk:
            clean += 1
            continue
        tup = ', '.join(f'"{c}"' for c in allcols)
        ndg = con.execute(
            f"SELECT count(*) FROM (SELECT {key} FROM tt GROUP BY {key} "
            f"HAVING count(DISTINCT ({tup})) > 1) z").fetchone()[0]
        risky.append((name, 'NONDET' if ndg else 'dup-rows-only',
                      tot - dk, ndg))
    print('clean (total-ordered):', clean)
    for s in skipped:
        print('SKIP', *s)
    nondet = 0
    for r in risky:
        print(r[1], r[0], f'tie_excess={r[2]}', f'differing_groups={r[3]}')
        if r[1] != 'dup-rows-only':
            nondet += 1
    print(f'== {nondet} nondeterministic / {len(oracle)} ==')
    return 1 if nondet else 0


if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
