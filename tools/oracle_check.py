#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB against the
sfDir parquet tables, canonicalizes both sides (columns sorted by name,
rows sorted by all columns) and compares row counts, schemas, and cell
values.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = list(got_rel.columns)
        got = got_rel.fetchall()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want_rel = con.sql(oracles[name])
            want_cols = list(want_rel.columns)
            want = want_rel.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, g = canon(got, got_cols)
        wc, w = canon(want, want_cols)
        if gc != wc:
            print(f"[FAIL] {name}: columns {gc} != {wc}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"[FAIL] {name}: {len(bad)}/{len(g)} rows differ; first at {i}:")
            print(f"    cols:  {gc}")
            print(f"    spark: {a}")
            print(f"    duck:  {b}")
            n_fail += 1
        else:
            print(f"[pass] {name}: {len(g)} rows")
            n_pass += 1
    # a query that crashed in Verify leaves no dump dir — that is a
    # FAIL, not a silent skip (the driver's gate would flag it too)
    for name in sorted(oracles):
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"[FAIL] {name}: no Verify dump (query crashed?)")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
