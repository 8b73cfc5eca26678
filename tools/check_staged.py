#!/usr/bin/env python3
"""Staged DuckDB oracle replay (dev tool, not engine code) — for oracle
queries whose monolithic WITH-chain exceeds DuckDB's planner/memory budget
at the 100x gate scale (v6/v7/v8: ~300 chained CTEs replaying PQ training +
encoding over 200k x 64-dim vectors; the one-shot form OOM'd at 65 GiB /
filled the temp volume — target/check_sf10_rerun.log).

Semantics-preserving transformation only: each top-level CTE of the
COMMITTED oracle text (the same oracle_sql.json the driver runs — no
alternative SQL is authored here) is materialized as a TABLE in an on-disk
DuckDB database, in declaration order. A CTE body only references earlier
CTEs and the base-table views, so sequential CREATE TABLE <name> AS <body>
computes the identical relation; tables whose name no longer occurs in any
remaining body are dropped to bound the working set. The final SELECT then
runs against the materialized tables, and the result is compared with the
same exact/tolerant compare as check_oracle.py.

Usage: python3 tools/check_staged.py <sfDir> <verifyOutDir> <query>[,query...]
Env:   DUCKDB_THREADS, DUCKDB_MEMORY (e.g. "48GB"), DUCKDB_TMP (temp dir)
"""
import glob
import json
import os
import re
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo/tools")
import check_oracle as co


def split_ctes(sql):
    """Split 'WITH a AS (...), b AS (...) <final>' into ([(name, body)...],
    final_sql). Tracks paren depth and single-quoted strings; the oracle
    texts are machine-generated so the shape is regular."""
    s = sql.strip()
    assert s[:4].upper() == "WITH", "not a WITH query"
    i = 4
    ctes = []
    n = len(s)
    while True:
        while i < n and s[i] in " \t\r\n,":
            i += 1
        m = re.match(r"([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(", s[i:])
        if not m:
            return ctes, s[i:]
        name = m.group(1)
        j = i + m.end()  # index just past the opening '('
        depth = 1
        in_str = False
        while j < n and depth > 0:
            c = s[j]
            if in_str:
                if c == "'":
                    # '' escapes a quote inside a string literal
                    if j + 1 < n and s[j + 1] == "'":
                        j += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        assert depth == 0, f"unbalanced parens in CTE {name}"
        ctes.append((name, s[i + m.end():j - 1]))
        i = j


def run_staged(con, sql, log=lambda m: None):
    ctes, final = split_ctes(sql)
    names = [n for n, _ in ctes]
    for idx, (name, body) in enumerate(ctes):
        t0 = time.time()
        con.execute(f'CREATE OR REPLACE TABLE "{name}" AS {body}')
        nrows = con.execute(f'SELECT count(*) FROM "{name}"').fetchone()[0]
        log(f"  [stage {idx + 1}/{len(ctes)}] {name}: {nrows} rows "
            f"({time.time() - t0:.1f}s)")
        # drop tables no longer referenced by any remaining body or the final
        rest = " ".join(b for _, b in ctes[idx + 1:]) + " " + final
        for done in names[: idx + 1]:
            if con.execute(
                "SELECT count(*) FROM information_schema.tables "
                "WHERE table_name = ?", [done]).fetchone()[0] and not re.search(
                    rf"\b{re.escape(done)}\b", rest):
                con.execute(f'DROP TABLE "{done}"')
    t0 = time.time()
    out = con.execute(final).df()
    log(f"  [final] {len(out)} rows ({time.time() - t0:.1f}s)")
    for name in names:
        try:
            con.execute(f'DROP TABLE IF EXISTS "{name}"')
        except duckdb.Error:
            pass
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3].split(",")
    tmp = os.environ.get("DUCKDB_TMP", "/root/repo/target/duckdb_tmp")
    os.makedirs(tmp, exist_ok=True)
    dbfile = os.path.join(tmp, f"staged_{os.getpid()}.duckdb")
    con = duckdb.connect(dbfile)
    con.execute(f"SET temp_directory = '{tmp}'")
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads = {int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_MEMORY"):
        con.execute(f"SET memory_limit = '{os.environ['DUCKDB_MEMORY']}'")
    con.execute("SET preserve_insertion_order = false")
    for t in co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name in queries:
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no parquet output", flush=True)
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in files],
                             ignore_index=True)
        print(f"{name}: staged replay of {len(oracles[name])}-char oracle, "
              f"spark rows={len(spark_df)}", flush=True)
        try:
            duck_df = run_staged(con, oracles[name],
                                 log=lambda m: print(m, flush=True))
        except Exception as e:
            print(f"FAIL      {name}: oracle error: {e}", flush=True)
            n_fail += 1
            continue
        err = co.compare(spark_df, duck_df, exact=True)
        if err is None:
            tag = "PASS-EXACT"
        else:
            tol = co.compare(spark_df, duck_df, exact=False)
            tag = "PASS-TOL " if tol is None else None
        if tag is None:
            print(f"FAIL      {name}: {err}", flush=True)
            n_fail += 1
        else:
            print(f"{tag} {name}: rows={len(spark_df)} "
                  f"[staged-duckdb {time.time() - t0:.0f}s]"
                  + ("" if tag == "PASS-EXACT" else f" (not bit-exact: {err})"),
                  flush=True)
    con.close()
    try:
        os.remove(dbfile)
    except OSError:
        pass
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
