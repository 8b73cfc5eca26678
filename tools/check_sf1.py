#!/usr/bin/env python3
"""sf1 (10x) correctness gate — check_oracle.py plus linear-time fold
oracles (dev tool, not engine code).

The committed DuckDB oracles for the EMA-family queries (w2_ema,
w4_macd, w9_indicators_all, w10_rsi_wilder, w11_atr_wilder) build a
PREFIX LIST per row and re-fold it — O(n^2) per symbol. Exact and fast
at the driver's sf0.01 gate; at sf1 (~200k rows/symbol) that is ~1e11
lambda steps, so this harness swaps JUST the fold evaluation for the
equivalent O(n) running recurrence in float64 — the same left fold, one
step per row, bit-identical by construction (fold(prefix+v) =
step(fold(prefix), v)). Everything else (cbars CTE, lag columns, the
DECIMAL(38,10) SMA/stddev windows) still runs in DuckDB from the
committed oracle text itself, so the independent-oracle property is
preserved for every non-fold column.

Usage: python3 tools/check_sf1.py <sfDir> <verifyOutDir>
Writes a summary line per query; exit 0 iff everything passes.
"""
import glob
import json
import re
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo/tools")
import check_oracle as co

FOLD_QUERIES = ["w2_ema", "w4_macd", "w9_indicators_all",
                "w10_rsi_wilder", "w11_atr_wilder"]


def running_fold(values, alpha):
    """Per-row left fold over the non-null prefix: seed = first non-null,
    step = alpha*v + (1-alpha)*acc. Emits NaN before the first non-null —
    exactly the committed emaSql/rmaSql over `list(x) FILTER (x IS NOT
    NULL)`, one step per row instead of a re-fold."""
    out = np.empty(len(values))
    acc = None
    one_minus = 1.0 - alpha
    for i, v in enumerate(values):
        if v is not None and not (isinstance(v, float) and np.isnan(v)):
            acc = v if acc is None else alpha * v + one_minus * acc
        out[i] = np.nan if acc is None else acc
    return out


def cbars_frame(con, oracle_sql):
    """Materialize the cbars CTE from the committed w2 oracle text itself
    (everything before its first ', d1 AS'), ordered by (symbol, ts,
    event_id) — the window order W of every fold."""
    prefix = oracle_sql["w2_ema"]
    cte = prefix[:prefix.index(", d1 AS")]
    df = con.execute(
        cte + "\nSELECT event_id, symbol, ts, high, low, close FROM cbars"
        "\nORDER BY symbol, ts, event_id").df()
    return df


def per_symbol(df, fn):
    """Apply fn(sub_df) per symbol (df already in window order), concat."""
    parts = [fn(g) for _, g in df.groupby("symbol", sort=True)]
    return pd.concat(parts, ignore_index=True)


def ema_cols(g):
    c = g["close"].to_numpy()
    return pd.DataFrame({
        "event_id": g["event_id"].to_numpy(),
        "symbol": g["symbol"].to_numpy(),
        "ema_12": running_fold(c, 2.0 / 13.0),
        "ema_26": running_fold(c, 2.0 / 27.0)})


def macd_cols(g):
    c = g["close"].to_numpy()
    macd = running_fold(c, 2.0 / 13.0) - running_fold(c, 2.0 / 27.0)
    sig = running_fold(macd, 2.0 / 10.0)
    return pd.DataFrame({
        "event_id": g["event_id"].to_numpy(),
        "symbol": g["symbol"].to_numpy(),
        "macd": macd, "macd_signal": sig, "macd_hist": macd - sig})


def rsi_wilder_cols(g):
    c = g["close"].to_numpy()
    delta = np.concatenate(([np.nan], c[1:] - c[:-1]))
    gain = np.where(np.isnan(delta), np.nan, np.where(delta > 0, delta, 0.0))
    loss = np.where(np.isnan(delta), np.nan, np.where(delta < 0, -delta, 0.0))
    ag = running_fold(gain, 1.0 / 14.0)
    al = running_fold(loss, 1.0 / 14.0)
    rsi = np.where(
        np.isnan(ag) | np.isnan(al), np.nan,
        np.where((al == 0) & (ag > 0), 100.0,
                 np.where((al == 0) & (ag == 0), np.nan,
                          100.0 - 100.0 / (1.0 + ag / al))))
    return pd.DataFrame({
        "event_id": g["event_id"].to_numpy(),
        "symbol": g["symbol"].to_numpy(), "rsi_w": rsi})


def atr_wilder_cols(g):
    c = g["close"].to_numpy()
    h = g["high"].to_numpy()
    lo = g["low"].to_numpy()
    pc = np.concatenate(([np.nan], c[:-1]))
    tr = np.where(np.isnan(pc), h - lo,
                  np.maximum(h - lo, np.maximum(np.abs(h - pc), np.abs(lo - pc))))
    return pd.DataFrame({
        "event_id": g["event_id"].to_numpy(),
        "symbol": g["symbol"].to_numpy(),
        "atr_w": running_fold(tr, 1.0 / 14.0)})


def patched_w9(con, oracle_sql, cb):
    """w9: run the committed oracle with the quadratic pieces stubbed to
    NULL (regex on the SQL text), then overwrite the five fold-derived
    columns from the O(n) recurrences."""
    sql = oracle_sql["w9_indicators_all"]
    sql = re.sub(
        r"list\((\w+)\) FILTER \(\1 IS NOT NULL\) OVER \([^)]*\) AS (__l\w+)",
        r"CAST(NULL AS DOUBLE) AS \2", sql)
    sql = re.sub(
        r"CASE WHEN len\((__l\w+)\) = 0 THEN NULL ELSE list_reduce\(\1,.*?\) END",
        "CAST(NULL AS DOUBLE)", sql, flags=re.S)
    base = con.execute(sql).df()
    folds = per_symbol(cb, macd_cols).merge(
        per_symbol(cb, ema_cols)[["event_id", "ema_12", "ema_26"]],
        on="event_id")
    out = base.drop(columns=["ema_12", "ema_26", "macd", "macd_signal",
                             "macd_hist"]).merge(
        folds[["event_id", "ema_12", "ema_26", "macd", "macd_signal",
               "macd_hist"]], on="event_id")
    return out


BIG_ROWS = 20_000_000


def parquet_rows(files):
    import pyarrow.parquet as pq
    return sum(pq.ParquetFile(p).metadata.num_rows for p in files)


def big_compare(con, files, oracle_sql):
    """Multiset equality for outputs too large to sort in pandas
    (d4 at sf10 is ~280M pairs): count(*) plus an order-independent
    sum-of-row-hashes, computed streaming inside DuckDB on BOTH sides.

    Canonicalization: every column CAST to VARCHAR (DuckDB prints
    doubles shortest-roundtrip, so bit-identical doubles — the standard
    the small-scale gate already proves — print identically; the oracle
    side is first cast to the Spark dump's column type so e.g. a
    narrower oracle DECIMAL widens before printing). Row hash =
    hash([...]) over the name-sorted column list; sum as HUGEINT.
    A hash match is a multiset match up to 64-bit collision odds; a
    mismatch falls back to the exact pandas compare (slow, but only on
    an actual failure)."""
    flist = "[" + ", ".join(f"'{p}'" for p in files) + "]"
    desc = con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({flist})").fetchall()
    schema = [(r[0], r[1]) for r in desc]
    cols = sorted(n for n, _ in schema)
    types = dict(schema)
    vec = "[" + ", ".join(f'CAST("{c}" AS VARCHAR)' for c in cols) + "]"
    ovec = "[" + ", ".join(
        f'CAST(CAST("{c}" AS {types[c]}) AS VARCHAR)' for c in cols) + "]"
    a = con.execute(
        f"SELECT count(*), sum(CAST(hash({vec}) AS HUGEINT)) "
        f"FROM read_parquet({flist})").fetchone()
    b = con.execute(
        f"SELECT count(*), sum(CAST(hash({ovec}) AS HUGEINT)) "
        f"FROM ({oracle_sql})").fetchone()
    if a[0] != b[0]:
        return f"ROWCOUNT MISMATCH spark={a[0]} oracle={b[0]}"
    if a[1] != b[1]:
        return f"ROWHASH MISMATCH spark={a[1]} oracle={b[1]}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads = {int(os.environ['DUCKDB_THREADS'])}")
    if os.environ.get("DUCKDB_MEMORY"):
        con.execute(f"SET memory_limit = '{os.environ['DUCKDB_MEMORY']}'")
        con.execute(f"SET temp_directory = '/root/repo/target/duckdb_tmp'")
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    for t in co.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    cb = cbars_frame(con, oracles)
    fold_oracles = {
        "w2_ema": lambda: per_symbol(cb, ema_cols),
        "w4_macd": lambda: per_symbol(cb, macd_cols),
        "w10_rsi_wilder": lambda: per_symbol(cb, rsi_wilder_cols),
        "w11_atr_wilder": lambda: per_symbol(cb, atr_wilder_cols),
        "w9_indicators_all": lambda: patched_w9(con, oracles, cb),
    }

    names = sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*")
        if not p.endswith(".json"))
    if only is not None:
        names = [n for n in names if n in only]
    n_pass = n_fail = 0
    # Completeness: every REGISTERED query (queries.json, written by the
    # unsharded run or shard 0) must either have an output dir or appear
    # in an error manifest — a shard that never launched, crashed before
    # its manifest, or was filtered out can otherwise read as green.
    import os.path
    if only is None and os.path.exists(f"{out_dir}/queries.json"):
        with open(f"{out_dir}/queries.json") as f:
            registered = set(json.load(f))
        errored = set()
        for mf in glob.glob(f"{out_dir}/verify_errors*.json"):
            with open(mf) as f:
                errored |= set(json.load(f))
        uncovered = registered - set(names) - errored
        for name in sorted(uncovered):
            print(f"MISSING   {name}: registered but no output dir and no "
                  f"error manifest entry (shard never ran it?)")
            n_fail += 1
    import time
    for name in names:
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no parquet output")
            n_fail += 1
            continue
        n_rows = parquet_rows(files)
        if n_rows > BIG_ROWS and name in oracles and name not in fold_oracles:
            err = big_compare(con, files, oracles[name])
            if err is None:
                print(f"PASS-HASH {name}: rows={n_rows} "
                      f"[duckdb-hash {time.time()-t0:.0f}s]", flush=True)
                n_pass += 1
            else:
                print(f"FAIL      {name}: {err} (big-output hash path)",
                      flush=True)
                n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in files],
                             ignore_index=True)
        if name not in oracles:
            print(f"NO-ORACLE {name}: rows={len(spark_df)}")
            continue
        try:
            if name in fold_oracles:
                duck_df = fold_oracles[name]()
            else:
                duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL      {name}: oracle error: {e}", flush=True)
            n_fail += 1
            continue
        err = co.compare(spark_df, duck_df, exact=True)
        if err is None:
            tag = "PASS-EXACT"
        else:
            tol_err = co.compare(spark_df, duck_df, exact=False)
            tag = "PASS-TOL " if tol_err is None else None
            if tag is None:
                print(f"FAIL      {name}: {err}", flush=True)
                n_fail += 1
                continue
        src = "pyfold" if name in fold_oracles else "duckdb"
        print(f"{tag} {name}: rows={len(spark_df)} [{src} {time.time()-t0:.0f}s]"
              + ("" if tag == "PASS-EXACT" else f" (not bit-exact: {err})"),
              flush=True)
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
