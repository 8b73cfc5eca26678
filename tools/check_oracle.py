#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part of
the engine): run graft.Verify first, then this script compares each query's
parquet output against its DuckDB oracle SQL.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--exact]

Canonicalization: sort columns by name, sort rows by all columns, compare
values. We check BOTH exact equality and a 1e-9 relative tolerance so we know
which queries are bit-exact (the safe assumption about the driver) vs only
approximately equal.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    if len(df) > 0:
        # arrays/ndarrays are unhashable — sort by a stringified key instead
        key_cols = []
        for c in df.columns:
            if df[c].map(lambda v: isinstance(v, (list, tuple)) or hasattr(v, "tolist")).any():
                key_cols.append(df[c].map(lambda v: repr(list(v)) if v is not None and not (isinstance(v, float)) else repr(v)))
            else:
                key_cols.append(df[c])
        tmp = pd.DataFrame({f"k{i}": k for i, k in enumerate(key_cols)})
        df = df.iloc[tmp.sort_values(by=list(tmp.columns), kind="mergesort").index].reset_index(drop=True)
    return df


def values_equal(a, b, exact):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if exact:
            return fa == fb or (math.isnan(fa) and math.isnan(fb))
        if fa == fb:
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    def is_arr(v):
        return (isinstance(v, (list, tuple))
                or (hasattr(v, "tolist") and hasattr(v, "__len__")))
    if is_arr(a) or is_arr(b):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(values_equal(x, y, exact) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


def compare(spark_df, duck_df, exact):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
    import numpy as np
    for c in a.columns:
        # vectorized fast path (sf1 outputs run to millions of rows — the
        # python loop below is the fallback, not the common case)
        try:
            av_np = a[c].to_numpy()
            bv_np = b[c].to_numpy()
            if av_np.dtype.kind in "ifu" and bv_np.dtype.kind in "ifu":
                ok = (av_np == bv_np) | (pd.isna(av_np) & pd.isna(bv_np))
                if not exact and not ok.all():
                    fa, fb = av_np.astype(float), bv_np.astype(float)
                    tol = 1e-9 * np.maximum(1.0, np.maximum(np.abs(fa), np.abs(fb)))
                    ok = ok | (np.abs(fa - fb) <= tol)
                if ok.all():
                    continue
            elif av_np.dtype == bv_np.dtype and av_np.dtype.kind in "UMS":
                if (av_np == bv_np).all():
                    continue
            elif av_np.dtype.kind == "O" and bv_np.dtype.kind == "O":
                # plain strings vectorize; list/array cells raise and fall
                # through to the exact row loop
                eq = (a[c].fillna("\x00N") == b[c].fillna("\x00N"))
                if bool(eq.all()):
                    continue
        except (TypeError, ValueError):
            pass
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y, exact):
                return f"VALUE MISMATCH col={c} row={i}: spark={x!r} oracle={y!r}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    exact = "--exact" in sys.argv
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    import glob
    names = sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")
    )
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracles:
            status = "NO-ORACLE"
            print(f"{status:9s} {name}: rows={len(spark_df)}")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL      {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        err = compare(spark_df, duck_df, exact)
        # also report exactness when running in tolerant mode
        exact_err = compare(spark_df, duck_df, True) if not exact and err is None else err
        if err is None:
            tag = "PASS-EXACT" if exact_err is None else "PASS-TOL "
            print(f"{tag:9s} {name}: rows={len(spark_df)}"
                  + ("" if exact_err is None else f"  (not bit-exact: {exact_err})"))
            n_pass += 1
        else:
            print(f"FAIL      {name}: {err}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
