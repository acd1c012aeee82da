"""Local stand-in for the driver's correctness gate: run each queries() entry
and its oracle_sql() twin over an sf dir, compare row count + column names +
order-insensitive values. Usage: python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from content_crawler_ray.pipelines.queries import QUERIES

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    import time
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} RAY-ERROR {type(e).__name__}: {str(e)[:200]}")
            continue
        dt = time.time() - t0
        if sql is None:
            print(f"{name:24s} rows-only  rows={len(got)}  cols={list(got.columns)}  {dt:.1f}s")
            continue
        exp = canon(con.sql(sql).df())
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                gg = got.copy()
                for c in gg.columns:  # align dtypes loosely before compare
                    if gg[c].dtype != exp[c].dtype:
                        try:
                            gg[c] = gg[c].astype(exp[c].dtype)
                        except (TypeError, ValueError):
                            pass
                ok_vals = gg.equals(exp)
                if not ok_vals:
                    # tolerate dtype-only mismatch via string compare
                    ok_vals = gg.astype(str).equals(exp.astype(str))
            except Exception:
                ok_vals = False
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        print(f"{name:24s} {status}  rows={len(got)}/{len(exp)} cols_ok={ok_cols}  {dt:.1f}s")
        if status != "OK":
            failures.append(name)
            if not ok_cols:
                print("   got :", list(got.columns), "\n   want:", list(exp.columns))
            elif ok_rows:
                diff = (got.astype(str) != exp.astype(str)).any(axis=1)
                print("   first diffs:\n", got[diff].head(3), "\n   vs\n", exp[diff].head(3))
    ray.shutdown()
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
