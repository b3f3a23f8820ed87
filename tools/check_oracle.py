#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Usage: python tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dump produced by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: row count, column names, and value hash (columns sorted by
name, rows sorted by all columns, floats compared exactly after
normalizing to float64).
"""
import json
import sys

import duckdb
import pandas as pd
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(float)
            except (ValueError, TypeError):
                try:
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
                except (ValueError, TypeError):
                    df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = ds.dataset(f"{out_dir}/{name}").to_table().to_pandas()
            want = con.execute(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: cols {list(g.columns)} != {list(w.columns)}")
                n_bad += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_bad += 1
            elif not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad_cols = [c for c in g.columns if neq[c].any()]
                print(f"FAIL {name}: values differ in {bad_cols}")
                for c in bad_cols[:3]:
                    i = neq[c].idxmax()
                    print(f"   {c}[{i}]: spark={g[c][i]!r} duck={w[c][i]!r}")
                n_bad += 1
            else:
                print(f"ok   {name} ({len(g)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'} "
          f"({len(oracle)} oracle-checked)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
