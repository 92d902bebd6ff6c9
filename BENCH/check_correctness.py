"""Local replica of the driver's CORRECTNESS gate: run every queries()
entry AND its oracle_sql() twin at sf0.01, compare rows / schema /
sorted-column values, print one status line per query.

Usage: python BENCH/check_correctness.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.01"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e

    qs = e.queries()
    oracle = e.oracle_sql()
    only = set(sys.argv[1:])

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(SF)
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {ex!r}")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"rows  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {ex!r}")
            n_bad += 1
            continue
        g, x = canon(got), canon(exp)
        probs = []
        if list(g.columns) != list(x.columns):
            probs.append(f"schema {list(g.columns)} != {list(x.columns)}")
        elif len(g) != len(x):
            probs.append(f"rows {len(g)} != {len(x)}")
        else:
            for c in g.columns:
                a, b = g[c].to_numpy(), x[c].to_numpy()
                eq = (a == b.astype(float)).all() if a.dtype.kind == "f" else (a == b).all()
                if not eq:
                    probs.append(f"values differ in {c}")
        if probs:
            print(f"FAIL  {name}: {'; '.join(probs)} [{time.time()-t0:.1f}s]")
            n_bad += 1
        else:
            print(f"ok    {name}: {len(g)} rows [{time.time()-t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rows_only} rows-only")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
