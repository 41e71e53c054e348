"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side over an sf dir, compare
row-count + schema(names) + order-insensitive value hash.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canonical(df: pd.DataFrame) -> tuple[int, list[str], int]:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = int(pd.util.hash_pandas_object(df, index=False).sum())
    return len(df), sorted(df.columns), h & 0xFFFFFFFFFFFFFFFF


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canonical(_to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: ray error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {got[0]} rows (no oracle)")
            continue
        try:
            want = canonical(con.sql(sql).df())
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error {ex}")
            failures += 1
            continue
        status = "OK  " if got == want else "FAIL"
        if got != want:
            failures += 1
        print(f"{status}  {name}: ray(rows={got[0]}, cols={got[1]}, h={got[2]:x}) "
              f"duck(rows={want[0]}, cols={want[1]}, h={want[2]:x})")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
