"""Driver-mimic oracle checker: runs registered queries AND their DuckDB
oracle SQL side-by-side over a testdata sf dir, compares row count,
column names and an order-insensitive value hash (columns sorted by
name, rows sorted, values stringified) — the same discipline as the
driver's CORRECTNESS gate.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(out) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return out.reset_index(drop=True)
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif np.issubdtype(col.dtype, np.floating):
            df[c] = col.round(6)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from hsearch_ray.pipelines.queries import ORACLE_SQL, QUERIES

    names = sys.argv[2:] or [n for n in QUERIES if n in ORACLE_SQL]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    for name in names:
        try:
            mine = to_pandas(QUERIES[name](sf_dir))
            oracle = con.sql(ORACLE_SQL[name]).df()
            rows = len(mine) == len(oracle)
            schema = sorted(mine.columns) == sorted(oracle.columns)
            h = value_hash(mine) == value_hash(oracle) if rows and schema else False
            ok = rows and schema and h
            bad += not ok
            print(f"{name}: rows={rows}({len(mine)}/{len(oracle)}) "
                  f"schema={schema} hash={h} {'OK' if ok else 'FAIL'}")
            if not schema:
                print(f"  mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}")
            if rows and schema and not h and len(mine) < 60:
                print("  mine:\n", mine.sort_values(list(sorted(mine.columns))).to_string())
                print("  oracle:\n", oracle.sort_values(list(sorted(oracle.columns))).to_string())
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
