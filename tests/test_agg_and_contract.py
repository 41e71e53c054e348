"""grouped_agg/distinct correctness + the __ray_entry__ driver contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_grouped_agg_matches_pandas(ray_session):
    import ray.data

    from hsearch_ray.stages.agg import grouped_agg

    rng = np.random.Generator(np.random.PCG64(1))
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 5000),
            "v": rng.integers(-100, 100, 5000),
            "w": rng.integers(0, 10, 5000),
        }
    )
    ds = ray.data.from_pandas([df.iloc[i : i + 500] for i in range(0, 5000, 500)])
    got = (
        grouped_agg(ds, ["k"], {"v": ["sum", "min", "max"], "w": ["sum"]}, count_alias="n")
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(
            v__sum=("v", "sum"), v__min=("v", "min"), v__max=("v", "max"),
            w__sum=("w", "sum"), n=("k", "size"),
        )
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )


def test_distinct_rows(ray_session):
    import ray.data

    from hsearch_ray.stages.agg import distinct_rows

    df = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "x", "y", "z", "x"]})
    ds = ray.data.from_pandas([df.iloc[:3], df.iloc[3:]])
    got = distinct_rows(ds, ["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    want = df.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_entry_contract(ray_session):
    """entry()/queries()/oracle_sql() shape: oracle keys ⊆ query keys,
    callables are callable, no ray.init anywhere in module import path."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) >= 15
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())


def test_entry_runs(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.entry()
    n = out.count() if hasattr(out, "count") else len(out)
    assert n >= 0


def test_median_recursion_on_skewed_bins(ray_session):
    """exact_median_distributed must recurse on a middle bin that holds
    ~all rows (skewed distribution) instead of fetching it: forced tiny
    max_fetch, answer must equal numpy's median exactly."""
    import pyarrow as pa
    import ray.data

    from hsearch_ray.pipelines.queries import exact_median_distributed

    rng = np.random.Generator(np.random.PCG64(3))
    # 95% of mass inside one 1/4096 slice of the range: bin recursion
    # must trigger; an outlier stretches the histogram range
    dense = rng.uniform(1000.0, 1000.01, size=19000)
    sparse = rng.uniform(0.0, 1_000_000.0, size=1000)
    v = np.concatenate([dense, sparse])
    rng.shuffle(v)
    tbl = pa.table({"value": pa.array(v, pa.float64())})
    ds = ray.data.from_arrow([tbl.slice(0, 7000), tbl.slice(7000, 7000),
                              tbl.slice(14000)])
    got = exact_median_distributed(ds, "value", max_fetch=200)
    assert got == round(float(np.median(v)), 6)

    # exact-duplicate pile: lo == hi short-circuit inside recursion
    w = np.concatenate([np.full(9000, 5.0), rng.uniform(0, 10, 1000)])
    ds2 = ray.data.from_arrow(pa.table({"value": pa.array(w, pa.float64())}))
    got2 = exact_median_distributed(ds2, "value", max_fetch=50)
    assert got2 == round(float(np.median(w)), 6)
