"""Partial (combiner-style) grouped aggregation.

Ray Data's ``GroupedData.aggregate`` sort-based AggregateMap runs
per-row Python and measures ~100-400us/row — unusable in hot paths.
This module implements the classic combiner plan instead (the guide's
"pre-aggregate partials" rule):

  1. map_batches: vectorized pandas groupby per batch -> one partial row
     per (key, batch)  [embarrassingly parallel, no shuffle]
  2. combine the partials, which are reduced by orders of magnitude:
       mode='driver'  : to_pandas + one pandas groupby — right when the
                        final result is small enough to live on the
                        driver (which is also what returning a
                        DataFrame implies)
       mode='shuffle' : distributed sort of the partials by key + a
                        vectorized per-block combine; only block-edge
                        keys (<= 2 per block) take a driver pass — the
                        design-scale path for high-cardinality keys
     mode='auto' currently selects 'driver': partial cardinality is
     unknown before execution, and every present caller's result is
     driver-sized.  Callers with known high-cardinality keys pass
     'shuffle' (or use ``grouped_agg_ds`` to keep the result
     distributed end-to-end).

Supported per-column ops: sum, min, max, count (count is keyed "__count").
All ops are decomposable: combine(sum)=sum, combine(min)=min,
combine(max)=max, combine(count)=sum.
"""

from __future__ import annotations

import pandas as pd

_COMBINE_OP = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _partial_fn(keys: list[str], spec: dict[str, list[str]], count_alias: str | None):
    agg_map = {f"{col}__{op}": (col, op) for col, ops in spec.items() for op in ops}
    if count_alias is not None:
        agg_map[count_alias] = (keys[0], "size")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False).agg(**agg_map)

    return partial


def _final_ops(keys, spec, count_alias):
    ops = {}
    for col, col_ops in spec.items():
        for op in col_ops:
            name = f"{col}__{op}"
            ops[name] = (name, _COMBINE_OP[op])
    if count_alias is not None:
        ops[count_alias] = (count_alias, "sum")
    return ops


def _combine_pdf(pdf: pd.DataFrame, keys, spec, count_alias) -> pd.DataFrame:
    return pdf.groupby(keys, as_index=False, sort=False).agg(
        **_final_ops(keys, spec, count_alias)
    )


def _empty_result(keys, spec, count_alias) -> pd.DataFrame:
    cols = list(keys) + [f"{c}__{o}" for c, ops in spec.items() for o in ops]
    if count_alias:
        cols.append(count_alias)
    return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})


def grouped_agg_ds(
    ds,
    keys: list[str],
    spec: dict[str, list[str]],
    count_alias: str | None = None,
    batch_size: int | None = 65536,
):
    """Fully distributed grouped aggregation: vectorized partials, then a
    sort-by-key shuffle with a per-block combine.  Keys whose partial
    rows touch a block edge (<= 2 key values per block) spill to one
    tiny driver combine.  Returns a Dataset with columns
    keys + '<col>__<op>' (+ count_alias) — the result never has to fit
    on the driver."""
    import numpy as np
    import ray
    import ray.data

    final_ops = _final_ops(keys, spec, count_alias)

    def combine_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            out["__edge"] = pd.Series(dtype=bool)
            return out
        first = df.iloc[0][keys]
        last = df.iloc[-1][keys]
        edge = np.ones(len(df), dtype=bool)
        for k in keys:
            col = df[k].to_numpy()
            edge &= (col == first[k]) | (col == last[k])
        interior = _combine_pdf(df[~edge], keys, spec, count_alias)
        interior["__edge"] = False
        spill = df[edge].copy()
        spill["__edge"] = True
        return pd.concat([interior, spill], ignore_index=True)

    partials = ds.map_batches(
        _partial_fn(keys, spec, count_alias), batch_format="pandas",
        batch_size=batch_size,
    )
    combined = (
        partials.sort(keys)
        .map_batches(combine_block, batch_size=None, batch_format="pandas")
        .materialize()
    )
    interior = combined.filter(expr="__edge == False").map_batches(
        lambda df: df.drop(columns=["__edge"]), batch_format="pandas"
    )
    spill = combined.filter(expr="__edge == True").to_pandas()
    if len(spill):
        spill = _combine_pdf(spill.drop(columns=["__edge"]), keys, spec, count_alias)
        return interior.union(ray.data.from_pandas(spill))
    return interior


def grouped_agg(
    ds,
    keys: list[str],
    spec: dict[str, list[str]],
    count_alias: str | None = None,
    mode: str = "auto",
    batch_size: int | None = 65536,
) -> pd.DataFrame:
    """Grouped aggregation via partials; returns a pandas DataFrame with
    columns keys + '<col>__<op>' (+ count_alias).

    The heavy pass (one partial row per key per batch) is fully
    distributed in every mode; ``mode`` picks where the final combine
    runs (see module docstring — 'auto' selects 'driver')."""
    if mode == "shuffle":
        pdf = grouped_agg_ds(ds, keys, spec, count_alias, batch_size).to_pandas()
        return pdf if len(pdf) else _empty_result(keys, spec, count_alias)
    partials_ds = ds.map_batches(
        _partial_fn(keys, spec, count_alias),
        batch_format="pandas",
        batch_size=batch_size,
    )
    pdf = partials_ds.to_pandas()
    if pdf.empty:
        return _empty_result(keys, spec, count_alias)
    return _combine_pdf(pdf, keys, spec, count_alias)


def distinct_rows(ds, cols: list[str]) -> pd.DataFrame:
    """Distinct over cols via per-batch drop_duplicates + final combine."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    pdf = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    return pdf.drop_duplicates().reset_index(drop=True)


def default_num_partitions() -> int:
    """Shuffle-partition count for Dataset.join / repartition barriers:
    one per CPU, floor 8 (so tiny local sessions still spread skew)."""
    import ray

    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def default_num_shards(n_rows: int, rows_per_shard: int,
                       cpu_floor: int | None = None, floor: int = 4) -> int:
    """Shard count for the id-range-sharded stores — the ONE place the
    payload-size discipline lives (the 61M-file OOM fix): the
    ``rows_per_shard`` ceiling bounds a shard's packed arrays at any
    corpus size, while ``cpu_floor`` (default: cluster CPU count) only
    spreads SMALL stores for build parallelism.  Callers: the shingle
    store (verify.build_store, 262k candidates/shard), the kv store
    (lsh.build_kv_store, 4M 16-byte rows/shard), the vector store
    (ann.build_vec_store, 2M vectors/shard) and the token-set store
    (setjoin.build_set_store, 262k docs/shard)."""
    import ray

    if cpu_floor is None:
        cpu_floor = int(ray.cluster_resources().get("CPU", 8))
    return max(floor, cpu_floor, -(-int(n_rows) // int(rows_per_shard)))
