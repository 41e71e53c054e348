"""LSH banding + candidate pair generation.

The reference keeps L hash tables in process memory and probes them
(/root/reference/hclust/src/hclust/hclust.cpp:166-173 `HashTable`,
pcluster/src/pcluster/util.hpp:64 `HASH_BUCKETS`).  Here there is **no
materialized hash table**: each signature explodes into ``num_bands``
rows keyed ``(band, band_hash)`` and a ``groupby`` shuffle *is* the
bucket structure (SURVEY.md §1.3) — the bucket-equi-self-join J1.

Cost/skew design (the reference's acknowledged-but-unhandled weak point:
bucket-size histogram behind #ifdef BUCKETSIZE,
pcluster/src/pcluster/pcluster.cpp:37-66, while its sequential bucket
loop goes quadratic on hot buckets):

  * Bucket stats come from a vectorized partial aggregation
    (stages.agg) — one (count, min) row per bucket per batch, no
    per-row-Python aggregate, no full-row shuffle.
  * Singleton buckets (the vast majority) are filtered OUT with a
    broadcast key-set semi-join before the pair-emission groupby, so
    the sort shuffle only moves rows that can actually produce a pair.
  * Buckets with 2..cap members shuffle through groupby.map_groups and
    emit ALL pairs (matches the oracle exactly).
  * Hot buckets (> cap) NEVER gather on one worker: members emit
    hub-star edges (bucket_min, member) inside a stateless map_batches
    against a tiny broadcast {hot_key: min_fid} map — O(n) edges, no
    skewed group, no quadratic blowup.  Connectivity through the hub is
    preserved for union-find; pair-level truncation is reported in the
    returned metrics.

All emitted pairs are canonical ``a < b`` (deterministic, retry-safe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages.agg import distinct_rows, grouped_agg
from hsearch_ray.stages.signatures import minhash_matrix

I64 = np.int64
PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _band_explode_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """signatures -> (file_id, band, band_hash) rows (1 -> num_bands).
    Stateless task (no per-worker state worth an actor pool)."""
    sigs = minhash_matrix(batch, cfg.num_perms)
    n = sigs.shape[0]
    bh = H.band_hashes(sigs, cfg.num_bands, cfg.rows_per_band)  # (n, bands) uint64
    fids = batch["file_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "file_id": pa.array(np.repeat(fids, cfg.num_bands), pa.int64()),
            "band": pa.array(
                np.tile(np.arange(cfg.num_bands, dtype=I64), n), pa.int64()
            ),
            "band_hash": pa.array(bh.ravel().view(I64), pa.int64()),
        }
    )


def band_explode(sig_ds, cfg: PipelineConfig):
    return sig_ds.map_batches(
        _band_explode_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=8192,
    )


def bucket_stats(banded_ds) -> pd.DataFrame:
    """Per (band, band_hash): member count + min file_id, via vectorized
    partial aggregation.  This is the A4 analog (bucket-size histogram)
    promoted from debug instrumentation to first-class skew routing."""
    return grouped_agg(
        banded_ds, ["band", "band_hash"], {"file_id": ["min"]}, count_alias="members"
    )


def _packed_keys(band: np.ndarray, bh: np.ndarray) -> np.ndarray:
    """Fold (band, band_hash) into one uint64 key for isin filtering."""
    return H.splitmix64(band.astype(np.uint64) * np.uint64(0x9E37)) ^ bh.view(np.uint64)


def _emit_all_pairs(group: pa.Table) -> pa.Table:
    fids = np.unique(group["file_id"].to_numpy(zero_copy_only=False))
    n = fids.size
    if n < 2:
        return PAIR_SCHEMA.empty_table()
    ii, jj = np.triu_indices(n, k=1)
    return pa.table({"a": pa.array(fids[ii], pa.int64()), "b": pa.array(fids[jj], pa.int64())})


def _hot_star_batch(batch: pa.Table, hot_ref) -> pa.Table:
    """Hub-star edges for hot buckets.  Stateless task; the hot map is a
    tiny ray.put object — ray.get here is a local object-store lookup."""
    hot: dict[tuple[int, int], int] = ray.get(hot_ref)
    band = batch["band"].to_numpy(zero_copy_only=False)
    bh = batch["band_hash"].to_numpy(zero_copy_only=False)
    fid = batch["file_id"].to_numpy(zero_copy_only=False)
    a_out, b_out = [], []
    for i in range(len(fid)):
        hub = hot.get((int(band[i]), int(bh[i])))
        if hub is not None and hub != int(fid[i]):
            a_out.append(hub)
            b_out.append(int(fid[i]))
    return pa.table({"a": pa.array(a_out, pa.int64()), "b": pa.array(b_out, pa.int64())})


def _key_filter(keys_ref):
    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        band = batch["band"].to_numpy(zero_copy_only=False)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        mask = np.isin(_packed_keys(band, bh), keys)
        return batch.filter(pa.array(mask))

    return fn


def candidate_pairs(banded_ds, cfg: PipelineConfig):
    """banded rows -> distinct candidate pair Dataset (a < b) + metrics.

    The broadcast key sets (pairable buckets; hot buckets) are small by
    construction: pairable keys scale with the number of *duplicate*
    files, hot keys with the heavy-hitter tail.  At 10^12-file scale the
    pairable-key semi-join becomes a Bloom filter with identical
    semantics (false positives only cost a wasted groupby row).
    """
    # banded is consumed by three plans (stats, cold pairs, hot pairs):
    # pin it once so the Signer/explode lineage runs exactly once.  At
    # design scale this boundary is a parquet checkpoint (state.lineage).
    banded_ds = banded_ds.materialize()
    stats = bucket_stats(banded_ds)
    members = stats["members"].to_numpy()
    cap = cfg.max_bucket_pairs_exhaustive
    hot_df = stats[members > cap]
    cold_df = stats[(members >= 2) & (members <= cap)]
    metrics = {
        "buckets_total": int(len(stats)),
        "buckets_pairable": int(len(cold_df)) + int(len(hot_df)),
        "buckets_hot": int(len(hot_df)),
        "hot_members_max": int(members.max()) if len(hot_df) else 0,
        "hot_pairs_truncated": True if len(hot_df) else False,
    }

    pair_parts = []
    if len(cold_df):
        cold_keys = np.sort(
            _packed_keys(cold_df["band"].to_numpy(), cold_df["band_hash"].to_numpy())
        )
        cold = banded_ds.map_batches(
            _key_filter(ray.put(cold_keys)), batch_format="pyarrow"
        )
        pair_parts.append(
            cold.groupby(["band", "band_hash"]).map_groups(
                _emit_all_pairs, batch_format="pyarrow"
            )
        )
    if len(hot_df):
        hot_map = {
            (int(b), int(h)): int(m)
            for b, h, m in zip(
                hot_df["band"], hot_df["band_hash"], hot_df["file_id__min"]
            )
        }
        hot_keys = np.sort(
            _packed_keys(hot_df["band"].to_numpy(), hot_df["band_hash"].to_numpy())
        )
        hot = banded_ds.map_batches(
            _key_filter(ray.put(hot_keys)), batch_format="pyarrow"
        )
        pair_parts.append(
            hot.map_batches(
                _hot_star_batch, fn_kwargs={"hot_ref": ray.put(hot_map)},
                batch_format="pyarrow",
            )
        )

    if not pair_parts:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table()), metrics

    pairs = pair_parts[0] if len(pair_parts) == 1 else pair_parts[0].union(pair_parts[1])

    # distinct across bands (D5 analog — the critical cost lever before
    # exact verification, motif_both_points.cpp:222-243 label[] dedup)
    uniq = distinct_rows(pairs, ["a", "b"])
    metrics["candidate_pairs"] = int(len(uniq))
    if uniq.empty:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table()), metrics
    tbl = pa.table({"a": pa.array(uniq["a"].to_numpy(dtype=np.int64), pa.int64()),
                    "b": pa.array(uniq["b"].to_numpy(dtype=np.int64), pa.int64())})
    return ray.data.from_arrow(tbl), metrics
