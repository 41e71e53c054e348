"""Exact verification of candidate pairs (actor-pool stage).

Analog of the reference's exact within-bucket check — Euclidean
distance <= R in /root/reference/hclust/src/hclust/kmer_search.cpp:107-111
and the seed-extend alignment verdict in
pcluster/src/pcluster/hash_search.cpp:593-599 — replaced by exact
Jaccard over the full shingle sets, recomputed from content (shingle
*strings* are never materialized; SURVEY.md §4 memory rule).

Data movement plan:
  1. Candidate ids (a ∪ b, distinct) are collected — a small set by
     construction (candidates << corpus).  At 10^12-file scale this
     becomes a Bloom filter; semantics are identical.
  2. The corpus is filtered to candidate files with a vectorized
     np.isin inside map_batches — a broadcast semi-join, no shuffle.
  3. The (file_id -> normalized content) map for candidates is put in
     the object store ONCE (ray.put) and read by each Verifier actor in
     __init__ — the broadcast-small-side pattern.  The fully
     shuffle-based alternative (Dataset.join of pairs with contents on
     a then b) is implemented in ``attach_contents_join`` for when the
     candidate set outgrows broadcast.
  4. Verifier actors hold an LRU shingle-set cache: a file appearing in
     many pairs is shingled once per actor (the reuse the reference
     gets from its per-bucket index, hash_search.cpp:164-261).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig

VERIFIED_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64()), ("method", pa.string())]
)


def candidate_ids(pairs_ds) -> np.ndarray:
    """Distinct file ids referenced by the pair table (driver-side array)."""

    def _ids(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["a"].to_numpy(zero_copy_only=False),
                    batch["b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"file_id": pa.array(u, pa.int64())})

    parts = pairs_ds.map_batches(_ids, batch_format="pyarrow").take_all()
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.array([r["file_id"] for r in parts], dtype=np.int64))


def gather_candidate_contents(corpus_ds, ids: np.ndarray):
    """Broadcast semi-join: filter corpus to candidate rows, return
    ray.put ref of {file_id: normalized_content_bytes}."""
    ids_ref = ray.put(np.sort(ids))

    def _filter(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(fid, ray.get(ids_ref))
        return batch.filter(pa.array(mask)).select(["file_id", "content"])

    rows = corpus_ds.map_batches(_filter, batch_format="pyarrow").take_all()
    contents = {
        int(r["file_id"]): H.normalize_for_shingles(
            r["content"].encode() if isinstance(r["content"], str) else r["content"]
        )
        for r in rows
    }
    return ray.put(contents)


class Verifier:
    """Actor-pool exact-Jaccard verifier with per-actor shingle cache."""

    def __init__(self, cfg: PipelineConfig, contents_ref, cache_max: int = 50_000):
        self.cfg = cfg
        self.contents: dict[int, bytes] = ray.get(contents_ref)
        self.cache: dict[int, np.ndarray] = {}
        self.cache_max = cache_max

    def _shingles(self, fid: int) -> np.ndarray:
        s = self.cache.get(fid)
        if s is None:
            raw = self.contents.get(fid, b"")
            s = H.shingle_hashes(raw, self.cfg.shingle_k)
            if len(self.cache) >= self.cache_max:
                self.cache.clear()  # simple epoch eviction; sets are cheap to rebuild
            self.cache[fid] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for i in range(len(a)):
            sa, sb = self._shingles(int(a[i])), self._shingles(int(b[i]))
            if sa.size == 0 or sb.size == 0:
                continue
            # cheap size prefilter: |A|/|B| bounds attainable Jaccard
            lo, hi = (sa.size, sb.size) if sa.size < sb.size else (sb.size, sa.size)
            if lo / hi < cfg.jaccard_threshold:
                continue
            j = H.exact_jaccard(sa, sb)
            if j >= cfg.jaccard_threshold:
                out_a.append(int(a[i]))
                out_b.append(int(b[i]))
                out_j.append(j)
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
                "method": pa.array(["minhash_lsh"] * len(out_a), pa.string()),
            }
        )


def verify_pairs(pairs_ds, corpus_ds, cfg: PipelineConfig):
    """candidate pairs + corpus -> verified pairs Dataset (a,b,jaccard,method)."""
    ids = candidate_ids(pairs_ds)
    if ids.size == 0:
        return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())
    contents_ref = gather_candidate_contents(corpus_ds, ids)
    return pairs_ds.map_batches(
        Verifier,
        fn_constructor_args=(cfg, contents_ref),
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
        concurrency=cfg.verify_concurrency,
        num_cpus=1,
    )
