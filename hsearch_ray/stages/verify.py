"""Exact verification of candidate pairs (actor-pool stage).

Analog of the reference's exact within-bucket check — Euclidean
distance <= R in /root/reference/hclust/src/hclust/kmer_search.cpp:107-111
and the seed-extend alignment verdict in
pcluster/src/pcluster/hash_search.cpp:593-599 — replaced by exact
Jaccard over the full shingle sets (shingle *strings* are never
materialized; SURVEY.md §4 memory rule).

Data movement plan:
  1. Candidate ids (a ∪ b, distinct) are collected — small by
     construction (candidates << corpus).  At 10^12-file scale this
     becomes a Bloom filter; semantics are identical.
  2. One distributed map_batches pass over the candidate-filtered
     corpus computes each file's sorted unique shingle array (the
     per-bucket index build of the reference, hash_search.cpp:164-261,
     done once per file instead of once per bucket).
  3. The arrays are assembled into ONE plasma object
     (ids, offsets, concatenated shingles) — numpy buffers are
     ZERO-COPY on ray.get, so every Verifier actor shares the same
     memory instead of deserializing a per-actor dict.
  4. Verifier actors slice the store by searchsorted lookup and compute
     exact Jaccard with a sorted-array intersection (no re-sort).
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

    pdf = pairs_ds.map_batches(_ids, batch_format="pyarrow").to_pandas()
    if pdf.empty:
        return np.empty(0, dtype=np.int64)
    return np.unique(pdf["file_id"].to_numpy(dtype=np.int64))


class Verifier:
    """Actor-pool exact-Jaccard verifier over the shared shingle store."""

    def __init__(self, cfg: PipelineConfig, store_ref):
        self.cfg = cfg
        self.ids, self.offsets, self.allsh = ray.get(store_ref)  # zero-copy

    def _slice(self, pos: int) -> np.ndarray:
        return self.allsh[self.offsets[pos] : self.offsets[pos + 1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        thr = self.cfg.jaccard_threshold
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        pa_idx = np.searchsorted(self.ids, a)
        pb_idx = np.searchsorted(self.ids, b)
        valid = (
            (pa_idx < self.ids.size)
            & (pb_idx < self.ids.size)
            & (self.ids[np.minimum(pa_idx, self.ids.size - 1)] == a)
            & (self.ids[np.minimum(pb_idx, self.ids.size - 1)] == b)
        )
        sizes = np.diff(self.offsets)
        na = sizes[np.minimum(pa_idx, sizes.size - 1)]
        nb = sizes[np.minimum(pb_idx, sizes.size - 1)]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        # size-ratio bound: attainable Jaccard <= |small|/|big|
        candidates = np.nonzero(valid & (lo > 0) & (lo >= thr * hi))[0]
        out_a, out_b, out_j = [], [], []
        for i in candidates:
            sa, sb = self._slice(pa_idx[i]), self._slice(pb_idx[i])
            inter = H.intersect_count(sa, sb)
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0
            if j >= thr:
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


def shingle_lists(corpus_ds, ids: np.ndarray, cfg: PipelineConfig):
    """Distributed (file_id, sh: list<int64>) shingle sets for the
    candidate files — the join-side input of verify_pairs."""
    ids_ref = ray.put(np.sort(ids))
    k = cfg.shingle_k

    def _shingle(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(fid, ray.get(ids_ref))
        sub = batch.filter(pa.array(mask))
        out_f = sub["file_id"].to_numpy(zero_copy_only=False)
        contents = sub["content"].cast(pa.large_binary()).to_pylist()
        arrs = [
            H.shingle_hashes(H.normalize_for_shingles(c), k).view(np.int64)
            for c in contents
        ]
        # packed as large_binary (LE int64 bytes): Acero hash joins don't
        # accept nested payload columns, binary passes through fine and
        # re-views as uint64 without copy on the other side
        sh = pa.array([a.tobytes() for a in arrs], pa.large_binary())
        return pa.table({"file_id": pa.array(out_f, pa.int64()), "sh": sh})

    return corpus_ds.map_batches(_shingle, batch_format="pyarrow")


def _list_views(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, values) numpy views of a large_binary column holding
    packed LE-int64 shingle arrays.  Offsets are converted to element
    units (bytes / 8)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    byte_offsets = np.frombuffer(
        col.buffers()[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
    )
    data_buf = col.buffers()[2]
    values = (
        np.frombuffer(data_buf, dtype=np.uint64) if data_buf is not None and len(data_buf) else np.empty(0, np.uint64)
    )
    return (byte_offsets // 8).astype(np.int64), values


def build_store(corpus_ds, ids: np.ndarray, cfg: PipelineConfig):
    """Assemble the zero-copy shingle store from the distributed
    shingle_lists pass: one plasma object (ids_sorted, offsets, values)
    whose numpy buffers are SHARED by every Verifier actor on the node
    (ray.get of numpy is zero-copy).  Assembly streams Arrow batches and
    touches each byte once — no pandas, no exploded per-shingle rows."""
    sh_ds = shingle_lists(corpus_ds, ids, cfg)
    fid_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    for batch in sh_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        fid_parts.append(batch["file_id"].to_numpy(zero_copy_only=False))
        off, val = _list_views(batch["sh"])
        len_parts.append(np.diff(off))
        val_parts.append(val[off[0] : off[-1]])
    if not fid_parts:
        empty = np.empty(0, dtype=np.int64)
        return ray.put((empty, np.array([0], dtype=np.int64), np.empty(0, np.uint64)))
    fid = np.concatenate(fid_parts)
    lens = np.concatenate(len_parts)
    vals = np.concatenate(val_parts)
    order = np.argsort(fid, kind="stable")
    # reorder the variable-length segments to file_id order
    starts = np.zeros(fid.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    out_vals = np.empty_like(vals)
    out_offsets = np.zeros(fid.size + 1, dtype=np.int64)
    np.cumsum(lens[order], out=out_offsets[1:])
    for j, i in enumerate(order):
        out_vals[out_offsets[j] : out_offsets[j + 1]] = vals[starts[i] : starts[i + 1]]
    return ray.put((fid[order], out_offsets, out_vals))


def verify_pairs(pairs_ds, corpus_ds, cfg: PipelineConfig):
    """candidate pairs + corpus -> verified pairs Dataset (a,b,jaccard,method).

    The shingle store is built by a distributed pass and shared zero-copy
    through the object store (each pair row carries only two int64 ids —
    a hash-join alternative would duplicate an ~O(shingles) payload onto
    every pair row, which explodes exactly when there are many dups).
    Scale note: when the candidate store outgrows node memory, shard it
    by file_id range and route pairs to shards with one narrow shuffle.
    """
    ids = candidate_ids(pairs_ds)
    if ids.size == 0:
        return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())
    store_ref = build_store(corpus_ds, ids, cfg)

    def _verify_task(batch: pa.Table) -> pa.Table:
        # stateless task: ray.get of the numpy store is zero-copy from the
        # local object store, so per-task "state load" is ~free and we
        # reuse Ray's warm workers instead of spawning an actor pool
        v = Verifier(cfg, store_ref)
        return v(batch)

    return pairs_ds.map_batches(
        _verify_task,
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
    )


def gather_candidate_contents(corpus_ds, ids: np.ndarray):
    """Broadcast semi-join: {file_id: normalized content bytes} for the
    candidate files (used by the containment verifier)."""
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
