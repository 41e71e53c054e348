"""Signature stage: k-char shingles -> MinHash + SimHash per file.

Actor-pool map_batches (SURVEY.md §2.3 T1/T2): each actor regenerates
the permutation family from ``(config.seed)`` once in ``__init__`` —
the analog of constructing the LSH family once and reusing it across
all records (/root/reference/hclust/src/hclust/lsh.hpp:10-31,
pcluster/src/pcluster/lsh.cpp:17-38) — then signs batches with
vectorized NumPy kernels.  The reference seeds from time(NULL)
(non-reproducible); we are deterministic by construction.

Output schema (narrow; content does NOT flow past this stage):
  file_id   : int64
  nshingles : int64                      (|unique shingle set|)
  minhash   : fixed_size_list<int64>[P]  (uint64 sigs bit-cast to int64)
  simhash   : int64                      (uint64 bit-cast)
  fps       : list<int64>, optional      (winnowing fingerprints for the
                                          containment pass)
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig

I64 = np.int64


def batched_streams(col, k: int, canon: bool = False) -> list[np.ndarray]:
    """Per-doc positional shingle-hash streams for a binary content
    column (shared by the Signer and the verify-store shard builder).

    Fast path (no CR bytes, no canonicalization): ONE vectorized
    rolling-hash pass over the column's concatenated data buffer — the
    Arrow layout IS the reference's concatenated store
    (protein.hpp:14-39), so per-doc streams are just slices whose
    windows don't cross doc boundaries.  Values are bit-identical to
    the per-doc kernel (a window's hash depends only on its k bytes).
    Falls back to the per-doc path when CRLF normalization or token
    canonicalization must edit bytes first."""
    col = col.cast(pa.large_binary())
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    off = np.frombuffer(col.buffers()[1], dtype=np.int64,
                        count=len(col) + 1, offset=col.offset * 8)
    buf = col.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8)
            if buf is not None and len(buf) else np.empty(0, np.uint8))
    # a sliced column VIEWS its parent's buffers: restrict to this
    # slice's byte range or every batch re-hashes the whole parent
    data = data[off[0] : off[-1]]
    off = off - off[0]
    if canon or bool((data == 13).any()):
        return [
            H.shingle_stream(
                H.normalize_for_shingles(
                    data[off[i]:off[i + 1]].tobytes(), canon
                ),
                k,
            )
            for i in range(len(col))
        ]
    full = H.rolling_hash(data, k)  # one pass over the whole buffer
    out = []
    for i in range(len(col)):
        s, e = off[i], off[i + 1]
        if e - s >= k:
            out.append(full[s : e - k + 1])
        else:  # short-content special case matches shingle_stream
            out.append(H.shingle_stream(data[s:e].tobytes(), k))
    return out


class Signer:
    def __init__(self, cfg: PipelineConfig, with_fingerprints: bool = False,
                 with_simhash: bool = False):
        self.cfg = cfg
        self.with_fps = with_fingerprints
        self.with_simhash = with_simhash
        if cfg.minhash_scheme == "perms":
            self.a, self.b = H.perm_params(cfg.seed, cfg.num_perms)
        else:
            self.a = self.b = None

    def _streams(self, batch: pa.Table) -> list[np.ndarray]:
        return batched_streams(batch["content"], self.cfg.shingle_k,
                               self.cfg.token_canonicalize)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        fids = batch["file_id"].to_numpy(zero_copy_only=False)
        streams = self._streams(batch)
        n = len(streams)
        sigs = np.full((n, cfg.num_perms), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
        simh = np.zeros(n, dtype=np.uint64)
        nsh = np.empty(n, dtype=I64)
        fps: list[np.ndarray] = []
        uniqs: list[np.ndarray] = []
        nonempty: list[int] = []
        for i, stream in enumerate(streams):
            uniq = np.unique(stream)
            nsh[i] = uniq.size
            if uniq.size:
                nonempty.append(i)
                uniqs.append(uniq)
            if self.with_fps:
                fps.append(H.winnow_fingerprints(stream, cfg.winnow_window).view(I64))
        if nonempty:
            # both minhash schemes sign the whole batch in ONE call over
            # the concatenated unique-shingle arrays (per-doc 128-wide
            # numpy calls were 75% of signing time)
            allsh = np.concatenate(uniqs)
            offsets = np.cumsum([0] + [u.size for u in uniqs[:-1]], dtype=np.int64)
            idx = np.array(nonempty, dtype=np.int64)
            if cfg.minhash_scheme == "oph":
                sigs[idx] = H.batch_minhash_oph(allsh, offsets, cfg.num_perms, cfg.seed)
            else:
                sigs[idx] = H.batch_minhash(allsh, offsets, self.a, self.b)
            if self.with_simhash:
                # simhash is O(64·n) memory traffic — computed only when
                # a consumer asks (the dedup path doesn't need it)
                simh[idx] = H.batch_simhash(allsh, offsets)
        cols = {
            "file_id": pa.array(fids, pa.int64()),
            "nshingles": pa.array(nsh, pa.int64()),
            "minhash": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.view(I64).ravel(), pa.int64()), cfg.num_perms
            ),
            "simhash": pa.array(simh.view(I64), pa.int64()),
        }
        if self.with_fps:
            cols["fps"] = pa.array([f.tolist() for f in fps], pa.list_(pa.int64()))
        return pa.table(cols)


def pool_size(frac: float = 0.75) -> int:
    """Fixed actor-pool size ~frac of session CPUs (for stages that do
    need actor state, e.g. model inference)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, int(cpus * frac))


@functools.lru_cache(maxsize=8)
def _cached_signer(seed: int, num_perms: int, shingle_k: int, winnow: int,
                   scheme: str, with_fps: bool, with_simhash: bool,
                   canon: bool) -> "Signer":
    from hsearch_ray.config import PipelineConfig as _PC

    cfg = _PC(seed=seed, num_perms=num_perms, shingle_k=shingle_k,
              winnow_window=winnow, minhash_scheme=scheme,
              token_canonicalize=canon)
    return Signer(cfg, with_fps, with_simhash)


def _sign_task(batch: pa.Table, seed: int, num_perms: int, shingle_k: int,
               winnow: int, scheme: str, with_fps: bool, with_simhash: bool,
               canon: bool) -> pa.Table:
    return _cached_signer(seed, num_perms, shingle_k, winnow, scheme,
                          with_fps, with_simhash, canon)(batch)


def sign(ds, cfg: PipelineConfig, with_fingerprints: bool = False,
         with_simhash: bool = False):
    """kept-corpus Dataset -> signatures Dataset.

    Runs as STATELESS TASKS on Ray's warm worker pool, not an actor
    pool: the only per-worker state (the seeded permutation family,
    SURVEY.md §2.3 T1) regenerates in milliseconds and is cached
    per-process via lru_cache, so tasks get actor-grade state reuse
    without paying actor-pool spawn (fresh processes + cold imports)
    every pipeline execution."""
    return ds.map_batches(
        _sign_task,
        fn_kwargs=dict(seed=cfg.seed, num_perms=cfg.num_perms,
                       shingle_k=cfg.shingle_k, winnow=cfg.winnow_window,
                       scheme=cfg.minhash_scheme,
                       with_fps=with_fingerprints, with_simhash=with_simhash,
                       canon=cfg.token_canonicalize),
        batch_format="pyarrow",
        batch_size=cfg.sign_batch_size,
    )


def minhash_matrix(batch: pa.Table, num_perms: int) -> np.ndarray:
    """(n, P) uint64 view of the minhash fixed_size_list column (zero-copy)."""
    col = batch["minhash"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # already combined -> Array
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    return flat.reshape(-1, num_perms)
