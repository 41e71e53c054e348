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

import numpy as np
import pyarrow as pa

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig

I64 = np.int64


class Signer:
    def __init__(self, cfg: PipelineConfig, with_fingerprints: bool = False):
        self.cfg = cfg
        self.with_fps = with_fingerprints
        self.a, self.b = H.perm_params(cfg.seed, cfg.num_perms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        fids = batch["file_id"].to_numpy(zero_copy_only=False)
        contents = batch["content"].cast(pa.large_binary()).to_pylist()
        n = len(contents)
        sigs = np.empty((n, cfg.num_perms), dtype=np.uint64)
        simh = np.empty(n, dtype=np.uint64)
        nsh = np.empty(n, dtype=I64)
        fps: list[np.ndarray] = []
        for i, raw in enumerate(contents):
            norm = H.normalize_for_shingles(raw)
            stream = H.shingle_stream(norm, cfg.shingle_k)
            uniq = np.unique(stream)
            nsh[i] = uniq.size
            sigs[i] = H.minhash_signature(uniq, self.a, self.b)
            simh[i] = H.simhash64(uniq)
            if self.with_fps:
                fps.append(H.winnow_fingerprints(stream, cfg.winnow_window).view(I64))
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


def sign(ds, cfg: PipelineConfig, with_fingerprints: bool = False):
    """kept-corpus Dataset -> signatures Dataset (actor pool)."""
    return ds.map_batches(
        Signer,
        fn_constructor_args=(cfg, with_fingerprints),
        batch_format="pyarrow",
        batch_size=cfg.sign_batch_size,
        concurrency=cfg.sign_concurrency,
        num_cpus=1,
    )


def minhash_matrix(batch: pa.Table, num_perms: int) -> np.ndarray:
    """(n, P) uint64 view of the minhash fixed_size_list column (zero-copy)."""
    col = batch["minhash"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # already combined -> Array
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    return flat.reshape(-1, num_perms)
