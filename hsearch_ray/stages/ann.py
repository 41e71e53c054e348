"""Approximate-nearest-neighbor search over an embedding column.

The reference's query-vs-DB probe (J2: Pfam centers probed against all
k-mer LSH tables, /root/reference/hclust/src/hclust/kmer_search.cpp:85-127)
re-expressed for dense vectors:

  * brute-force top-k — the small query matrix is broadcast once
    (ray.put), every batch computes a vectorized float64 cosine block
    (numpy matmul) and emits its per-batch partial top-k; a final tiny
    groupby merges partials.  This is the exact baseline; wall-time is
    one matmul per (batch x queries) block and the shuffle only moves
    k rows per (query, batch).
  * LSH-bucketed variant (random-hyperplane SimHash over vectors, the
    analog of the reference's KLSH cosine family,
    pcluster/src/pcluster/lsh.cpp:17-49) — probes only same-bucket
    vectors; recall < 1 by design, scale path for 10^9+ rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from hsearch_ray import hashing as H


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(batch), -1)


class _PartialTopK:
    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)  # dict: query_id -> float64 vector
        self.qids = np.array(sorted(q), dtype=np.int64)
        qm = np.stack([q[i] for i in self.qids])
        self.qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _embedding_matrix(batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ self.qnorm.T  # (n, nq)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            # round BEFORE selection and tie-break by neighbor_id so the
            # per-batch prune ranks by exactly the key the final merge
            # (and the DuckDB oracle) uses — an unrounded prune could
            # drop a neighbor that ties after rounding with a smaller id
            col = np.round(sims[:, qi], 6)
            mask = vids != qid  # exclude self
            idx = np.nonzero(mask)[0]
            if idx.size == 0:
                continue
            take = idx[np.lexsort((vids[idx], -col[idx]))][: self.k]
            out_q.extend([int(qid)] * len(take))
            out_v.extend(int(v) for v in vids[take])
            out_s.extend(col[take])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def _final_topk(k: int):
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id"]]

    return merge


def brute_force_topk(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5):
    """embeddings Dataset + {query_id: vector} -> (query_id, neighbor_id)
    exact cosine top-k (ties broken by rounded-sim desc, id asc)."""
    ref = ray.put({int(i): np.asarray(v, dtype=np.float64) for i, v in query_vectors.items()})
    partial = emb_ds.map_batches(
        _PartialTopK,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
    )
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def cosine_dup_pairs(emb_ds, threshold: float, id_col: str = "vec_id"):
    """Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    cosine similarity >= threshold.  The normalized matrix is broadcast
    once (ray.put) and every batch emits its pairs from one matmul block
    — the exact O(n^2/p) baseline; the scale path is the hyperplane-
    bucketed variant (lsh_topk's coder) with per-bucket matmuls.
    Output: (a, b) only — pair identity, not scores, is the dedup
    contract (score formulas differ at the last ulp across engines)."""
    import pyarrow.parquet  # noqa: F401  (parity with _load_queries env)

    pdf = emb_ds.to_pandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    mat = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids, mat / norms))

    def _pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_norm = ray.get(ref)  # zero-copy numpy
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        emb = _embedding_matrix(batch)
        bn = np.linalg.norm(emb, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        sims = (emb / bn) @ all_norm.T  # (batch, n)
        hit = sims >= threshold
        # canonical a < b and no self-pairs: keep only columns with a
        # LARGER id than the row's, so each pair is emitted exactly once
        hit &= bids[:, None] < all_ids[None, :]
        r, c = np.nonzero(hit)
        return pa.table({"a": pa.array(bids[r], pa.int64()),
                         "b": pa.array(all_ids[c], pa.int64())})

    return emb_ds.map_batches(_pairs, batch_format="pyarrow", batch_size=2048)


class _HyperplaneCoder:
    """vec -> nbits-bit random-hyperplane code (seeded)."""

    def __init__(self, dim: int, nbits: int, seed: int):
        rng = np.random.Generator(np.random.PCG64(seed ^ 0x51F0))
        self.planes = rng.standard_normal((dim, nbits))

    def code(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))).astype(np.int64)


def lsh_topk(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5,
             nbits: int = 8, seed: int = 42, multiprobe: int = 1):
    """Bucketed ANN: only vectors whose hyperplane code is within
    ``multiprobe`` bit flips of the query's code are scored (classic
    multi-probe LSH — neighboring buckets differ in the bits whose
    hyperplane margin is smallest, so probing Hamming-1 buckets recovers
    most of the single-probe misses for (1+nbits)x the candidate pool).
    Approximate by design; recall vs brute force is pinned by a test."""
    qd = {int(i): np.asarray(v, dtype=np.float64) for i, v in query_vectors.items()}
    dim = len(next(iter(qd.values())))
    coder = _HyperplaneCoder(dim, nbits, seed)
    qcodes: dict[int, list[int]] = {}
    for qid, v in qd.items():
        base = int(coder.code(v[None, :])[0])
        codes = [base]
        if multiprobe >= 1:
            codes += [base ^ (1 << b) for b in range(nbits)]
        for code in codes:
            qcodes.setdefault(code, []).append(qid)
    ref = ray.put((qd, qcodes))

    class _BucketScore:
        def __init__(self):
            self.qd, self.qcodes = ray.get(ref)
            self.coder = _HyperplaneCoder(dim, nbits, seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _embedding_matrix(batch)
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            codes = self.coder.code(emb)
            out_q, out_v, out_s = [], [], []
            for code, qids in self.qcodes.items():
                mask = codes == code
                if not mask.any():
                    continue
                sub, subids = emb[mask], vids[mask]
                norms = np.linalg.norm(sub, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                subn = sub / norms
                for qid in qids:
                    qv = self.qd[qid]
                    sims = subn @ (qv / np.linalg.norm(qv))
                    sel = subids != qid
                    idx = np.nonzero(sel)[0]
                    take = idx[np.argsort(-sims[idx], kind="stable")][:k]
                    out_q.extend([qid] * len(take))
                    out_v.extend(int(v) for v in subids[take])
                    out_s.extend(np.round(sims[take], 6))
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    partial = emb_ds.map_batches(_BucketScore, batch_format="pyarrow",
                                 batch_size=4096, concurrency=(1, 4))
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")
