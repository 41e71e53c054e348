"""Similarity search + embedding-cosine dedup over an embedding column.

The reference's query-vs-DB probe (J2: Pfam centers probed against all
k-mer LSH tables, /root/reference/hclust/src/hclust/kmer_search.cpp:85-127)
re-expressed for dense vectors:

  * brute-force top-k — the small query matrix is broadcast once
    (ray.put), every batch computes a vectorized float64 cosine block
    (numpy matmul) and emits its per-batch partial top-k; a final tiny
    groupby merges partials.  This is the exact baseline; wall-time is
    one matmul per (batch x queries) block and the shuffle only moves
    k rows per (query, batch).
  * L-table LSH-bucketed variant (random-hyperplane SimHash over
    vectors — the analog of the reference's KLSH cosine family,
    pcluster/src/pcluster/lsh.cpp:17-49, with the reference's L-table
    union-of-candidates discipline, hclust2.cpp:102-133) — probes only
    vectors colliding with the query in ANY table; recall < 1 by
    design, pinned by test; scale path for 10^9+ rows.

Embedding-cosine DEDUP has two physical plans, routed by threshold:

  * ``cosine_dup_pairs`` (exact, any threshold) — the all-pairs join is
    distributed as a BLOCK-PAIR GRID over an id-range-sharded
    normalized-vector store: S remote tasks build the shards from the
    dataset's Arrow blocks (the driver never materializes the table),
    then S·(S+1)/2 grid tasks each fetch exactly two shards (zero-copy
    numpy from the object store) and emit their qualifying pairs from
    one matmul.  Compute is O(n²/p) — intrinsic for exact low-threshold
    cosine joins — but memory per task is two shards and nothing is
    driver-side or broadcast-whole.
  * ``cosine_dup_pairs_lsh`` (approximate-candidates + exact verify) —
    hyperplane-band candidate generation through the shared sorted-run
    pair machinery (lsh.counted_pairs_from_keyed), then exact cosine
    verification of candidate pairs only, fetching only the vector
    shards a batch references.  This is the 100-TB path for PRODUCTION
    thresholds (>= ~0.8, where collision probability separates sharply
    from random).  At low thresholds (e.g. the 0.45 demo threshold:
    boundary collision p=0.65/bit vs 0.5/bit random) no banding scheme
    filters without recall loss — use the exact grid there.  Recall vs
    the brute arm is pinned by a planted-near-dup pytest.
"""

from __future__ import annotations

from functools import lru_cache

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


@lru_cache(maxsize=8)
def _topk_state(queries_ref):
    """Per-process cache of the normalized query matrix (stateless
    warm-worker tasks get actor-grade state reuse without actor-pool
    respawn; ObjectRefs are hashable and the cache pins them)."""
    q = ray.get(queries_ref)  # dict: query_id -> float64 vector
    qids = np.array(sorted(q), dtype=np.int64)
    qm = np.stack([q[i] for i in qids])
    return qids, qm / np.linalg.norm(qm, axis=1, keepdims=True)


def _partial_topk(batch: pa.Table, queries_ref, k: int) -> pa.Table:
    qids, qnorm = _topk_state(queries_ref)
    emb = _embedding_matrix(batch)
    vids = batch["vec_id"].to_numpy(zero_copy_only=False)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (emb / norms) @ qnorm.T  # (n, nq)
    out_q, out_v, out_s = [], [], []
    for qi, qid in enumerate(qids):
        # round BEFORE selection and tie-break by neighbor_id so the
        # per-batch prune ranks by exactly the key the final merge
        # (and the DuckDB oracle) uses — an unrounded prune could
        # drop a neighbor that ties after rounding with a smaller id
        col = np.round(sims[:, qi], 6)
        mask = vids != qid  # exclude self
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            continue
        take = idx[np.lexsort((vids[idx], -col[idx]))][:k]
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
        _partial_topk,
        fn_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
    )
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


# ------------------------------------------------------------------ vector store


@ray.remote
def _build_vec_shard(lo: int, hi: int | None, id_col: str, blocks):
    """One id-range shard of the NORMALIZED embedding store, built
    directly from the dataset's Arrow blocks (same discipline as the
    shingle store, stages/verify.py:_build_shard): the driver never
    touches vector bytes.  Returns (ids_sorted, unit_matrix).  hi=None
    marks the LAST shard (unbounded above)."""
    id_parts, mat_parts = [], []
    # refs fetched one at a time (verify._build_shard's incremental-pin
    # discipline): builders never pin the whole embedding table
    for ref in blocks:
        tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if tbl.num_rows == 0:
            continue
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        mask = (ids >= lo) if hi is None else (ids >= lo) & (ids < hi)
        if not mask.any():
            continue
        sub = tbl.filter(pa.array(mask))
        m = _embedding_matrix(sub)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        id_parts.append(ids[mask].astype(np.int64))
        mat_parts.append(m / norms)
    if not id_parts:
        return np.empty(0, np.int64), np.empty((0, 0), np.float64)
    ids = np.concatenate(id_parts)
    mat = np.vstack(mat_parts)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def build_vec_store(emb_ds, id_col: str = "vec_id", num_shards: int | None = None):
    """Id-range-sharded normalized-vector store.

    Shard bounds come from one narrow distributed (min, max) pass over
    the id column (ids need not be dense; equal-width ranges over the
    observed span — id skew makes shards uneven but never incorrect).
    Returns (bounds, shard_refs, materialized_ds):
      bounds[i] = inclusive lower id of shard i (len = num_shards + 1,
      last = max + 1)."""
    emb_ds = emb_ds.materialize()
    if num_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # block-pair grid wants S(S+1)/2 >= cpus work units; the
        # row-count ceiling (one shard per 2M vectors ≈ 1 GB at 64
        # float64 dims) bounds per-shard memory at any corpus size —
        # the same payload-size discipline as verify.build_store
        from hsearch_ray.stages.agg import default_num_shards

        num_shards = default_num_shards(
            emb_ds.count(), 2_000_000,
            cpu_floor=int(np.ceil(np.sqrt(2 * cpus))), floor=2)

    def _mm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(ids.min())], pa.int64()),
                         "hi": pa.array([int(ids.max())], pa.int64())})

    mm = emb_ds.map_batches(_mm, batch_format="pyarrow").to_pandas()
    if mm.empty:
        return np.array([0, 1], dtype=np.int64), [], emb_ds
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    bounds = H.int_range_cuts(
        lo, min(hi, np.iinfo(np.int64).max - 1) + 1, num_shards
    )
    block_refs = list(emb_ds.to_arrow_refs())
    last = len(bounds) - 2
    shard_refs = [
        _build_vec_shard.remote(int(bounds[s]),
                                None if s == last else int(bounds[s + 1]),
                                id_col, block_refs)
        for s in range(len(bounds) - 1)
    ]
    return bounds, shard_refs, emb_ds


def cosine_dup_pairs(emb_ds, threshold: float, id_col: str = "vec_id",
                     num_shards: int | None = None):
    """Embedding-cosine near-duplicate pairs: all (a, b), a < b, with
    cosine similarity >= threshold — EXACT, via the distributed
    block-pair grid over the sharded vector store (module docstring).
    Output: (a, b) only — pair identity, not scores, is the dedup
    contract (score formulas differ at the last ulp across engines)."""
    bounds, shard_refs, _ = build_vec_store(emb_ds, id_col, num_shards)
    S = len(shard_refs)
    if S == 0:
        return ray.data.from_arrow(
            pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        )
    refs_ref = ray.put(shard_refs)
    gi, gj = np.triu_indices(S)  # i <= j: id-range order makes a < b free
    grid = ray.data.from_arrow(
        pa.table({"i": pa.array(gi, pa.int64()), "j": pa.array(gj, pa.int64())})
    ).repartition(gi.size)

    def _grid_pairs(batch: pa.Table) -> pa.Table:
        refs = ray.get(refs_ref)
        out_a, out_b = [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            ids_i, mat_i = ray.get(refs[i])  # zero-copy numpy
            ids_j, mat_j = ray.get(refs[j])
            if ids_i.size == 0 or ids_j.size == 0:
                continue
            hit = (mat_i @ mat_j.T) >= threshold
            if i == j:
                hit &= ids_i[:, None] < ids_j[None, :]
            r, c = np.nonzero(hit)
            out_a.append(ids_i[r])
            out_b.append(ids_j[c])
        if not out_a:
            return pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                         "b": pa.array(np.concatenate(out_b), pa.int64())})

    return grid.map_batches(_grid_pairs, batch_format="pyarrow", batch_size=1)


class _HyperplaneCoder:
    """vec -> nbits-bit random-hyperplane code (seeded)."""

    def __init__(self, dim: int, nbits: int, seed: int):
        rng = np.random.Generator(np.random.PCG64(seed ^ 0x51F0))
        self.planes = rng.standard_normal((dim, nbits))

    def code(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))).astype(np.int64)


def cosine_dup_pairs_lsh(emb_ds, threshold: float, id_col: str = "vec_id",
                         nbits: int = 16, ntables: int = 8, seed: int = 42,
                         cap: int = 4096, num_shards: int | None = None):
    """Scale-path cosine dedup for HIGH thresholds: L-table hyperplane-
    band candidates + exact cosine verify of candidates only.

    Candidate generation reuses the LSH sorted-run machinery
    (lsh.counted_pairs_from_keyed — one key sort + vectorized run scan,
    hub-star above ``cap``); verification fetches only the vector
    shards a pair batch references (<= a few per batch: candidates
    arrive a-sorted).  Recall < 1 by LSH math — (1 - p^nbits)^ntables
    miss probability at collision rate p = 1 - theta/pi — pinned by a
    planted-fixture pytest against the brute arm.  Reference analog:
    KLSH pre-bucketing before alignment,
    pcluster/src/pcluster/pcluster.cpp:13-34."""
    from hsearch_ray.stages.lsh import counted_pairs_from_keyed

    bounds, shard_refs, emb_mat = build_vec_store(emb_ds, id_col, num_shards)
    if not shard_refs:
        return ray.data.from_arrow(
            pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        )
    store_ref = ray.put((bounds, shard_refs))

    def _explode(batch: pa.Table) -> pa.Table:
        m = _embedding_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keys, fids = [], []
        for t in range(ntables):
            coder = _cached_coder(m.shape[1], nbits, seed + 7919 * t)
            code = coder.code(m)  # non-negative, < 2^nbits
            # disjoint bit ranges per table BEFORE hashing (the simhash
            # (band << 48) | chunk scheme): an additive offset would let
            # adjacent tables alias to one gkey whenever c1 - c2 equals
            # the offset delta, merging unrelated buckets past ``cap``
            keys.append(H.splitmix64(
                (np.uint64(t + 1) << np.uint64(48)) | code.astype(np.uint64)
            ).view(np.int64))
            fids.append(ids)
        return pa.table({"gkey": pa.array(np.concatenate(keys), pa.int64()),
                         "file_id": pa.array(np.concatenate(fids), pa.int64())})

    keyed = emb_mat.map_batches(_explode, batch_format="pyarrow", batch_size=8192)
    cand, _ = counted_pairs_from_keyed(keyed, cap=cap)

    def _cos_verify(batch: pa.Table) -> pa.Table:
        look = _vec_lookup(store_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        va, oka = look.gather(a)
        vb, okb = look.gather(b)
        sims = np.einsum("ij,ij->i", va, vb)
        keep = oka & okb & (sims >= threshold)
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})

    return cand.map_batches(_cos_verify, batch_format="pyarrow",
                            batch_size=65536)


@lru_cache(maxsize=8)
def _vec_lookup(store_ref) -> "_ShardedVecLookup":
    """Per-process lookup cache keyed by the store ref (stateless tasks
    share lazily-fetched shards without an actor pool)."""
    return _ShardedVecLookup(store_ref)


class _ShardedVecLookup:
    """Lazy per-batch shard fetch over the sharded normalized-vector
    store (the Jaccard Verifier's access pattern, stages/verify.py:73)."""

    # Bounded LRU: zero-copy views pin their plasma objects, and vector
    # shards are the fat ones (dim x 8 B/row) — an unbounded map would
    # let every worker pin the whole store (the Verifier's
    # verify_shard_cache rationale, stages/verify.py).
    _CACHE_CAP = 8

    def __init__(self, store_ref):
        import collections

        self.bounds, self.refs = ray.get(store_ref)
        self._shards: "collections.OrderedDict[int, tuple]" = \
            collections.OrderedDict()

    def _shard(self, s: int):
        t = self._shards.get(s)
        if t is None:
            t = self._shards[s] = ray.get(self.refs[s])
            if len(self._shards) > self._CACHE_CAP:
                self._shards.popitem(last=False)
        else:
            self._shards.move_to_end(s)
        return t

    def gather(self, x: np.ndarray):
        sh = np.searchsorted(self.bounds[1:-1], x, side="right") \
            if self.bounds.size > 2 else np.zeros(x.size, np.int64)
        out = None
        ok = np.zeros(x.size, dtype=bool)
        for s in np.unique(sh):
            ids_s, mat_s = self._shard(int(s))
            rows = np.nonzero(sh == s)[0]
            if ids_s.size == 0:
                continue
            if out is None:
                out = np.zeros((x.size, mat_s.shape[1]))
            p = np.minimum(np.searchsorted(ids_s, x[rows]), ids_s.size - 1)
            hit = ids_s[p] == x[rows]
            out[rows[hit]] = mat_s[p[hit]]
            ok[rows[hit]] = True
        if out is None:
            out = np.zeros((x.size, 1))
        return out, ok


@lru_cache(maxsize=64)
def _cached_coder(dim: int, nbits: int, seed: int) -> _HyperplaneCoder:
    """Per-process coder cache: plane matrices are regenerated from the
    seed on each worker instead of shipped (T1/T2 discipline)."""
    return _HyperplaneCoder(dim, nbits, seed)


def lsh_topk(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5,
             nbits: int = 8, seed: int = 42, multiprobe: int = 1,
             ntables: int = 4):
    """Bucketed ANN with the reference's L-table discipline
    (hclust2.cpp:102-133): ``ntables`` independent hyperplane codebooks;
    a vector is scored for a query if it collides in ANY table (union of
    candidates), with classic Hamming-1 multiprobe per table.
    Approximate by design; recall vs brute force is pinned by a test."""
    qd = {int(i): np.asarray(v, dtype=np.float64) for i, v in query_vectors.items()}
    dim = len(next(iter(qd.values())))
    qids_sorted = sorted(qd)
    # per-table SORTED (probe_code, query_rank) arrays, built once on the
    # driver — the batch side probes them with two searchsorted calls per
    # table instead of a Python loop over (bucket x query) dict entries,
    # so candidate marking stays vectorized at any probe-set size
    probe_maps: list[tuple[np.ndarray, np.ndarray]] = []
    for t in range(ntables):
        coder = _HyperplaneCoder(dim, nbits, seed + 7919 * t)
        pcodes, pranks = [], []
        for rank, qid in enumerate(qids_sorted):
            base = int(coder.code(qd[qid][None, :])[0])
            codes = [base]
            if multiprobe >= 1:
                codes += [base ^ (1 << b) for b in range(nbits)]
            pcodes.extend(codes)
            pranks.extend([rank] * len(codes))
        pc = np.asarray(pcodes, dtype=np.int64)
        pr = np.asarray(pranks, dtype=np.int64)
        order = np.argsort(pc, kind="stable")
        probe_maps.append((pc[order], pr[order]))
    ref = ray.put((qd, qids_sorted, probe_maps))

    def _bucket_score(batch: pa.Table) -> pa.Table:
        qd_, qids, probe_maps_ = _lsh_query_state(ref)
        coders = [_cached_coder(dim, nbits, seed + 7919 * t)
                  for t in range(ntables)]
        qm = np.stack([qd_[q] for q in qids])
        qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        emb = _embedding_matrix(batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        n, nq = emb.shape[0], len(qids)
        cand = np.zeros((nq, n), dtype=bool)  # union over tables
        for t in range(ntables):
            codes = coders[t].code(emb)
            pc, pr = probe_maps_[t]
            lo = np.searchsorted(pc, codes, side="left")
            hi = np.searchsorted(pc, codes, side="right")
            span = hi - lo
            rows = np.nonzero(span)[0]
            if rows.size == 0:
                continue
            # concatenate the [lo, hi) entry ranges (ones+cumsum trick)
            ln = span[rows]
            idx = np.ones(int(ln.sum()), dtype=np.int64)
            idx[0] = lo[rows[0]]
            if rows.size > 1:
                ends = np.cumsum(ln)[:-1]
                idx[ends] = lo[rows[1:]] - (lo[rows[:-1]] + ln[:-1]) + 1
            idx = np.cumsum(idx)
            cand[pr[idx], np.repeat(rows, ln)] = True
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        embn = emb / norms
        out_q, out_v, out_s = [], [], []
        for r, qid in enumerate(qids):
            rows = np.nonzero(cand[r] & (vids != qid))[0]
            if rows.size == 0:
                continue
            sims = np.round(embn[rows] @ qnorm[r], 6)
            sel = np.lexsort((vids[rows], -sims))[:k]
            take = rows[sel]
            out_q.extend([qid] * len(take))
            out_v.extend(int(v) for v in vids[take])
            out_s.extend(sims[sel])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partial = emb_ds.map_batches(_bucket_score, batch_format="pyarrow",
                                 batch_size=4096)
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


@lru_cache(maxsize=8)
def _lsh_query_state(ref):
    return ray.get(ref)


# ------------------------------------------------------------------ IVF


def kmeans_fit(emb_ds, nlist: int, iters: int = 5, seed: int = 42,
               tol: float = 1e-6) -> np.ndarray:
    """Distributed Lloyd's k-means over the embedding column — the IVF
    coarse quantizer.  Per iteration: centroids broadcast once
    (ray.put), every batch computes one argmax-dot assignment + emits
    per-centroid (sum, count) PARTIALS (vectorized np.add.at), a tiny
    vectorized driver combine updates the centroids.  Iterations stop
    early once the max centroid movement drops below ``tol`` (saves
    whole dataset executions once assignments stabilize; deterministic
    for a given input).  No shuffle; driver traffic is
    O(nlist·dim·blocks).  Deterministic: seeded init from the dataset's
    first rows, cosine (normalized) geometry throughout."""
    first = emb_ds.limit(max(nlist * 4, 256)).to_pandas()
    mat = np.stack(first["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.Generator(np.random.PCG64(seed ^ 0xC0A3))
    pick = rng.choice(mat.shape[0], size=min(nlist, mat.shape[0]), replace=False)
    centroids = mat[np.sort(pick)]

    for _ in range(iters):
        ref = ray.put(centroids)

        def _partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)  # zero-copy numpy
            m = _embedding_matrix(batch)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=c.shape[0]).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                "vec_sum": pa.array([row.tolist() for row in sums],
                                    pa.list_(pa.float64())),
                "n": pa.array(cnt, pa.int64()),
            })

        pdf = emb_ds.map_batches(_partial, batch_format="pyarrow",
                                 batch_size=8192).to_pandas()
        cid = pdf["cid"].to_numpy(dtype=np.int64)
        stacked = np.stack(pdf["vec_sum"].to_numpy()).astype(np.float64)
        sums = np.zeros_like(centroids)
        np.add.at(sums, cid, stacked)
        cnt = np.zeros(centroids.shape[0], dtype=np.int64)
        np.add.at(cnt, cid, pdf["n"].to_numpy(dtype=np.int64))
        prev = centroids.copy()
        live = cnt > 0
        centroids[live] = sums[live] / cnt[live, None]
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
        if float(np.abs(centroids - prev).max(initial=0.0)) < tol:
            break
    return centroids


def ivf_topk(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5,
             nlist: int = 32, nprobe: int = 8, iters: int = 4,
             seed: int = 42):
    """IVF ANN: k-means coarse quantizer (kmeans_fit) + per-query probe
    of the ``nprobe`` nearest centroid cells.  Each batch assigns its
    vectors to cells with one argmax-dot, scores ONLY the vectors in a
    query's probed cells, and emits partial top-k; a tiny groupby merges
    (the same final merge as the brute/LSH arms, so tie-break semantics
    are identical).  Approximate by design; recall pinned by test."""
    qd = {int(i): np.asarray(v, dtype=np.float64) for i, v in query_vectors.items()}
    centroids = kmeans_fit(emb_ds, nlist, iters=iters, seed=seed)
    qids = np.array(sorted(qd), dtype=np.int64)
    qm = np.stack([qd[i] for i in qids])
    qnorm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # (nq, nlist) bool probe table, built once on the driver
    order = np.argsort(-(qnorm @ centroids.T), axis=1, kind="stable")
    probe = np.zeros((qids.size, centroids.shape[0]), dtype=bool)
    np.put_along_axis(probe, order[:, : min(nprobe, centroids.shape[0])],
                      True, axis=1)
    ref = ray.put((qids, qnorm, centroids, probe))

    def _score(batch: pa.Table) -> pa.Table:
        qids_, qnorm_, cents, probe_ = _lsh_query_state(ref)
        emb = _embedding_matrix(batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        norms = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        embn = emb / norms
        assign = np.argmax(embn @ cents.T, axis=1)  # (n,)
        cand = probe_[:, assign]  # (nq, n)
        out_q, out_v, out_s = [], [], []
        for r, qid in enumerate(qids_):
            rows = np.nonzero(cand[r] & (vids != qid))[0]
            if rows.size == 0:
                continue
            sims = np.round(embn[rows] @ qnorm_[r], 6)
            sel = np.lexsort((vids[rows], -sims))[:k]
            out_q.extend([int(qid)] * len(sel))
            out_v.extend(int(v) for v in vids[rows[sel]])
            out_s.extend(sims[sel])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partial = emb_ds.map_batches(_score, batch_format="pyarrow", batch_size=4096)
    return partial.groupby("query_id").map_groups(_final_topk(k), batch_format="pandas")


def semantic_dup_pairs(emb_ds, threshold: float, nlist: int = 32,
                       iters: int = 4, seed: int = 42,
                       id_col: str = "vec_id", tile: int = 2048):
    """SemDeDup-style semantic dedup (Abbas et al., arXiv 2303.09540):
    a k-means coarse quantizer (the IVF ``kmeans_fit``) buckets the
    corpus, then EXACT pairwise cosine runs within each cluster only —
    O(sum |c|^2) instead of O(n^2), the semantic-dedup production
    shape.  Precision is 1.0 by construction (within-cluster scoring is
    exact); the only misses are pairs straddling a cluster boundary, so
    recall is pinned by the planted-dup pytest against the exact grid.

    Scale notes: centroids broadcast once per execution (ray.put); the
    assignment pass is one argmax-dot per batch; the per-cluster pass
    is a groupby shuffle into ~nlist groups, each of which must fit a
    worker (|c| ~ n/nlist rows — pick nlist ~ sqrt(n) as SemDeDup
    does); the within-group matmul is tiled (``tile`` rows at a time)
    so the boolean hit matrix never exceeds tile x |c|."""
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    centroids = kmeans_fit(emb_ds, nlist, iters=iters, seed=seed)
    cref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)  # zero-copy numpy
        m = _embedding_matrix(batch)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cid = np.argmax(m @ c.T, axis=1).astype(np.int64)
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({
            "cid": pa.array(cid, pa.int64()),
            id_col: batch[id_col].cast(pa.int64()),
            "embedding": col,
        })

    def _cluster_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return schema.empty_table()
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _embedding_matrix(group)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        out_a, out_b = [], []
        for s in range(0, n, tile):
            sub = m[s:s + tile]
            hit = (sub @ m.T) >= threshold
            hit &= ids[s:s + tile, None] < ids[None, :]
            r, c = np.nonzero(hit)
            out_a.append(ids[s + r])
            out_b.append(ids[c])
        a = np.concatenate(out_a)
        if a.size == 0:
            return schema.empty_table()
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(np.concatenate(out_b), pa.int64())})

    return (
        emb_ds.map_batches(_assign, batch_format="pyarrow", batch_size=8192)
        .groupby("cid")
        .map_groups(_cluster_pairs, batch_format="pyarrow")
    )


def pq_fit(emb_ds, m: int = 8, ksub: int = 16, sample: int = 4096,
           iters: int = 8, seed: int = 42) -> np.ndarray:
    """Product-quantization codebooks (Jégou, Douze & Schmid, TPAMI
    2011): split the (normalized) vector into ``m`` subspaces and
    k-means each with ``ksub`` centroids.  Trained on a driver-side
    sample (the FAISS training discipline — codebook quality needs a
    sample, not the corpus; the corpus-wide passes stay distributed).
    Returns (m, ksub, d//m) float64 codebooks, deterministic in seed."""
    pdf = emb_ds.limit(int(sample)).to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in pdf["embedding"]])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n, d = mat.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), np.float64)
    for j in range(m):
        x = mat[:, j * dsub:(j + 1) * dsub]
        cents = x[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            # argmin ||x - c||^2 == argmax (x.c - |c|^2/2)
            assign = np.argmax(x @ cents.T - 0.5 * (cents * cents).sum(1),
                               axis=1)
            sums = np.zeros_like(cents)
            np.add.at(sums, assign, x)
            cnt = np.bincount(assign, minlength=ksub).astype(np.float64)
            nz = cnt > 0
            cents[nz] = sums[nz] / cnt[nz, None]
        books[j] = cents
    return books


@lru_cache(maxsize=8)
def _pq_state(ref):
    """Per-process cache: query ids, per-query ADC inner-product tables
    (nq, m, ksub), and the codebooks."""
    qids, qnorm, books = ray.get(ref)
    m, ksub, dsub = books.shape
    nq = qids.size
    tables = np.empty((nq, m, ksub), np.float64)
    for j in range(m):
        qsub = qnorm[:, j * dsub:(j + 1) * dsub]  # (nq, dsub)
        tables[:, j, :] = qsub @ books[j].T
    return qids, tables, books


def pq_topk(emb_ds, query_vectors: dict[int, np.ndarray], k: int = 5,
            m: int = 8, ksub: int = 32, rerank: int = 100,
            seed: int = 42, id_col: str = "vec_id"):
    """PQ ANN (ADC scan + exact re-rank) — the MEMORY-bounded scale
    path: each batch encodes its vectors to ``m`` uint8 codes (argmin
    per subspace) and scores every query with m table lookups per
    vector instead of d multiplies; per-batch top-``rerank`` approximate
    candidates merge on the driver (nq × rerank rows — tiny), and the
    winners are re-ranked EXACTLY through the sharded vector store, so
    the output ranking key (rounded cosine, id tie-break) is identical
    to the brute arm's.  Approximate by design (a true neighbor missing
    from every batch's top-rerank is lost); recall pinned by pytest."""
    qd = {int(i): np.asarray(v, dtype=np.float64) for i, v in query_vectors.items()}
    qids = np.array(sorted(qd), dtype=np.int64)
    qm = np.stack([qd[i] for i in qids])
    qnorm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    books = pq_fit(emb_ds, m=m, ksub=ksub, seed=seed)
    ref = ray.put((qids, qnorm, books))

    def _adc(batch: pa.Table) -> pa.Table:
        qids_, tables, books_ = _pq_state(ref)
        m_, ksub_, dsub = books_.shape
        emb = _embedding_matrix(batch)
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        embn = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12)
        n = embn.shape[0]
        approx = np.zeros((n, qids_.size), np.float64)
        for j in range(m_):
            x = embn[:, j * dsub:(j + 1) * dsub]
            codes = np.argmax(
                x @ books_[j].T - 0.5 * (books_[j] * books_[j]).sum(1),
                axis=1)
            approx += tables[:, j, codes].T  # (n, nq)
        out_q, out_v, out_s = [], [], []
        for r, qid in enumerate(qids_):
            mask = vids != qid
            rows = np.nonzero(mask)[0]
            if rows.size == 0:
                continue
            a = approx[rows, r]
            sel = np.lexsort((vids[rows], -a))[:rerank]
            out_q.extend([int(qid)] * len(sel))
            out_v.extend(int(v) for v in vids[rows[sel]])
            out_s.extend(a[sel])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_v, pa.int64()),
            "approx": pa.array(out_s, pa.float64()),
        })

    cand = emb_ds.map_batches(_adc, batch_format="pyarrow",
                              batch_size=4096).to_pandas()
    # global approximate top-rerank per query (driver-sized: nq x rerank)
    cand = (cand.sort_values(["query_id", "approx", "neighbor_id"],
                             ascending=[True, False, True])
            .groupby("query_id").head(rerank))
    bounds, shard_refs, _ = build_vec_store(emb_ds, id_col=id_col)
    look = _ShardedVecLookup(ray.put((bounds, shard_refs)))
    vecs, ok = look.gather(cand["neighbor_id"].to_numpy(dtype=np.int64))
    cand = cand[ok].reset_index(drop=True)
    vecs = vecs[ok]
    vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    qrow = {int(q): i for i, q in enumerate(qids)}
    qidx = cand["query_id"].map(qrow).to_numpy(dtype=np.int64)
    cand["sim"] = np.round((vecs * qnorm[qidx]).sum(axis=1), 6)
    out = (cand.sort_values(["query_id", "sim", "neighbor_id"],
                            ascending=[True, False, True])
           .groupby("query_id").head(k))
    return out[["query_id", "neighbor_id"]].reset_index(drop=True)
