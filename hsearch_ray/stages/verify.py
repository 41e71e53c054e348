"""Exact verification of candidate pairs.

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
  3. Parallel remote tasks assemble id-range SHARDS of the store
     (ids, starts, lens, values per shard) — the driver never touches
     shingle bytes, and numpy buffers are ZERO-COPY on ray.get, so all
     verify tasks on a node share the same memory.
  4. Verify tasks route lookups by shard bounds + searchsorted and
     compute exact Jaccard with a sorted-array intersection (no
     re-sort).  Stateless warm-worker tasks: per-task store access is a
     local object-store lookup.
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


def _in_sorted(sorted_ids: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Membership of x in a SORTED id array via searchsorted — np.isin
    would re-sort the (large) id array on every batch."""
    if sorted_ids.size == 0:
        return np.zeros(x.size, dtype=bool)
    pos = np.searchsorted(sorted_ids, x)
    pos = np.minimum(pos, sorted_ids.size - 1)
    return sorted_ids[pos] == x


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
    """Exact-Jaccard verifier over the SHARDED zero-copy shingle store.

    Each shard is (ids_sorted, starts, lens, values): per-file segments
    point into ``values`` wherever the distributed shingle pass placed
    them (start/len indirection — assembly never reorders bytes).
    Lookups route by shard bounds, then searchsorted within the shard.

    Shards are fetched LAZILY — a task ``ray.get``s only the shards its
    batch actually references (cached per verifier).  Candidate pairs
    arrive sorted by ``a`` (distinct_pairs sorts them), so the a-side of
    a batch spans <= 2 shards; on a multi-node cluster each node ends up
    caching the a-range it processes plus the b-shards those pairs touch,
    instead of replicating the full store everywhere (the round-1 scale
    concern)."""

    def __init__(self, cfg: PipelineConfig, store_ref):
        self.cfg = cfg
        bounds, shard_refs = ray.get(store_ref)
        self.bounds = bounds
        self.shard_refs = shard_refs
        self._shards: dict[int, tuple] = {}  # lazily fetched, zero-copy

    def _shard(self, s: int):
        t = self._shards.get(s)
        if t is None:
            t = self._shards[s] = ray.get(self.shard_refs[s])
        return t

    def _locate(self, x: np.ndarray):
        """(shard_idx, pos_in_shard, found, sizes) for an id array."""
        shard_idx = np.searchsorted(self.bounds, x, side="right")
        pos = np.zeros(x.size, dtype=np.int64)
        found = np.zeros(x.size, dtype=bool)
        sizes = np.zeros(x.size, dtype=np.int64)
        for s in np.unique(shard_idx):
            ids_s, _, lens_s, _ = self._shard(s)
            rows = np.nonzero(shard_idx == s)[0]
            if ids_s.size == 0:
                continue
            p = np.searchsorted(ids_s, x[rows])
            pc = np.minimum(p, ids_s.size - 1)
            ok = ids_s[pc] == x[rows]
            pos[rows] = pc
            found[rows] = ok
            sizes[rows] = np.where(ok, lens_s[pc], 0)
        return shard_idx, pos, found, sizes

    def _slice(self, shard: int, pos: int) -> np.ndarray:
        _, starts, lens, vals = self._shard(shard)
        s = starts[pos]
        return vals[s : s + lens[pos]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        thr = self.cfg.jaccard_threshold
        # with the edit tier on, pairs just below threshold are kept as
        # "borderline" for the second-tier token check (F12/F13 analog)
        thr_lo = thr - self.cfg.edit_band if self.cfg.edit_verify else thr
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        sa_idx, pa_pos, a_ok, na = self._locate(a)
        sb_idx, pb_pos, b_ok, nb = self._locate(b)
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        # size-ratio bound: attainable Jaccard <= |small|/|big|
        candidates = np.nonzero(a_ok & b_ok & (lo > 0) & (lo >= thr_lo * hi))[0]
        out_a, out_b, out_j, out_m = [], [], [], []
        for i in candidates:
            sa = self._slice(sa_idx[i], pa_pos[i])
            sb = self._slice(sb_idx[i], pb_pos[i])
            inter = H.intersect_count(sa, sb)
            union = sa.size + sb.size - inter
            j = inter / union if union else 0.0
            if j >= thr_lo:
                out_a.append(int(a[i]))
                out_b.append(int(b[i]))
                out_j.append(j)
                out_m.append("minhash_lsh" if j >= thr else "borderline")
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
                "method": pa.array(out_m, pa.string()),
            }
        )


def shingle_lists(corpus_ds, ids: np.ndarray, cfg: PipelineConfig):
    """Distributed (file_id, sh: list<int64>) shingle sets for the
    candidate files — the join-side input of verify_pairs."""
    ids_ref = ray.put(np.sort(ids))
    k = cfg.shingle_k
    canon = cfg.token_canonicalize

    def _shingle(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        mask = _in_sorted(ray.get(ids_ref), fid)
        sub = batch.filter(pa.array(mask))
        out_f = sub["file_id"].to_numpy(zero_copy_only=False)
        contents = sub["content"].cast(pa.large_binary()).to_pylist()
        arrs = [
            H.shingle_hashes(H.normalize_for_shingles(c, canon), k).view(np.int64)
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
    units (bytes / 8).  ZERO-COPY: single-chunk columns view the chunk
    directly — combine_chunks would copy the whole payload, and holding
    views into per-block copies was measured to stall shard assembly by
    an order of magnitude (allocator pressure from GBs of live copies)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    byte_offsets = np.frombuffer(
        col.buffers()[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
    )
    data_buf = col.buffers()[2]
    values = (
        np.frombuffer(data_buf, dtype=np.uint64) if data_buf is not None and len(data_buf) else np.empty(0, np.uint64)
    )
    return (byte_offsets // 8).astype(np.int64), values


def _gather_ranges(val: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Copy the concatenation of val[starts[i] : starts[i]+lens[i]] into
    ONE owned array with a single fancy-index gather (no per-row loop,
    no lingering views into the source buffer)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=val.dtype)
    prefix = np.concatenate(([0], np.cumsum(lens[:-1])))
    idx = np.repeat(starts - prefix, lens) + np.arange(total, dtype=np.int64)
    return val[idx]


@ray.remote
def _assemble_shard(lo: int, hi: int, *blocks):
    """Assemble one id-range shard of the shingle store from the
    materialized shingle_lists blocks.  Reads are zero-copy from the
    local object store; only this shard's values are copied.  The return
    value lands in plasma automatically (it IS the shard object)."""
    fid_parts, val_parts, len_parts = [], [], []
    for tbl in blocks:
        if tbl.num_rows == 0:
            continue
        fid = tbl["file_id"].to_numpy(zero_copy_only=False)
        mask = (fid >= lo) & (fid < hi)
        if not mask.any():
            continue
        off, val = _list_views(tbl["sh"])  # zero-copy views of the block
        sel = np.nonzero(mask)[0]
        lens_sel = (off[sel + 1] - off[sel]).astype(np.int64)
        fid_parts.append(fid[sel])
        len_parts.append(lens_sel)
        # one vectorized gather per block; the result OWNS its memory, so
        # no view pins the (plasma) block past this iteration
        val_parts.append(_gather_ranges(val, off[sel], lens_sel))
    if not fid_parts:
        e = np.empty(0, dtype=np.int64)
        return (e, e, e, np.empty(0, np.uint64))
    fid = np.concatenate(fid_parts)
    lens = np.concatenate(len_parts)
    vals = np.concatenate(val_parts) if val_parts else np.empty(0, np.uint64)
    starts = np.zeros(fid.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    order = np.argsort(fid, kind="stable")
    return (fid[order], starts[:-1][order], lens[order], vals)


def build_store(corpus_ds, ids: np.ndarray, cfg: PipelineConfig,
                num_shards: int | None = None):
    """Sharded zero-copy shingle store: the distributed shingle pass is
    materialized, then ``num_shards`` remote tasks each assemble one
    id-range shard IN PARALLEL — the driver never touches shingle bytes.
    Returns (shard_bounds: np.ndarray, shard_refs: list[ObjectRef]).
    On a multi-node cluster the same layout lets each node cache only
    the shards its pair partitions touch."""
    import ray as _ray

    if num_shards is None:
        num_shards = max(4, int(_ray.cluster_resources().get("CPU", 8)) // 2)
    sh_ds = shingle_lists(corpus_ds, ids, cfg).materialize()
    block_refs = [ref for ref in sh_ds.to_arrow_refs()]
    ids_sorted = np.sort(ids)
    cut = np.linspace(0, ids_sorted.size, num_shards + 1).astype(np.int64)[1:-1]
    bounds = np.concatenate(
        ([np.iinfo(np.int64).min], ids_sorted[cut], [np.iinfo(np.int64).max])
    )
    shard_refs = [
        _assemble_shard.remote(int(bounds[s]), int(bounds[s + 1]), *block_refs)
        for s in range(num_shards)
    ]
    return ray.put((bounds[1:-1], shard_refs))


_TOKEN_RE = None  # compiled lazily in workers (module import cost discipline)


def token_bag_similarity(a: bytes, b: bytes) -> float:
    """Order-insensitive token-multiset Dice similarity
    2·|A ∩ B| / (|A| + |B|) over word/punct tokens.

    The F12/F13/A11 analog: the reference verifies borderline hits with
    banded seed-extend alignment and then combines up to 5 NON-COLLINEAR
    HSPs into one score (hash_search.cpp:718-948, SumEvalue
    hash_search.cpp:1199-1273) — i.e. it, too, credits matching segments
    regardless of their order in the file.  A token multiset score is
    the bag-limit of that idea: 'same code, reordered functions' scores
    ~1.0 where shingle Jaccard drops below threshold."""
    import re
    from collections import Counter

    global _TOKEN_RE
    if _TOKEN_RE is None:
        _TOKEN_RE = re.compile(rb"\w+|[^\w\s]")
    ta = Counter(_TOKEN_RE.findall(a))
    tb = Counter(_TOKEN_RE.findall(b))
    na, nb = sum(ta.values()), sum(tb.values())
    if na + nb == 0:
        return 1.0
    inter = sum((ta & tb).values())
    return 2.0 * inter / (na + nb)


def edit_verify_pairs(borderline_ds, corpus_ds, cfg: PipelineConfig):
    """Second-tier check for pairs whose exact Jaccard landed in
    [thr - edit_band, thr): fetch ONLY those files' contents (broadcast —
    borderline pairs are a narrow band by construction), score with
    token_bag_similarity, admit >= edit_sim_threshold as method="edit"
    (the score is reported in the ``jaccard`` column)."""
    ids = candidate_ids(borderline_ds)
    if ids.size == 0:
        return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())
    ids_ref = ray.put(np.sort(ids))
    canon = cfg.token_canonicalize

    def _grab(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(_in_sorted(ray.get(ids_ref), fid)))
        return pa.table({"file_id": sub["file_id"].cast(pa.int64()),
                         "content": sub["content"].cast(pa.large_binary())})

    cont = corpus_ds.map_batches(_grab, batch_format="pyarrow").to_pandas()
    cmap = {int(f): bytes(c) for f, c in zip(cont["file_id"], cont["content"])}
    cmap_ref = ray.put(cmap)
    thr = cfg.edit_sim_threshold

    def _score(batch: pa.Table) -> pa.Table:
        cm = ray.get(cmap_ref)
        oa, ob, os_ = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            ca, cb = cm.get(int(a)), cm.get(int(b))
            if ca is None or cb is None:
                continue
            from hsearch_ray import hashing as _H

            s = token_bag_similarity(
                _H.normalize_for_shingles(ca, canon),
                _H.normalize_for_shingles(cb, canon),
            )
            if s >= thr:
                oa.append(int(a))
                ob.append(int(b))
                os_.append(round(s, 6))
        return pa.table(
            {
                "a": pa.array(oa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "jaccard": pa.array(os_, pa.float64()),
                "method": pa.array(["edit"] * len(oa), pa.string()),
            }
        )

    return borderline_ds.map_batches(_score, batch_format="pyarrow",
                                     batch_size=cfg.verify_batch_size)


def _split_by_method(ds, method: str):
    import pyarrow.compute as pc

    def _keep(batch: pa.Table, want: str = method) -> pa.Table:
        return batch.filter(pc.equal(batch["method"], want))

    return ds.map_batches(_keep, batch_format="pyarrow")


def verify_pairs(pairs_ds, corpus_ds, cfg: PipelineConfig,
                 ids: np.ndarray | None = None):
    """candidate pairs + corpus -> verified pairs Dataset (a,b,jaccard,method).

    The shingle store is built by a distributed pass and shared zero-copy
    through the object store (each pair row carries only two int64 ids —
    a hash-join alternative would duplicate an ~O(shingles) payload onto
    every pair row, which explodes exactly when there are many dups).
    With ``cfg.edit_verify``, pairs in the borderline Jaccard band get
    the token-similarity second tier and may be admitted as
    method="edit".  ``ids`` (the distinct file ids of the pair table)
    can be passed by callers that already collected them (the candidate
    scan emits them for free) to skip an extra pass here.
    """
    if ids is None:
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

    verified = pairs_ds.map_batches(
        _verify_task,
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
    )
    if not cfg.edit_verify:
        return verified
    verified = verified.materialize()
    accepted = _split_by_method(verified, "minhash_lsh")
    borderline = _split_by_method(verified, "borderline")
    return accepted.union(edit_verify_pairs(borderline, corpus_ds, cfg))
