"""Exact verification of candidate pairs.

Analog of the reference's exact within-bucket check — Euclidean
distance <= R in /root/reference/hclust/src/hclust/kmer_search.cpp:107-111
and the seed-extend alignment verdict in
pcluster/src/pcluster/hash_search.cpp:593-599 — replaced by exact
Jaccard over the full shingle sets (shingle *strings* are never
materialized; SURVEY.md §4 memory rule).

Data movement plan:
  1. Candidate ids (a ∪ b, distinct) arrive from the candidate scan —
     small by construction (candidates << corpus).  At 10^12-file scale
     this becomes a Bloom filter; semantics are identical.
  2. Parallel remote tasks each scan the materialized corpus blocks and
     build one id-range SHARD of the store directly: filter to the
     shard's candidates, shingle (the per-bucket index build of the
     reference, hash_search.cpp:164-261, done once per file instead of
     once per bucket), pack as (ids, starts, lens, values).  The driver
     never touches shingle bytes; no intermediate shingle Dataset is
     materialized; numpy buffers are ZERO-COPY on ray.get, so all
     verify tasks on a node share the same memory.
  3. Verify tasks fetch LAZILY only the shards their batch references,
     route lookups by shard bounds + searchsorted, and compute exact
     Jaccard with a sorted-array intersection (no re-sort).  Stateless
     warm-worker tasks: per-task store access is a local object-store
     lookup.
"""

from __future__ import annotations

import functools

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


def _concat_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Indices of the concatenation of ranges [starts[i], starts[i]+lens[i])
    — fully vectorized (the standard ones+cumsum trick).  Zero-length
    ranges are skipped (callers pass matching starts/lens pairs to both
    source and destination, so correspondence is preserved)."""
    nz = lens > 0
    if not nz.all():
        starts, lens = starts[nz], lens[nz]
    if starts.size == 0:
        return np.empty(0, np.int64)
    out = np.ones(int(lens.sum()), dtype=np.int64)
    out[0] = starts[0]
    if starts.size > 1:
        ends = np.cumsum(lens)[:-1]
        out[ends] = starts[1:] - (starts[:-1] + lens[:-1]) + 1
    return np.cumsum(out)


def _segmented_sketch(vals: np.ndarray, lens: np.ndarray, seed: int,
                      chunk_shingles: int = 8 << 20) -> np.ndarray:
    """Per-doc 64-bit OPH minwise sketch (hashing.oph_sketch64) over a
    packed segment layout (``lens[i]`` consecutive SORTED-unique shingles
    per doc, concatenated in ``vals``).  Zero-length docs sketch to 0
    (the OPH kernel requires non-empty docs, so only docs with shingles
    are hashed and scattered).  Computed in bounded chunks: the OPH
    kernel's temporaries are ~32 B/shingle, so one whole-shard call over
    a multi-GB shard would double its memory."""
    out = np.zeros(lens.size, np.uint64)
    nz = np.nonzero(lens > 0)[0]
    if nz.size == 0:
        return out
    lens_nz = lens[nz]
    offs = np.zeros(lens_nz.size, dtype=np.int64)
    np.cumsum(lens_nz[:-1], out=offs[1:])
    total = int(lens_nz.sum())
    i = 0
    while i < nz.size:
        start = int(offs[i])
        j = max(int(np.searchsorted(offs, start + chunk_shingles)), i + 1)
        end = int(offs[j]) if j < nz.size else total
        out[nz[i:j]] = H.oph_sketch64(vals[start:end], offs[i:j] - start, seed)
        i = j
    return out


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
        import collections

        self.cfg = cfg
        bounds, shard_refs = ray.get(store_ref)
        self.bounds = bounds
        self.shard_refs = shard_refs
        # Bounded LRU of mapped shards: a zero-copy view PINS its plasma
        # object, so an unbounded map makes every worker pin the whole
        # store (unevictable — the 30.72M-file raylet spill crash).  The
        # cap bounds the pinned set; evicted shards stay in the object
        # store (or spill) and re-map on next touch — cheap when access
        # is shard-coherent (verify_pairs' block-local pair reorder).
        self._cap = int(getattr(cfg, "verify_shard_cache", 0) or 0)
        self._shards: "collections.OrderedDict[int, tuple]" = \
            collections.OrderedDict()
        self._sketches: dict[int, np.ndarray] = {}  # per-shard, on demand

    def _shard(self, s: int):
        t = self._shards.get(s)
        if t is None:
            t = self._shards[s] = ray.get(self.shard_refs[s])
            if self._cap and len(self._shards) > self._cap:
                old, _ = self._shards.popitem(last=False)
                # the sketch array views shard element 5 — drop together
                self._sketches.pop(old, None)
        else:
            self._shards.move_to_end(s)
        return t

    def _locate(self, x: np.ndarray):
        """(shard_idx, pos_in_shard, found, sizes) for an id array."""
        shard_idx = np.searchsorted(self.bounds, x, side="right")
        pos = np.zeros(x.size, dtype=np.int64)
        found = np.zeros(x.size, dtype=bool)
        sizes = np.zeros(x.size, dtype=np.int64)
        for s in np.unique(shard_idx):
            ids_s, _, lens_s = self._shard(s)[:3]
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
        _, starts, lens, vals = self._shard(shard)[:4]
        s = starts[pos]
        return vals[s : s + lens[pos]]

    def _shard_sketch(self, s: int) -> np.ndarray:
        """Per-file 64-bit OPH minwise sketch of every document in shard
        ``s`` (hashing.oph_sketch64 over the stored shingle sets).

        Normally PRECOMPUTED at store-build time (shard element 5,
        ``_build_shard`` with ``with_sketch``) — once per doc globally —
        and just indexed here.  The lazy per-verifier compute below is
        the fallback for stores built without the prefilter flag."""
        sh = self._sketches.get(s)
        if sh is None:
            t = self._shard(s)
            if len(t) >= 5 and t[4] is not None:
                self._sketches[s] = t[4]
                return t[4]
            ids_s, starts, lens, vals = t[:4]
            # segments live wherever the build pass placed them, so gather
            # into packed layout first; zero-shingle docs keep sketch 0
            # (the OPH kernel requires non-empty docs)
            gathered = vals[_concat_ranges(starts, lens)]
            sh = _segmented_sketch(gathered, lens, self.cfg.seed)
            self._sketches[s] = sh
        return sh

    def _gather_sketch(self, shard_idx: np.ndarray, pos: np.ndarray,
                       rows: np.ndarray) -> np.ndarray:
        out = np.zeros(rows.size, dtype=np.uint64)
        sub = shard_idx[rows]
        for s in np.unique(sub):
            sh = self._shard_sketch(int(s))
            m = np.nonzero(sub == s)[0]
            if sh.size:
                out[m] = sh[pos[rows[m]]]
        return out

    def _pair_intersections(self, rows: np.ndarray,
                            sa_idx, pa_pos, sb_idx, pb_pos,
                            na, nb) -> np.ndarray:
        """|A ∩ B| for every candidate pair row of a batch.

        Physical plan — MEASURED, not assumed: a "fully vectorized"
        gather-then-merge (concatenate both sides' segments per chunk,
        one searchsorted pass over (pair, value) keys) was built and
        microbenchmarked against this loop at segment sizes 32..2500 and
        lost 5-20x at EVERY size — gathering both sides costs more
        memory traffic than a per-pair ``searchsorted(small -> big)``
        that reads small·log(big) cache-resident shard locations and
        copies nothing.  So the batch API stays (vectorized locate,
        prefilter and output assembly) and the intersection core is a
        tight loop of two zero-copy slices + one C searchsorted per
        pair, with shard tuples hoisted out of the loop."""
        inter = np.empty(rows.size, dtype=np.int64)
        sa_l, pa_l = sa_idx[rows], pa_pos[rows]
        sb_l, pb_l = sb_idx[rows], pb_pos[rows]
        shards = {int(s): self._shard(int(s))
                  for s in np.unique(np.concatenate([sa_l, sb_l]))}
        for i in range(rows.size):
            _, stA, lnA, vsA = shards[int(sa_l[i])][:4]
            _, stB, lnB, vsB = shards[int(sb_l[i])][:4]
            p = pa_l[i]
            a = vsA[stA[p]:stA[p] + lnA[p]]
            p = pb_l[i]
            b = vsB[stB[p]:stB[p] + lnB[p]]
            inter[i] = H.intersect_count(a, b)
        return inter

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
        keep = a_ok & b_ok & (lo > 0) & (lo >= thr_lo * hi)
        candidates = np.nonzero(keep)[0]
        if candidates.size and self.cfg.use_sketch_prefilter:
            # cheap precision lever (the reference's two-tier cheap-then-
            # exact verify, pcluster.cpp:34 -> hash_search.cpp:593-599):
            # pairs whose 64-bit b-bit-minhash sketches differ by more
            # than prefilter_hamming bits skip exact Jaccard entirely.
            # Lossy by design; off by default for recall.
            ha = self._gather_sketch(sa_idx, pa_pos, candidates)
            hb = self._gather_sketch(sb_idx, pb_pos, candidates)
            near = H.hamming64(ha, hb) <= self.cfg.prefilter_hamming
            candidates = candidates[near]
        if candidates.size == 0:
            return VERIFIED_SCHEMA.empty_table()
        inter = self._pair_intersections(
            candidates, sa_idx, pa_pos, sb_idx, pb_pos, na, nb
        )
        union = na[candidates] + nb[candidates] - inter
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        adm = j >= thr_lo
        sel = candidates[adm]
        return pa.table(
            {
                "a": pa.array(a[sel], pa.int64()),
                "b": pa.array(b[sel], pa.int64()),
                "jaccard": pa.array(j[adm], pa.float64()),
                "method": pa.array(
                    np.where(j[adm] >= thr, "minhash_lsh", "borderline")
                ),
            }
        )


@functools.lru_cache(maxsize=8)
def _cached_verifier(store_ref, cfg: PipelineConfig) -> Verifier:
    """Per-process Verifier cache keyed by (store ref, config) — the
    same discipline as lsh._kv_lookup: stateless warm-worker tasks share
    one Verifier per store, so its lazily-fetched shards and per-shard
    sketch prefilter cache persist across batches (a fresh Verifier per
    batch made the prefilter recompute whole-shard sketches per batch).
    PipelineConfig is a frozen dataclass, hence hashable."""
    return Verifier(cfg, store_ref)


# --------------------------------------------------------------- Bloom filter
#
# Above ``bloom_above`` candidate ids, the per-shard membership filter
# ships as a Bloom bitmap (~64x smaller than the sorted id array a
# multi-node cluster would otherwise replicate per node).  False
# positives only shingle a few extra files into the store — the
# Verifier looks up exclusively true candidate ids, so results are
# bit-identical to the exact-id path (equivalence pinned by test).

_BLOOM_K = 4
_BLOOM_SEEDS = (0x243F6A8885A308D3, 0x13198A2E03707344,
                0xA4093822299F31D0, 0x082EFA98EC4E6C89)


def _bloom_positions(ids: np.ndarray, m_bits: int, s: int) -> np.ndarray:
    h = H.splitmix64(ids.astype(np.uint64) ^ np.uint64(_BLOOM_SEEDS[s]))
    return (h % np.uint64(m_bits)).astype(np.int64)


def bloom_build(ids: np.ndarray, bits_per_id: int = 16) -> np.ndarray:
    """uint8 bitmap Bloom filter over an int64 id array (k=4 probes;
    ~0.2% false-positive rate at 16 bits/id)."""
    m_bits = 1 << max(10, int(np.ceil(np.log2(max(1, ids.size) * bits_per_id))))
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for s in range(_BLOOM_K):
        pos = _bloom_positions(ids, m_bits, s)
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitmap


def bloom_contains(bitmap: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized membership probe; true for every inserted id, rarely
    true for others (false positives)."""
    m_bits = bitmap.size * 8
    ok = np.ones(ids.size, dtype=bool)
    for s in range(_BLOOM_K):
        pos = _bloom_positions(ids, m_bits, s)
        ok &= ((bitmap[pos >> 3] >> (pos & 7)) & 1).astype(bool)
    return ok


@ray.remote
def _build_shard(lo: int, hi: int, id_filter, k: int, canon: bool,
                 with_sketch: bool, seed: int, blocks):
    """Build one id-range shard of the shingle store DIRECTLY from the
    materialized corpus blocks: filter to this shard's candidate rows,
    shingle their contents, pack (ids, starts, lens, values[, sketch]).

    With ``with_sketch`` (cfg.use_sketch_prefilter), the per-doc 64-bit
    OPH minwise sketch of the stored shingle set is computed HERE, once
    per doc globally, and shipped as the 5th shard element — verify
    workers index it instead of each recomputing whole-shard sketches
    (a per-worker lazy compute was measured to stall the 1.92M-file
    verify stage for minutes: up to workers x shards redundant passes).
    The sketch is b-bit minwise hashing, NOT SimHash: SimHash bit votes
    were measured 180x more expensive to build (4.5 µs vs 25 ns per
    shingle) for the same prefilter power at these thresholds.

    Each candidate file belongs to exactly one shard, so total shingle
    work equals one corpus pass — but no intermediate shingle Dataset
    ever exists (a prior design materialized ~8 bytes per corpus byte of
    packed shingles before assembly, which pushed the object store into
    spill exactly at the scale the store was meant to serve)."""
    kind, payload = id_filter
    if kind == "exact":
        # pre-slice the shared sorted id array to THIS shard's range:
        # membership probes then hit a cache-resident slice instead of
        # random-accessing the full array per block (profiled at 55% of
        # shard-build time on a 1.25M-candidate corpus)
        payload = payload[np.searchsorted(payload, lo):
                          np.searchsorted(payload, hi)]
    fid_parts, len_parts, val_parts = [], [], []
    # blocks arrive as a LIST of ObjectRefs (not unpacked task args):
    # Ray then pins only the block being processed, not the whole
    # corpus per builder — at 61.44M files, N concurrent builders each
    # pinning every normalized block held the full corpus unevictable
    # in plasma and the kernel OOM-killed the builders (the envelope
    # failure this fixes).  Each ref is fetched, scanned, and released
    # so the store can evict/spill it behind the scan.
    for ref in blocks:
        tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if tbl.num_rows == 0:
            continue
        fid = tbl["file_id"].to_numpy(zero_copy_only=False)
        mask = (fid >= lo) & (fid < hi)
        if mask.any():
            # probe only the rows already inside the range
            rows = np.nonzero(mask)[0]
            ok = (bloom_contains(payload, fid[rows]) if kind == "bloom"
                  else _in_sorted(payload, fid[rows]))
            mask = np.zeros(fid.size, dtype=bool)
            mask[rows[ok]] = True
        if not mask.any():
            continue
        sel = np.nonzero(mask)[0]
        # batched concatenated-buffer kernel (signatures.batched_streams)
        # — the store build pays the same one-pass cost as signing, not
        # a per-doc python/hash round-trip
        from hsearch_ray.stages.signatures import batched_streams

        streams = batched_streams(tbl.filter(pa.array(mask))["content"], k, canon)
        arrs = [np.unique(s) for s in streams]
        fid_parts.append(fid[sel])
        len_parts.append(np.array([a.size for a in arrs], dtype=np.int64))
        val_parts.append(
            np.concatenate(arrs) if arrs else np.empty(0, np.uint64)
        )
    if not fid_parts:
        e = np.empty(0, dtype=np.int64)
        return (e, e, e, np.empty(0, np.uint64),
                np.empty(0, np.uint64) if with_sketch else None)
    fid = np.concatenate(fid_parts)
    lens = np.concatenate(len_parts)
    vals = np.concatenate(val_parts)
    starts = np.zeros(fid.size + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    order = np.argsort(fid, kind="stable")
    sh = _segmented_sketch(vals, lens, seed)[order] if with_sketch else None
    return (fid[order], starts[:-1][order], lens[order], vals, sh)


def build_store(corpus_ds, ids: np.ndarray, cfg: PipelineConfig,
                num_shards: int | None = None,
                bloom_above: int = 32_000_000):
    """Sharded zero-copy shingle store: ``num_shards`` remote tasks each
    scan the materialized corpus blocks and build one id-range shard
    (filter -> shingle -> pack) IN PARALLEL — the driver never touches
    shingle bytes, and no intermediate shingle Dataset is materialized
    (each candidate file is shingled exactly once, in its shard's task).
    The shard layout (ids, starts, lens, values) is the reference's
    concatenated store + offsets (protein.hpp:14-39) as numpy arrays.
    Returns a ref to (shard_bounds, shard_refs).  On a multi-node
    cluster the same layout lets each node cache only the shards its
    pair partitions touch."""
    import ray as _ray

    if num_shards is None:
        # scale with the CANDIDATE COUNT, not just cluster width: a
        # fixed per-CPU count makes per-shard memory O(corpus), and at
        # 61M files the shard builders are what the kernel OOM-kills
        # (measured: 16 `_build_shard` kills on a 125 GiB node).  The
        # ids-per-shard ceiling bounds one shard's packed arrays to a
        # few hundred MB regardless of corpus size; Ray's scheduler
        # already bounds CONCURRENT builders to the CPU count.
        from hsearch_ray.stages.agg import default_num_shards

        num_shards = default_num_shards(ids.size, 262_144)
    corpus_ds = corpus_ds.materialize()  # no-op when already materialized
    block_refs = [ref for ref in corpus_ds.to_arrow_refs()]
    ids_sorted = np.sort(ids)
    if ids_sorted.size > bloom_above:
        # ship a Bloom bitmap (~bits_per_id/8 bytes per id) instead of
        # the full 8B/id sorted array; bloom-positive non-candidates are
        # harmlessly over-included in the store
        filt_ref = ray.put(("bloom", bloom_build(ids_sorted)))
    else:
        filt_ref = ray.put(("exact", ids_sorted))
    cut = np.linspace(0, ids_sorted.size, num_shards + 1).astype(np.int64)[1:-1]
    bounds = np.concatenate(
        ([np.iinfo(np.int64).min], ids_sorted[cut], [np.iinfo(np.int64).max])
    )
    shard_refs = [
        _build_shard.remote(int(bounds[s]), int(bounds[s + 1]), filt_ref,
                            cfg.shingle_k, cfg.token_canonicalize,
                            cfg.use_sketch_prefilter, cfg.seed, block_refs)
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


_EDIT_TOKS_SCHEMA = pa.schema(
    [("file_id", pa.int64()), ("toks", pa.list_(pa.int64()))]
)


def build_edit_token_store(corpus_ds, ids: np.ndarray, canon: bool):
    """Id-range-sharded store of per-doc SORTED token-hash MULTISETS
    (the ``setjoin.build_set_store`` layout, duplicates kept) over the
    candidate files only: each doc is normalized and tokenized exactly
    ONCE at store build, then the scorer fetches ≤ 2 shards lazily per
    batch — the whole-corpus driver dict this replaces was the last
    driver-bound attach in the engine.  Token hashes are 64-bit
    (polars binary hash, seed 42); a collision perturbs the Dice score
    by ~1/n_tokens with probability ~n²/2⁶⁴ — immaterial next to the
    0.05-wide admission band."""
    from hsearch_ray.stages.setjoin import build_set_store

    ids_ref = ray.put(np.sort(ids))

    def _toks(batch: pa.Table) -> pa.Table:
        import polars as pl

        from hsearch_ray import hashing as _H

        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(_in_sorted(ray.get(ids_ref), fid)))
        if sub.num_rows == 0:
            return _EDIT_TOKS_SCHEMA.empty_table()
        global _TOKEN_RE
        if _TOKEN_RE is None:
            import re

            _TOKEN_RE = re.compile(rb"\w+|[^\w\s]")
        sids = sub["file_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        per_doc = [
            _TOKEN_RE.findall(_H.normalize_for_shingles(c, canon))
            for c in sub["content"].cast(pa.large_binary()).to_pylist()
        ]
        lens = np.array([len(t) for t in per_doc], dtype=np.int64)
        flat = [t for doc in per_doc for t in doc]
        if flat:
            h = pl.Series(flat, dtype=pl.Binary).hash(seed=42) \
                .to_numpy().view(np.int64)
        else:
            h = np.empty(0, np.int64)
        docrep = np.repeat(np.arange(sids.size, dtype=np.int64), lens)
        order = np.lexsort((h, docrep))  # per-doc sorted, multiplicity kept
        offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
        return pa.table({
            "file_id": pa.array(sids, pa.int64()),
            "toks": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int64()), pa.array(h[order], pa.int64())
            ),
        })

    tok_ds = corpus_ds.map_batches(_toks, batch_format="pyarrow")
    return build_set_store(tok_ds)


def _multiset_dice(sa: np.ndarray, sb: np.ndarray) -> float:
    """2·|A ∩ B| / (|A| + |B|) over two per-doc SORTED hash multisets
    (the token_bag_similarity value, computed on pre-hashed tokens)."""
    if sa.size + sb.size == 0:
        return 1.0
    ua, ca = np.unique(sa, return_counts=True)
    ub, cb = np.unique(sb, return_counts=True)
    _, ia, ib = np.intersect1d(ua, ub, assume_unique=True,
                               return_indices=True)
    inter = int(np.minimum(ca[ia], cb[ib]).sum())
    return 2.0 * inter / (sa.size + sb.size)


def edit_verify_pairs(borderline_ds, corpus_ds, cfg: PipelineConfig):
    """Second-tier check for pairs whose exact Jaccard landed in
    [thr - edit_band, thr): score with the token-multiset Dice
    (token_bag_similarity's value), admit >= edit_sim_threshold as
    method="edit" (the score is reported in the ``jaccard`` column).

    Scale shape: candidate contents live in an id-range-SHARDED
    token-multiset store (build_edit_token_store); the scorer memoizes
    each doc's (unique, counts) per batch, so a doc in p pairs is
    tokenized once per corpus and unpacked once per batch — no driver
    dict, no per-pair re-normalization."""
    from hsearch_ray.stages.setjoin import _set_lookup

    ids = candidate_ids(borderline_ds)
    if ids.size == 0:
        return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())
    store_ref = build_edit_token_store(
        corpus_ds, ids, cfg.token_canonicalize)
    thr = cfg.edit_sim_threshold

    def _score(batch: pa.Table) -> pa.Table:
        lk = _set_lookup(store_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        sha, posa = lk.slices(a)
        shb, posb = lk.slices(b)
        memo: dict = {}

        def bag(fid: int, sh: int, pos: int):
            t = memo.get(fid)
            if t is None:
                sl = lk.get(sh, pos)
                u, c = np.unique(sl, return_counts=True)
                t = memo[fid] = (u, c, sl.size)
            return t

        oa, ob, os_ = [], [], []
        for i in range(a.size):
            if posa[i] < 0 or posb[i] < 0:
                continue
            ua, ca, na = bag(int(a[i]), int(sha[i]), int(posa[i]))
            ub, cb, nb = bag(int(b[i]), int(shb[i]), int(posb[i]))
            if na + nb == 0:
                s = 1.0
            else:
                _, ia, ib = np.intersect1d(
                    ua, ub, assume_unique=True, return_indices=True)
                s = 2.0 * int(np.minimum(ca[ia], cb[ib]).sum()) / (na + nb)
            if s >= thr:
                oa.append(int(a[i]))
                ob.append(int(b[i]))
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

    coherent = cfg.shard_coherent_verify
    if coherent is None:  # auto: only when the store is big enough to
        coherent = ids.size >= cfg.shard_coherent_above  # stress plasma
    if coherent:
        # Block-local reorder by (shard(a), shard(b)): pairs arrive
        # a-sorted (distinct_pairs), so one in-block lexsort makes
        # consecutive verify batches sweep b-shards in order — the
        # worker's bounded shard LRU then hits instead of re-mapping
        # spilled shards per batch.  Routing only: the verified pair
        # SET is identical either way (equivalence pinned by test).
        bounds = ray.get(store_ref)[0]  # interior bounds: tiny

        def _reorder(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or bounds.size == 0:
                return batch
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            sa = np.searchsorted(bounds, a, side="right")
            sb = np.searchsorted(bounds, b, side="right")
            return batch.take(pa.array(np.lexsort((sb, sa))))

        pairs_ds = pairs_ds.map_batches(
            _reorder, batch_format="pyarrow", batch_size=None
        )

    def _verify_task(batch: pa.Table) -> pa.Table:
        # warm-worker task + per-process cached Verifier (the _kv_lookup
        # discipline, lsh.py): lazily-fetched shards AND the prefilter's
        # per-shard sketch cache survive across batches instead of being
        # rebuilt per batch; ray.get stays zero-copy either way
        v = _cached_verifier(store_ref, cfg)
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
