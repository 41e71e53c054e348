"""Exact set-similarity self-join via prefix filtering — the AllPairs /
PPJoin family (Bayardo, Ma & Srikant, "Scaling up all pairs similarity
search", WWW'07; Xiao, Wang, Lin & Yu, "Efficient similarity joins for
near duplicate detection", WWW'08; both public textbook algorithms).

This is the EXACT counterpart of the MinHash-LSH candidate path: the
reference generates candidates probabilistically with LSH buckets and
verifies them exactly within the bucket
(/root/reference/hclust/src/hclust/kmer_search.cpp:100-111); prefix
filtering instead generates a candidate superset with a *guarantee* —
every pair whose Jaccard reaches the threshold shares at least one
token inside both docs' prefixes under a fixed global token order — so
recall is exactly 1 with no signature tuning.  The classic order is
document-frequency ascending (rare tokens first), which makes the
prefix postings sparse exactly where buckets would explode.

Physical plan (all existing machinery, one new store):

  token sets   one map_batches pass -> (file_id, toks: sorted unique
               64-bit word-bigram hashes) — list column, zero-copy
  df           explode -> grouped_agg_ds count -> id-range-sharded kv
               store (the tfidf discipline: the vocabulary never lands
               on the driver)
  prefix       per batch: df lookup, per-doc lexsort by (df, hash),
               keep the first |s| - ceil(t*s) + 1 tokens, emit
               (gkey=token_hash, file_id) postings
  candidates   lsh.counted_pairs_from_keyed — ONE sort + vectorized
               run scan (the shared sorted-run machinery)
  verify       id-range-sharded SET store over the token lists (the
               shingle-store layout, verify.py:408) + lazy per-batch
               shard fetch; exact |A∩B| via per-pair searchsorted (the
               flagship's measured loop-beats-gather discipline)

The threshold is a rational num/den and every comparison is integer
(den*inter >= num*union), so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from hsearch_ray import hashing as H
from hsearch_ray.stages.agg import grouped_agg_ds
from hsearch_ray.stages.lsh import (
    _kv_lookup,
    build_kv_store,
    counted_pairs_from_keyed,
)

I64 = np.int64
U64 = np.uint64

_TOKS_SCHEMA = pa.schema(
    [("file_id", pa.int64()), ("toks", pa.list_(pa.int64()))]
)
_PAIR_SCHEMA = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()),
     ("n_common", pa.int64()), ("n_union", pa.int64())]
)


def _bigram_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word-bigram 64-bit hashes: (values, doc lens).  Tokens =
    ``\\S+`` runs (the tfidf tokenizer, shared with the SQL oracle);
    each bigram hashes as splitmix64(h1 ^ splitmix64(h2)) over the two
    tokens' vectorized utf8 hashes — no bigram string is ever built."""
    import polars as pl

    toks = texts.str.findall(r"\S+")
    lens = toks.str.len().to_numpy(dtype=I64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, I64), np.zeros(lens.size, I64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    h = pl.Series(flat.astype(str)).hash(seed=42).to_numpy().view(U64)
    nbg = np.maximum(lens - 1, 0)
    off = np.concatenate([np.zeros(1, I64), np.cumsum(lens)])
    # global index of each bigram's FIRST token: doc-start + within-doc
    cum0 = np.concatenate([np.zeros(1, I64), np.cumsum(nbg)])
    within = np.arange(int(nbg.sum()), dtype=I64) - np.repeat(cum0[:-1], nbg)
    pos = np.repeat(off[:-1], nbg) + within
    bg = H.splitmix64(h[pos] ^ H.splitmix64(h[pos + 1])).view(I64)
    return bg, nbg


def _unigram_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc word-token 64-bit hashes: (values, doc lens).  Same
    tokenizer and utf8 hash as the bigram variant."""
    import polars as pl

    toks = texts.str.findall(r"\S+")
    lens = toks.str.len().to_numpy(dtype=I64)
    if int(lens.sum()) == 0:
        return np.empty(0, I64), lens
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
    h = pl.Series(flat.astype(str)).hash(seed=42).to_numpy().view(I64)
    return h, lens


def token_bigram_sets(docs_ds, id_col: str = "doc_id",
                      text_col: str = "text", ngram: int = 2):
    """documents -> (file_id, toks) Dataset where toks is the SORTED
    UNIQUE int64 word-bigram (``ngram=2``, default) or word-unigram
    (``ngram=1``) hash set of the doc (empty for docs with fewer than
    ``ngram`` tokens).  Sortedness is the store invariant the verify
    pass relies on."""
    hasher = _bigram_hashes if ngram == 2 else _unigram_hashes

    def _sets(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _TOKS_SCHEMA.empty_table()
        df = batch.select([id_col, text_col]).to_pandas()
        ids = df[id_col].to_numpy(dtype=I64)
        bg, nbg = hasher(df[text_col])
        docrep = np.repeat(np.arange(ids.size, dtype=I64), nbg)
        # per-doc sorted unique: lexsort by (doc, hash), keep firsts
        order = np.lexsort((bg, docrep))
        d, v = docrep[order], bg[order]
        keep = np.ones(d.size, dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
        d, v = d[keep], v[keep]
        lens = np.bincount(d, minlength=ids.size).astype(I64)
        offsets = np.concatenate([np.zeros(1, I64), np.cumsum(lens)])
        return pa.table({
            "file_id": pa.array(ids, pa.int64()),
            "toks": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()) if offsets[-1] < 2**31
                else pa.array(offsets, pa.int64()),
                pa.array(v, pa.int64()),
            ),
        })

    return docs_ds.map_batches(_sets, batch_format="pyarrow")


def _list_views(batch: pa.Table, col: str):
    """(fids, lens, flat values, starts) zero-copy views of a list
    column — slice-local offsets (the containment explode discipline)."""
    fids = batch["file_id"].to_numpy(zero_copy_only=False)
    arr = batch[col].combine_chunks()
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(I64)
    values = arr.values.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    starts = offsets[:-1] - offsets[0]
    return fids, lens, values[offsets[0]:offsets[-1]], starts


@ray.remote
def _build_set_shard(lo: int, hi: int | None, blocks):
    """One id-range shard of the token-SET store, built directly from
    the (file_id, toks) Dataset's Arrow block refs: (ids_sorted, starts,
    lens, values) — the reference's concatenated store + offsets layout
    (protein.hpp:14-39), same as the shingle store."""
    fid_parts, len_parts, val_parts = [], [], []
    # refs fetched one at a time (verify._build_shard's incremental-pin
    # discipline): builders never pin the whole token table; values are
    # COPIED out so no view keeps the fetched block pinned
    for ref in blocks:
        tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if tbl.num_rows == 0:
            continue
        fid = tbl["file_id"].to_numpy(zero_copy_only=False)
        m = (fid >= lo) if hi is None else (fid >= lo) & (fid < hi)
        if not m.any():
            continue
        sub = tbl.filter(pa.array(m))
        fids, lens, flat, starts = _list_views(sub, "toks")
        fid_parts.append(fids.astype(I64))
        len_parts.append(lens.copy())
        # starts are contiguous within a filtered block, so flat is
        # already in row order
        val_parts.append(flat.astype(I64, copy=True))
    if not fid_parts:
        e = np.empty(0, I64)
        return e, e, e, e
    fid = np.concatenate(fid_parts)
    lens = np.concatenate(len_parts)
    vals = np.concatenate(val_parts)
    starts = np.zeros(fid.size + 1, dtype=I64)
    np.cumsum(lens, out=starts[1:])
    order = np.argsort(fid, kind="stable")
    return fid[order], starts[:-1][order], lens[order], vals


def build_set_store(tok_ds, num_shards: int | None = None):
    """Id-range-sharded store of per-doc sorted token sets.  Returns a
    ref to (interior bounds, shard refs) — the build_kv_store routing
    contract."""
    tok_ds = tok_ds.materialize()
    if num_shards is None:
        # payload-size ceiling (verify.build_store discipline): one
        # shard per 256k docs bounds a shard's packed token arrays at
        # any corpus size; the CPU term only spreads small stores
        from hsearch_ray.stages.agg import default_num_shards

        num_shards = default_num_shards(
            tok_ds.count(), 262_144,
            cpu_floor=int(ray.cluster_resources().get("CPU", 8)) // 2)

    def _mm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        k = batch["file_id"].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(k.min())], pa.int64()),
                         "hi": pa.array([int(k.max())], pa.int64())})

    mm = tok_ds.map_batches(_mm, batch_format="pyarrow").to_pandas()
    if mm.empty:
        return ray.put((np.empty(0, I64), []))
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    bounds = H.int_range_cuts(
        lo, min(hi, np.iinfo(np.int64).max - 1) + 1, num_shards
    )
    block_refs = list(tok_ds.to_arrow_refs())
    last = len(bounds) - 2
    shard_refs = [
        _build_set_shard.remote(
            int(bounds[s]), None if s == last else int(bounds[s + 1]),
            block_refs)
        for s in range(len(bounds) - 1)
    ]
    return ray.put((bounds[1:-1], shard_refs))


@functools.lru_cache(maxsize=8)
def _set_lookup(store_ref) -> "_ShardedSetLookup":
    """Per-process cache keyed by the store ref (the _kv_lookup
    discipline): warm-worker tasks share lazily-fetched shards."""
    return _ShardedSetLookup(store_ref)


class _ShardedSetLookup:
    # Bounded LRU of mapped shards: zero-copy views pin plasma objects,
    # so an unbounded map lets every worker pin the whole token-set
    # store (the Verifier's verify_shard_cache rationale).
    _CACHE_CAP = 12

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

    def slices(self, x: np.ndarray):
        """Per-id (shard_idx, row_pos) for an int64 id array; row_pos
        is -1 for ids absent from the store."""
        sh = (np.searchsorted(self.bounds, x, side="right")
              if self.bounds.size else np.zeros(x.size, I64))
        pos = np.full(x.size, -1, dtype=I64)
        for s in np.unique(sh):
            ids_s = self._shard(int(s))[0]
            if ids_s.size == 0:
                continue
            rows = np.nonzero(sh == s)[0]
            p = np.minimum(np.searchsorted(ids_s, x[rows]), ids_s.size - 1)
            hit = ids_s[p] == x[rows]
            pos[rows[hit]] = p[hit]
        return sh.astype(I64), pos

    def get(self, shard: int, row: int) -> np.ndarray:
        ids, starts, lens, vals = self._shard(int(shard))
        st = int(starts[row])
        return vals[st:st + int(lens[row])]


def prefix_len(sizes: np.ndarray, num: int, den: int) -> np.ndarray:
    """AllPairs prefix length for Jaccard >= num/den:
    p = s - ceil(t*s) + 1 (>= 1 for s >= 1).  Integer-exact."""
    s = sizes.astype(I64)
    return s - (num * s + den - 1) // den + 1


def set_similarity_join(tok_ds, num: int, den: int,
                        cap: int | None = None,
                        num_shards: int | None = None):
    """Exact self-join: all doc pairs whose token-set Jaccard >= num/den,
    as (a, b, n_common, n_union) with a < b.  Exhaustive by default
    (``cap=None``); pass a finite cap to trade the tail of a
    boilerplate-key bucket for bounded pair emission (the documented
    hub-star contract — then the join is exact only below the cap)."""
    tok_ds = tok_ds.materialize()

    # ---- pass 1: document frequency of every token (distributed) ----
    def _df_partials(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        _, _, flat, _ = _list_views(batch, "toks")
        uh, n = np.unique(flat, return_counts=True)
        return pa.table({"h": pa.array(uh.astype(I64), pa.int64()),
                         "n": pa.array(n.astype(I64), pa.int64())})

    dfreq = grouped_agg_ds(
        tok_ds.map_batches(_df_partials, batch_format="pyarrow"),
        ["h"], {"n": ["sum"]},
    )
    df_ref = ray.put(build_kv_store(dfreq, "h", "n__sum"))

    # ---- pass 2: prefix postings under the global (df, hash) order ----
    _P_SCHEMA = pa.schema([("gkey", pa.int64()), ("file_id", pa.int64()),
                           ("ord", pa.int64())])

    def _prefix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _P_SCHEMA.empty_table()
        fids, lens, flat, _ = _list_views(batch, "toks")
        if flat.size == 0:
            return _P_SCHEMA.empty_table()
        dfv, ok = _kv_lookup(df_ref).lookup(flat.astype(I64))
        dfv = np.where(ok, dfv, 1)
        docrep = np.repeat(np.arange(fids.size, dtype=I64), lens)
        # lexsort with docrep primary: each doc's tokens are contiguous
        # in `order` at [off[i], off[i]+lens[i]) in (df, hash) ascending
        order = np.lexsort((flat, dfv, docrep))
        p = prefix_len(lens, num, den)
        off = np.concatenate([np.zeros(1, I64), np.cumsum(lens)])
        within_sorted = np.arange(flat.size, dtype=I64) - \
            np.repeat(off[:-1], lens)
        mask = within_sorted < np.repeat(p, lens)
        sel = order[mask]
        docs_sel = docrep[sel]
        # packed (set size << 32 | 0-based position in the doc's sorted
        # order) for the PPJoin positional filter at pair emission
        packed = (lens[docs_sel] << np.int64(32)) | within_sorted[mask]
        return pa.table({
            "gkey": pa.array(flat[sel].astype(I64), pa.int64()),
            "file_id": pa.array(fids[docs_sel], pa.int64()),
            "ord": pa.array(packed.astype(I64), pa.int64()),
        })

    postings = tok_ds.map_batches(_prefix, batch_format="pyarrow")
    cand, _ = counted_pairs_from_keyed(
        postings, cap=cap if cap else 1 << 30, window=0,
        pos_filter=(num, den),
    )

    # ---- pass 3: exact verification against the full sets ----
    store_ref = build_set_store(tok_ds, num_shards=num_shards)

    def _verify(batch: pa.Table) -> pa.Table:
        """Vectorized exact verification: per-shard range-concat gather
        of both sides' sorted token lists tagged with the pair's row id,
        one lexsort over (row, value), adjacent-duplicate counting.  No
        per-pair Python (the previous per-pair searchsorted loop was the
        wall at sf0.1's 7.9M-candidate explosion: 80s -> ~2s).  A size
        prefilter drops pairs that cannot reach the threshold even at
        full overlap (den*min >= num*union_min), before any gather."""
        if batch.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        from hsearch_ray.stages.verify import _concat_ranges

        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        lk = _set_lookup(store_ref)
        sha, posa = lk.slices(a)
        shb, posb = lk.slices(b)

        def side_lens(sh, pos):
            out = np.zeros(sh.size, dtype=I64)
            valid = pos >= 0
            for s in np.unique(sh[valid]):
                m = valid & (sh == s)
                lens = lk._shard(int(s))[2]
                out[m] = lens[pos[m]]
            return out

        na, nb = side_lens(sha, posa), side_lens(shb, posb)
        mn = np.minimum(na, nb)
        ok0 = (posa >= 0) & (posb >= 0) & (na + nb > 0)
        ok0 &= den * mn >= num * (na + nb - mn)
        idx = np.nonzero(ok0)[0]
        if idx.size == 0:
            return _PAIR_SCHEMA.empty_table()

        def gather(sh, pos):
            rid_parts, val_parts = [], []
            for s in np.unique(sh):
                m = sh == s
                _, starts, lens, vals = lk._shard(int(s))
                st, ln = starts[pos[m]], lens[pos[m]]
                val_parts.append(vals[_concat_ranges(st, ln)])
                rid_parts.append(
                    np.repeat(np.nonzero(m)[0].astype(I64), ln))
            if not rid_parts:
                return np.empty(0, I64), np.empty(0, I64)
            return np.concatenate(rid_parts), np.concatenate(val_parts)

        ra, va = gather(sha[idx], posa[idx])
        rb, vb = gather(shb[idx], posb[idx])
        pid = np.concatenate([ra, rb])
        v = np.concatenate([va, vb])
        order = np.lexsort((v, pid))
        pid, v = pid[order], v[order]
        # per-doc token lists are sorted UNIQUE, so within a pair every
        # value appears at most twice — adjacent equality == membership
        # in both sides
        dup = (pid[1:] == pid[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(pid[1:][dup], minlength=idx.size).astype(I64)
        union = na[idx] + nb[idx] - inter
        ok = (den * inter >= num * union) & (union > 0)
        sel = idx[ok]
        return pa.table({
            "a": pa.array(a[sel], pa.int64()),
            "b": pa.array(b[sel], pa.int64()),
            "n_common": pa.array(inter[ok], pa.int64()),
            "n_union": pa.array(union[ok], pa.int64()),
        })

    # the sort-by-a exists ONLY for shard locality (a batch then touches
    # few store shards); when the whole store fits a worker's LRU cache
    # (_ShardedSetLookup._CACHE_CAP) locality is free and the full
    # candidate sort is a pure waste — at sf0.1 that is a 7.9M-row sort
    n_store_shards = len(ray.get(store_ref)[1])
    if n_store_shards > _ShardedSetLookup._CACHE_CAP:
        cand = cand.sort("a")
    return cand.map_batches(
        _verify, batch_format="pyarrow", batch_size=8192
    )
