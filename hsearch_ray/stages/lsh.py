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
  * Singleton buckets (the vast majority) cost one compare in the
    sorted run scan and emit nothing — the sort IS the grouping, so no
    separate semi-join pass is needed (a pre-count pass to drop
    singleton postings before the sort was evaluated and rejected:
    counting requires the same exchange it would save).
  * Hot buckets (> cap) NEVER gather on one worker: members emit
    hub-star edges (bucket_min, member) inside a stateless map_batches
    against a tiny broadcast {hot_key: min_fid} map — O(n) edges, no
    skewed group, no quadratic blowup.  Connectivity through the hub is
    preserved for union-find; pair-level truncation is reported in the
    returned metrics.

All emitted pairs are canonical ``a < b`` (deterministic, retry-safe).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages.agg import grouped_agg
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
    cols = {
        "file_id": pa.array(np.repeat(fids, cfg.num_bands), pa.int64()),
        "band": pa.array(
            np.tile(np.arange(cfg.num_bands, dtype=I64), n), pa.int64()
        ),
        "band_hash": pa.array(bh.ravel().view(I64), pa.int64()),
    }
    if cfg.hot_bucket_window > 0 and "simhash" in batch.column_names:
        # ring order key for hot-bucket recovery: carried only when the
        # signature stage computed simhash (sign(..., with_simhash=True))
        sh = batch["simhash"].to_numpy(zero_copy_only=False)
        cols["ord"] = pa.array(np.repeat(sh, cfg.num_bands), pa.int64())
    return pa.table(cols)


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


def _ppjoin_keep(ax: np.ndarray, ay: np.ndarray,
                 num: int, den: int) -> np.ndarray:
    """PPJoin positional + size filter over packed (size<<32 | prefix
    position) posting values (Xiao, Wang, Lin & Yu, WWW'08).  An
    emission from the pair's FIRST common token x has no common token
    before x, so overlap <= 1 + min(sa-pa-1, sb-pb-1); Jaccard >=
    num/den needs overlap >= ceil(num*(sa+sb)/(num+den)).  Dropping an
    emission that fails the bound is recall-safe: a true pair's
    first-common-token emission (provably inside both prefixes) always
    passes, and pair dedup keeps one surviving emission."""
    sx, px = ax >> np.int64(32), ax & np.int64(0xFFFFFFFF)
    sy, py = ay >> np.int64(32), ay & np.int64(0xFFFFFFFF)
    minreq = -(-num * (sx + sy)) // (num + den)
    mn = np.minimum(sx, sy)
    keep = den * mn >= num * (sx + sy - mn)          # size compatibility
    # 1 + min(sa-pa-1, sb-pb-1) == min(sa-pa, sb-pb) for 0-based pos
    keep &= np.minimum(sx - px, sy - py) >= minreq
    return keep


def _pairs_within_runs(keys: np.ndarray, fids: np.ndarray, cap: int,
                       aux: np.ndarray | None = None,
                       pos_filter: tuple[int, int] | None = None):
    """All-pairs within equal-key runs of a KEY-SORTED array, fully
    vectorized: one offset-d pass per distance (runs are <= cap long, and
    mostly length 2-3, so passes terminate fast).  This is the J5 analog
    (sorted-run pairing, gen_kmers_from_suffix_array.cpp:51-65) applied
    to LSH buckets.  With ``pos_filter=(num, den)`` and packed ``aux``
    values, emissions failing the PPJoin positional bound are dropped
    at formation (see _ppjoin_keep)."""
    out_a, out_b = [], []
    n = keys.size
    for d in range(1, min(cap, n)):
        same = keys[:-d] == keys[d:]
        if not same.any():
            break
        x, y = fids[:-d][same], fids[d:][same]
        if pos_filter is not None and aux is not None:
            keep = _ppjoin_keep(aux[:-d][same], aux[d:][same], *pos_filter)
            x, y = x[keep], y[keep]
        out_a.append(np.minimum(x, y))
        out_b.append(np.maximum(x, y))
    if not out_a:
        return np.empty(0, dtype=I64), np.empty(0, dtype=I64)
    return np.concatenate(out_a), np.concatenate(out_b)


def _pair_void_unique(a: np.ndarray, b: np.ndarray):
    """Distinct (a, b) rows of a block via one 16-byte void-key unique
    (C-speed sort of the block's pairs — requires only an ``a``-sorted
    EXCHANGE upstream, halving the distributed sort's key work)."""
    arr = np.empty(a.size, dtype=[("a", "<i8"), ("b", "<i8")])
    arr["a"] = a
    arr["b"] = b
    keys = arr.view("V16").reshape(-1)
    uniq, first, counts = np.unique(keys, return_index=True, return_counts=True)
    return a[first], b[first], counts


def _dedup_sorted_pair_block(batch: pa.Table) -> pa.Table:
    """Within-block pair dedup for an ``a``-sorted block (b may be in
    any order within an ``a`` run — the block-local void-key unique
    handles it).  All pairs sharing the block's first/last ``a`` value
    spill (kind=1) for one tiny cross-block pass.  Also emits the
    block's distinct file ids as kind=2 rows — fusing the candidate-id
    collection into this scan saves the downstream verify stage a whole
    extra pass over the pair table."""
    n = batch.num_rows
    if n == 0:
        return pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("kind", pa.int8())]
        ).empty_table()
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    ua, ub, _ = _pair_void_unique(a, b)
    edge = (ua == a[0]) | (ua == a[-1])
    interior = ~edge
    ids = np.unique(np.concatenate([ua, ub]))
    return pa.table(
        {
            "a": pa.array(
                np.concatenate([ua[interior], ua[edge], ids]), pa.int64()
            ),
            "b": pa.array(
                np.concatenate([ub[interior], ub[edge], np.zeros(ids.size, I64)]),
                pa.int64(),
            ),
            "kind": pa.array(
                np.concatenate(
                    [np.zeros(int(interior.sum()), np.int8),
                     np.ones(int(edge.sum()), np.int8),
                     np.full(ids.size, 2, np.int8)]
                ),
                pa.int8(),
            ),
        }
    )


def _project_ab(batch: pa.Table) -> pa.Table:
    # projection inside map_batches (select_columns after filter chains
    # trips Ray Data schema inference; see project-level perf notes)
    return pa.table({"a": batch["a"].cast(pa.int64()),
                     "b": batch["b"].cast(pa.int64())})


def distinct_pairs(pairs_ds):
    """Distributed distinct over (a,b): ONE single-key sort by ``a``
    (the block-local void-key unique covers ``b``; measured 2x+ faster
    than the two-key distributed sort at 20M pair rows) + per-block
    dedup; only pairs sharing block-edge ``a`` values take a tiny
    cross-block pass.  Returns (Dataset, n_distinct, candidate_ids) —
    the distinct file ids come from the same scan (kind=2 rows), not an
    extra pass."""
    emitted = (
        pairs_ds.sort("a")
        .map_batches(_dedup_sorted_pair_block, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior = emitted.filter(expr="kind == 0").map_batches(
        _project_ab, batch_format="pyarrow"
    )
    small = (
        emitted.filter(expr="kind != 0")
        .map_batches(
            lambda b: pa.table({"a": b["a"].cast(pa.int64()),
                                "b": b["b"].cast(pa.int64()),
                                "kind": b["kind"]}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if small.empty:  # empty filter output loses its schema in pandas
        small = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "kind": pd.Series(dtype="int8")})
    spill = small[small["kind"] == 1][["a", "b"]]
    ids = np.unique(small.loc[small["kind"] == 2, "a"].to_numpy(dtype=I64))
    n = emitted.count() - len(small)  # metadata count; no extra execution
    if len(spill):
        spill = spill.drop_duplicates()
        interior = interior.union(
            ray.data.from_arrow(
                pa.table({"a": pa.array(spill["a"].to_numpy(dtype=I64), pa.int64()),
                          "b": pa.array(spill["b"].to_numpy(dtype=I64), pa.int64())})
            )
        )
        n += len(spill)
    return interior, n, ids


def _ring_window_pairs(members: np.ndarray, order_key: np.ndarray, window: int):
    """Pair-level recall recovery for ONE hub-starred hot bucket
    (cfg.hot_bucket_window): members sorted by (order_key, member); each
    member pairs with its ``window`` successors on the CIRCULAR ring.
    O(n·window) pairs.  With a similarity-correlated order key (simhash,
    carried as the optional "ord" posting column) near-dups land
    adjacent, so most true pairs inside the bucket are recovered; with
    no "ord" column the ring runs in file-id order (deterministic, but
    recovery is positional only)."""
    l = members.size
    if l < 2 or window <= 0:
        return np.empty(0, I64), np.empty(0, I64)
    order = np.lexsort((members, order_key))
    m = members[order]
    outs_a, outs_b = [], []
    for d in range(1, min(window, l - 1) + 1):
        y = np.roll(m, -d)
        lo, hi = np.minimum(m, y), np.maximum(m, y)
        keep = lo != hi
        outs_a.append(lo[keep])
        outs_b.append(hi[keep])
    return np.concatenate(outs_a), np.concatenate(outs_b)


def _emit_bucket_runs(batch: pa.Table, cap: int, window: int = 0,
                      pos_filter: tuple[int, int] | None = None) -> pa.Table:
    """Process one (gkey)-sorted block in a single vectorized pass:

      * interior runs of size 2..cap -> ALL pairs (offset-distance trick)
      * interior runs of size > cap  -> hub-star edges (run-min as hub),
        O(n) instead of O(n^2) — the skew path; truncation is flagged —
        plus, with ``window`` > 0, a ring-window recovery pass per hot
        run (simhash-sorted when the "ord" column is present).  The
        hub ∪ ring union is deduped PER RUN so one key emits each pair
        at most once (counted_pairs' ``n`` = distinct shared keys).
      * boundary runs (touching block edges; may continue next door)
        -> spill postings (kind=1) for a worker-side regroup; when the
        input carries "ord" it survives as the spill column "o", so
        cross-block hot buckets get the same simhash-sorted ring
        recovery as block-interior runs
      * per-block bucket-size histogram rows (kind=2: a=run_len, b=count)

    This is the reference's suffix-run processing
    (gen_kmers_from_suffix_array.cpp:51-65) fused with its LSH bucket
    loop (pcluster.cpp:157-170) into one sorted scan.
    """
    has_ord = "ord" in batch.column_names
    fields = [("a", pa.int64()), ("b", pa.int64()), ("kind", pa.int8())]
    if has_ord:
        fields.append(("o", pa.int64()))
    schema = pa.schema(fields)
    n = batch.num_rows
    if n == 0:
        return schema.empty_table()
    k = batch["gkey"].to_numpy(zero_copy_only=False)
    f = batch["file_id"].to_numpy(zero_copy_only=False)
    o = batch["ord"].to_numpy(zero_copy_only=False) if has_ord else None
    boundary = (k == k[0]) | (k == k[-1])
    ki, fi = k[~boundary], f[~boundary]
    oi = o[~boundary] if o is not None else None
    out_a, out_b, out_kind = [], [], []
    if ki.size:
        # run segmentation
        starts = np.nonzero(np.concatenate(([True], ki[1:] != ki[:-1])))[0]
        lens = np.diff(np.append(starts, ki.size))
        run_id = np.repeat(np.arange(starts.size), lens)
        row_len = lens[run_id]
        # histogram rows (metrics)
        hl, hc = np.unique(lens, return_counts=True)
        out_a.append(hl.astype(I64))
        out_b.append(hc.astype(I64))
        out_kind.append(np.full(hl.size, 2, np.int8))
        # cold runs: all pairs
        cold_mask = (row_len >= 2) & (row_len <= cap)
        if cold_mask.any():
            pa_, pb_ = _pairs_within_runs(
                ki[cold_mask], fi[cold_mask], cap,
                aux=oi[cold_mask] if oi is not None else None,
                pos_filter=pos_filter)
            out_a.append(pa_)
            out_b.append(pb_)
            out_kind.append(np.zeros(pa_.size, np.int8))
        # hot runs: hub-star to run minimum (+ optional ring recovery)
        hot_mask = row_len > cap
        if hot_mask.any():
            kh, fh = ki[hot_mask], fi[hot_mask]
            oh = oi[hot_mask] if oi is not None else None
            hstarts = np.nonzero(np.concatenate(([True], kh[1:] != kh[:-1])))[0]
            hlens = np.diff(np.append(hstarts, kh.size))
            if window > 0:
                # loop over hot RUNS (rare by construction), vectorized
                # inside each; the hub ∪ ring union is deduped per run so
                # one key never emits a pair twice (e.g. run-min vs its
                # ring successor appears as both a star and a ring edge)
                for s, l in zip(hstarts, hlens):
                    mem = fh[s:s + l]
                    okey = oh[s:s + l] if oh is not None else mem
                    hub = mem.min()
                    keep = mem != hub
                    ha = np.minimum(hub, mem[keep])
                    hb = np.maximum(hub, mem[keep])
                    ra, rb = _ring_window_pairs(mem, okey, window)
                    ua, ub, _ = _pair_void_unique(
                        np.concatenate([ha, ra]), np.concatenate([hb, rb])
                    )
                    out_a.append(ua)
                    out_b.append(ub)
                    out_kind.append(np.zeros(ua.size, np.int8))
            else:
                hmins = np.minimum.reduceat(fh, hstarts)
                hubs = np.repeat(hmins, hlens)
                keep = fh != hubs
                out_a.append(np.minimum(hubs[keep], fh[keep]))
                out_b.append(np.maximum(hubs[keep], fh[keep]))
                out_kind.append(np.zeros(int(keep.sum()), np.int8))
    sb, fb = k[boundary], f[boundary]
    out_a.append(sb)
    out_b.append(fb)
    out_kind.append(np.ones(sb.size, np.int8))
    cols = {
        "a": pa.array(np.concatenate(out_a).astype(I64), pa.int64()),
        "b": pa.array(np.concatenate(out_b).astype(I64), pa.int64()),
        "kind": pa.array(np.concatenate(out_kind), pa.int8()),
    }
    if has_ord:
        # spill rows carry the ring order key; pair/histogram rows 0
        kinds = np.concatenate(out_kind)
        ov = np.zeros(kinds.size, dtype=I64)
        ov[kinds == 1] = o[boundary]
        cols["o"] = pa.array(ov, pa.int64())
    return pa.table(cols)


def _count_sorted_pair_block(batch: pa.Table) -> pa.Table:
    """Within-block ``a``-sorted scan that COUNTS duplicate pair rows
    (pair multiplicity = number of shared keys that emitted it) via the
    block-local void-key unique: interior pairs -> one (a, b, n) row
    (kind=0); pairs sharing block-edge ``a`` values -> partial-count
    rows (kind=1) summed in a tiny driver pass; distinct file ids ->
    kind=2 (same fusion as _dedup_sorted_pair_block)."""
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("n", pa.int64()), ("kind", pa.int8())])
    m = batch.num_rows
    if m == 0:
        return schema.empty_table()
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    ra, rb, counts = _pair_void_unique(a, b)
    edge = (ra == a[0]) | (ra == a[-1])
    ids = np.unique(np.concatenate([ra, rb]))
    return pa.table(
        {
            "a": pa.array(np.concatenate([ra[~edge], ra[edge], ids]), pa.int64()),
            "b": pa.array(
                np.concatenate([rb[~edge], rb[edge], np.zeros(ids.size, I64)]),
                pa.int64(),
            ),
            "n": pa.array(
                np.concatenate([counts[~edge], counts[edge],
                                np.zeros(ids.size, I64)]).astype(I64),
                pa.int64(),
            ),
            "kind": pa.array(
                np.concatenate([np.zeros(int((~edge).sum()), np.int8),
                                np.ones(int(edge.sum()), np.int8),
                                np.full(ids.size, 2, np.int8)]),
                pa.int8(),
            ),
        }
    )


def counted_pairs_from_keyed(keyed_ds, cap: int, window: int = 0,
                             pos_filter: tuple[int, int] | None = None):
    """(gkey, file_id[, ord]) posting rows -> ((a, b, n) Dataset, ids)
    where n counts the distinct keys shared by the pair.  Same physical
    plan as the LSH candidate path: ONE sort by key + vectorized run
    scan (with worker-side regroup of boundary runs and hub-star +
    optional ring-window recovery for hot keys), then ONE sort by
    (a, b) with per-block run counting.  No per-key Python, no driver
    funnel.  With ``pos_filter=(num, den)`` the "ord" column is read as
    packed (set_size<<32 | prefix_pos) and emissions failing the PPJoin
    positional bound are dropped at formation (_ppjoin_keep)."""
    runs = (
        keyed_ds.sort("gkey")
        .map_batches(_emit_bucket_runs,
                     fn_kwargs={"cap": cap, "window": window,
                                "pos_filter": pos_filter},
                     batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior = runs.filter(expr="kind == 0").map_batches(
        _project_ab, batch_format="pyarrow"
    )
    spill_pairs = (
        runs.filter(expr="kind == 1")
        .groupby("a")
        .map_groups(_emit_spill_group(cap, window, pos_filter),
                    batch_format="pyarrow")
    )
    counted = (
        interior.union(spill_pairs)
        .sort("a")  # single-key exchange; void-key unique covers b
        .map_batches(_count_sorted_pair_block, batch_size=None,
                     batch_format="pyarrow")
        .materialize()
    )
    body = counted.filter(expr="kind == 0").map_batches(
        lambda t: pa.table({"a": t["a"].cast(pa.int64()),
                            "b": t["b"].cast(pa.int64()),
                            "n": t["n"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    small = (
        counted.filter(expr="kind != 0")
        .map_batches(
            lambda t: pa.table({"a": t["a"].cast(pa.int64()),
                                "b": t["b"].cast(pa.int64()),
                                "n": t["n"].cast(pa.int64()),
                                "kind": t["kind"]}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if small.empty:
        small = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64"),
                              "kind": pd.Series(dtype="int8")})
    ids = np.unique(small.loc[small["kind"] == 2, "a"].to_numpy(dtype=I64))
    spill = small[small["kind"] == 1]
    if len(spill):
        merged = spill.groupby(["a", "b"], as_index=False, sort=False)["n"].sum()
        body = body.union(
            ray.data.from_arrow(
                pa.table({"a": pa.array(merged["a"].to_numpy(dtype=I64), pa.int64()),
                          "b": pa.array(merged["b"].to_numpy(dtype=I64), pa.int64()),
                          "n": pa.array(merged["n"].to_numpy(dtype=I64), pa.int64())})
            )
        )
    return body, ids


def _emit_spill_group(cap: int, window: int = 0,
                      pos_filter: tuple[int, int] | None = None):
    """Pair emission for ONE regrouped boundary bucket (rows: a=gkey,
    b=file_id[, o=ring order key]).  Same cold/hot policy as the block
    scan: all-pairs up to ``cap`` members, hub-star above (a mega-bucket
    spanning many blocks stays O(n) and never ships to the driver) plus
    the ring-window recovery pass — simhash-sorted when the postings
    carried the "o" order key (same recovery quality as block-interior
    runs), file-id order otherwise.  The hub ∪ ring union is deduped so
    one key emits each pair at most once."""

    def emit(group: pa.Table) -> pa.Table:
        b_arr = group["b"].to_numpy(zero_copy_only=False)
        fids, first = np.unique(b_arr, return_index=True)
        n = fids.size
        if n < 2:
            return PAIR_SCHEMA.empty_table()
        if n > cap:
            a = np.full(n - 1, fids[0])
            b = fids[1:]
            if window > 0:
                # a member's order key is identical on every posting of
                # this bucket, so any occurrence (first) works
                okey = (group["o"].to_numpy(zero_copy_only=False)[first]
                        if "o" in group.column_names else fids)
                ra, rb = _ring_window_pairs(fids, okey, window)
                a, b, _ = _pair_void_unique(
                    np.concatenate([a, ra]), np.concatenate([b, rb])
                )
            return pa.table({"a": pa.array(a, pa.int64()),
                             "b": pa.array(b, pa.int64())})
        ii, jj = np.triu_indices(n, k=1)
        if pos_filter is not None and "o" in group.column_names:
            aux = group["o"].to_numpy(zero_copy_only=False)[first]
            keep = _ppjoin_keep(aux[ii], aux[jj], *pos_filter)
            ii, jj = ii[keep], jj[keep]
        return pa.table({"a": pa.array(fids[ii], pa.int64()),
                         "b": pa.array(fids[jj], pa.int64())})

    return emit


@ray.remote
def _build_kv_shard(lo: int, hi: int | None, key_col: str, val_col: str,
                    blocks):
    """One id-range shard of an int64 -> int64 map, built directly from
    Arrow block refs (the driver never materializes the table).  Returns
    (keys_sorted, vals).  hi=None marks the LAST shard: unbounded above,
    so a key of exactly int64-max is still storable.  ``blocks`` is a
    LIST of refs fetched one at a time (verify._build_shard's
    incremental-pin discipline) so builders never pin the whole table."""
    kp, vp = [], []
    for ref in blocks:
        tbl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if tbl.num_rows == 0:
            continue
        k = tbl[key_col].to_numpy(zero_copy_only=False)
        m = (k >= lo) if hi is None else (k >= lo) & (k < hi)
        if not m.any():
            continue
        kp.append(k[m].astype(np.int64))
        vp.append(tbl[val_col].to_numpy(zero_copy_only=False)[m].astype(np.int64))
    if not kp:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = np.concatenate(kp)
    v = np.concatenate(vp)
    order = np.argsort(k, kind="stable")
    return k[order], v[order]


def build_kv_store(ds, key_col: str, val_col: str,
                   num_shards: int | None = None):
    """Id-range-sharded int64 -> int64 store over a Dataset column pair
    (the Jaccard verifier's store discipline for scalar maps): shard
    bounds from one narrow (min, max) pass; S remote builders over the
    block refs.  Returns (bounds, shard_refs) — bounds[1:-1] are the
    interior cut points for searchsorted routing."""
    ds = ds.materialize()
    if num_shards is None:
        # scale with row count (16 B/row) so one shard stays ~64 MB no
        # matter how large the map grows; the CPU term only spreads
        # small maps for build parallelism (same discipline as the
        # shingle store's candidate-count scaling, verify.build_store)
        from hsearch_ray.stages.agg import default_num_shards

        num_shards = default_num_shards(
            ds.count(), 4_000_000,
            cpu_floor=int(ray.cluster_resources().get("CPU", 8)) // 2)

    def _mm(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        k = batch[key_col].to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(k.min())], pa.int64()),
                         "hi": pa.array([int(k.max())], pa.int64())})

    mm = ds.map_batches(_mm, batch_format="pyarrow").to_pandas()
    if mm.empty:
        return np.empty(0, np.int64), []
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    bounds = H.int_range_cuts(
        lo, min(hi, np.iinfo(np.int64).max - 1) + 1, num_shards
    )
    block_refs = list(ds.to_arrow_refs())
    last = len(bounds) - 2
    shard_refs = [
        _build_kv_shard.remote(int(bounds[s]),
                               None if s == last else int(bounds[s + 1]),
                               key_col, val_col, block_refs)
        for s in range(len(bounds) - 1)
    ]
    return bounds, shard_refs


@functools.lru_cache(maxsize=8)
def _kv_lookup(store_ref) -> "_ShardedKvLookup":
    """Per-process lookup cache keyed by the store ref: stateless
    warm-worker tasks share lazily-fetched shards without paying
    actor-pool respawn per execution."""
    return _ShardedKvLookup(store_ref)


class _ShardedKvLookup:
    """Lazy per-batch shard fetch for a build_kv_store map (the Jaccard
    Verifier's access pattern): a task ray.gets only the shards its
    batch references; numpy buffers are zero-copy from the object
    store."""

    # Max shards one worker keeps mapped: zero-copy views pin their
    # plasma objects, so an unbounded dict would make every worker pin
    # the whole map (the Verifier's verify_shard_cache rationale).  KV
    # shards are narrow (16 B/key), so the cap is generous.
    _CACHE_CAP = 32

    def __init__(self, store_ref):
        import collections

        self.bounds, self.refs = ray.get(store_ref)
        self._shards: "collections.OrderedDict[int, tuple]" = \
            collections.OrderedDict()

    def lookup(self, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(values, found) for an int64 key array."""
        out = np.zeros(x.size, dtype=np.int64)
        ok = np.zeros(x.size, dtype=bool)
        if not self.refs:
            return out, ok
        sh = (np.searchsorted(self.bounds[1:-1], x, side="right")
              if self.bounds.size > 2 else np.zeros(x.size, np.int64))
        for s in np.unique(sh):
            t = self._shards.get(int(s))
            if t is None:
                t = self._shards[int(s)] = ray.get(self.refs[int(s)])
                if len(self._shards) > self._CACHE_CAP:
                    self._shards.popitem(last=False)
            else:
                self._shards.move_to_end(int(s))
            keys_s, vals_s = t
            if keys_s.size == 0:
                continue
            rows = np.nonzero(sh == s)[0]
            p = np.minimum(np.searchsorted(keys_s, x[rows]), keys_s.size - 1)
            hit = keys_s[p] == x[rows]
            out[rows[hit]] = vals_s[p[hit]]
            ok[rows[hit]] = True
        return out, ok


def simhash_dup_pairs(sig_ds, max_hamming: int = 3, num_bands: int = 4,
                      cap: int | None = 4096, window: int = 8,
                      num_shards: int | None = None):
    """SimHash near-duplicate pairs (the M5/F4 fingerprint used as a
    DEDUP method, not just a column): the 64-bit fingerprint splits into
    ``num_bands`` chunks; documents agreeing on any chunk are candidates
    (one sorted-run scan, same machinery as the MinHash path); exact
    popcount verification keeps pairs with hamming <= max_hamming.

    Recall is EXACTLY 1 by pigeonhole below the ``cap``: max_hamming <
    num_bands differing bits cannot touch all chunks, so every
    qualifying pair shares at least one chunk (tested against the
    brute-force oracle).  A chunk shared by MORE than ``cap`` documents
    (boilerplate) is hub-starred + ring-window-recovered instead of
    emitting O(m²) pairs — pass ``cap=None`` for the exhaustive contract
    when the corpus is known boilerplate-free.

    Output: (a, b, hamming).  Simhash lookups route through the
    id-range sharded kv store (build_kv_store) with lazy per-batch
    shard fetch — nothing is broadcast whole, nothing is driver-side."""
    bits = 64 // num_bands
    mask = np.uint64((1 << bits) - 1)
    sig_ds = sig_ds.materialize()

    def _explode(batch: pa.Table) -> pa.Table:
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        keys, fids = [], []
        for band in range(num_bands):
            chunk = (sh >> np.uint64(band * bits)) & mask
            keys.append(
                (np.int64(band) << np.int64(48)) | chunk.astype(np.int64)
            )
            fids.append(fid)
        return pa.table({"gkey": pa.array(np.concatenate(keys), pa.int64()),
                         "file_id": pa.array(np.concatenate(fids), pa.int64()),
                         "ord": pa.array(np.tile(sh.view(np.int64), num_bands),
                                         pa.int64())})

    keyed = sig_ds.map_batches(_explode, batch_format="pyarrow")
    cand, _ = counted_pairs_from_keyed(
        keyed, cap=cap if cap else 1 << 30, window=window if cap else 0
    )

    store_ref = ray.put(build_kv_store(sig_ds, "file_id", "simhash", num_shards))

    def _hamming_verify(batch: pa.Table) -> pa.Table:
        look = _kv_lookup(store_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        ha, oka = look.lookup(a)
        hb, okb = look.lookup(b)
        d = np.asarray(H.hamming64(ha.view(np.uint64), hb.view(np.uint64)))
        keep = oka & okb & (d <= max_hamming)
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "hamming": pa.array(d[keep].astype(I64), pa.int64())})

    return cand.map_batches(_hamming_verify, batch_format="pyarrow",
                            batch_size=65536)


def _staged_runs(keyed_ds, cfg: PipelineConfig, cap: int, window: int):
    """Disk-staged candidate exchange: postings land ONCE in parquet
    hive-partitioned by the top bits of gkey, then each key range runs
    its sort + run scan SEQUENTIALLY — the object store holds only one
    range's postings at a time (1/ranges of the exchange), the envelope
    lever for corpora whose posting working set exceeds the per-node
    store (BASELINE.md, 61.44M post-mortem).  A bucket's postings all
    share one gkey, so a bucket lives entirely inside one range and the
    run/spill semantics are unchanged; the emitted run rows (pairs +
    spill + histogram) are orders of magnitude smaller than the
    postings, so unioning them back is cheap.  Trades one parquet
    write+read of the postings for the bounded in-flight exchange."""
    import os
    import shutil
    import uuid

    import ray.data as _rd

    bits = max(1, int(np.ceil(np.log2(cfg.exchange_stage_ranges))))
    n_ranges = 1 << bits
    stage = os.path.join(cfg.exchange_stage_dir,
                         f"exchange_{os.getpid()}_{uuid.uuid4().hex[:8]}")

    def _rng(batch: pa.Table) -> pa.Table:
        g = batch["gkey"].to_numpy(zero_copy_only=False).view(np.uint64)
        r = (g >> np.uint64(64 - bits)).astype(I64)
        return batch.append_column("rng", pa.array(r, pa.int64()))

    cols = ["gkey", "file_id"] + (
        ["ord"] if "ord" in keyed_ds.schema().names else [])
    keyed_ds.map_batches(_rng, batch_format="pyarrow").write_parquet(
        stage, partition_cols=["rng"])
    parts = []
    try:
        for r in range(n_ranges):
            pdir = os.path.join(stage, f"rng={r}")
            if not os.path.isdir(pdir):
                continue
            part = _rd.read_parquet(pdir, columns=cols)
            parts.append(
                part.sort("gkey")
                .map_batches(_emit_bucket_runs,
                             fn_kwargs={"cap": cap, "window": window},
                             batch_size=None, batch_format="pyarrow")
                .materialize()
            )
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    if not parts:
        schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("kind", pa.int8())])
        return ray.data.from_arrow(schema.empty_table())
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def candidate_pairs(banded_ds, cfg: PipelineConfig):
    """banded rows -> distinct candidate pair Dataset (a < b) + metrics.

    ONE distributed sort by the packed bucket key feeds a single
    vectorized scan that counts buckets, emits all-pairs for small
    buckets, and hub-stars hot buckets (skew never gathers on one
    worker).  Block-boundary runs are re-grouped DISTRIBUTIVELY (a tiny
    groupby over <= 2 bucket values per block — a mega-bucket spanning
    many blocks is re-bucketed on workers, never funneled to the
    driver).  A second narrow sort dedups pairs across bands (D5).
    Driver traffic: bucket-size histogram rows only.
    """
    cap = cfg.max_bucket_pairs_exhaustive
    window = cfg.hot_bucket_window

    def _to_gkey(batch: pa.Table) -> pa.Table:
        band = batch["band"].to_numpy(zero_copy_only=False)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        cols = {
            "gkey": pa.array(_packed_keys(band, bh).view(I64), pa.int64()),
            "file_id": batch["file_id"].cast(pa.int64()),
        }
        if "ord" in batch.column_names:  # simhash ring order for hot buckets
            cols["ord"] = batch["ord"].cast(pa.int64())
        return pa.table(cols)

    keyed = banded_ds.map_batches(_to_gkey, batch_format="pyarrow")
    if cfg.exchange_stage_ranges > 1:
        runs = _staged_runs(keyed, cfg, cap, window)
    else:
        runs = (
            keyed.sort("gkey")
            .map_batches(_emit_bucket_runs,
                         fn_kwargs={"cap": cap, "window": window},
                         batch_size=None, batch_format="pyarrow")
            .materialize()
        )
    interior = runs.filter(expr="kind == 0").map_batches(
        _project_ab, batch_format="pyarrow"
    )
    # boundary-bucket postings re-grouped on workers; groups are tiny
    # (<= 2 bucket values per block edge) except adversarial mega-buckets,
    # which the same cold/hot emit keeps O(n)
    spill_pairs = (
        runs.filter(expr="kind == 1")
        .groupby("a")
        .map_groups(_emit_spill_group(cap, window), batch_format="pyarrow")
    )
    pair_ds = interior.union(spill_pairs)

    # distinct across bands (D5 analog — the critical cost lever before
    # exact verification, motif_both_points.cpp:222-243 label[] dedup);
    # distributed sort-based dedup, no driver funnel
    uniq, n_uniq, cand_ids = distinct_pairs(pair_ds)

    # skew telemetry (A4): interior histogram rows + boundary-run sizes —
    # a few rows per block, the only driver-bound traffic in this stage
    small = (
        runs.filter(expr="kind != 0")
        .map_batches(
            lambda b: pa.table({"a": b["a"].cast(pa.int64()),
                                "b": b["b"].cast(pa.int64()),
                                "kind": b["kind"]}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if small.empty:
        small = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64"),
                              "kind": pd.Series(dtype="int8")})
    hist = small[small["kind"] == 2]
    spill = small[small["kind"] == 1]
    histogram: dict[int, int] = {}
    for ln, ct in zip(hist["a"], hist["b"]):
        histogram[int(ln)] = histogram.get(int(ln), 0) + int(ct)
    if len(spill):
        sk = spill["a"].to_numpy(dtype=np.int64)
        order = np.argsort(sk, kind="stable")
        sk = sk[order]
        starts = np.nonzero(np.concatenate(([True], sk[1:] != sk[:-1])))[0]
        lens = np.diff(np.append(starts, sk.size))
        for ln in np.unique(lens):
            histogram[int(ln)] = histogram.get(int(ln), 0) + int((lens == ln).sum())

    hot_sizes = [ln for ln in histogram if ln > cap]
    metrics = {
        "buckets_total": int(sum(histogram.values())),
        "buckets_pairable": int(sum(c for ln, c in histogram.items() if ln >= 2)),
        "buckets_hot": int(sum(histogram[ln] for ln in hot_sizes)),
        "hot_members_max": int(max(hot_sizes)) if hot_sizes else 0,
        "hot_pairs_truncated": bool(hot_sizes),
        "bucket_histogram_top": dict(sorted(histogram.items())[-8:]),
        "candidate_pairs": int(n_uniq),
    }
    return uniq, cand_ids, metrics
