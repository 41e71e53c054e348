"""Property-based tests (hypothesis) over the hashing kernels and the
pair/cluster invariants — the F5 fixture class of FIXTURES.md."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hsearch_ray import hashing as H

uint63 = st.integers(min_value=0, max_value=(1 << 63) - 1)


@given(st.binary(min_size=0, max_size=2000), st.integers(min_value=2, max_value=16))
@settings(max_examples=50, deadline=None)
def test_shingle_hashes_properties(content, k):
    s = H.shingle_hashes(content, k)
    assert s.dtype == np.uint64
    assert np.all(s[:-1] < s[1:])  # sorted strictly unique
    # determinism
    assert np.array_equal(s, H.shingle_hashes(content, k))
    # non-empty content always yields at least one shingle
    assert (s.size > 0) == (len(content) > 0)


@given(st.lists(uint63, min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_jaccard_containment_bounds(vals):
    a = np.unique(np.array(vals, dtype=np.uint64)) if vals else np.empty(0, np.uint64)
    b = a[: a.size // 2]
    j = H.exact_jaccard(a, b)
    c = H.containment(a, b)
    assert 0.0 <= j <= 1.0
    if b.size:
        assert c == 1.0  # b ⊆ a
        assert j == b.size / a.size
    assert H.exact_jaccard(a, a) == 1.0
    # symmetry
    assert H.exact_jaccard(a, b) == H.exact_jaccard(b, a)
    assert H.intersect_count(a, b) == H.intersect_count(b, a)


@given(st.lists(uint63, min_size=1, max_size=400), st.integers(0, 1 << 31))
@settings(max_examples=50, deadline=None)
def test_oph_properties(vals, seed):
    sh = np.unique(np.array(vals, dtype=np.uint64))
    sig = H.minhash_oph(sh, 128, seed)
    assert sig.shape == (128,)
    assert np.array_equal(sig, H.minhash_oph(sh, 128, seed))
    # identical sets collide on every bin
    assert np.all(sig == H.minhash_oph(sh.copy(), 128, seed))
    # permutation invariance of input order is implied by sorted-unique input


@given(st.lists(st.tuples(st.integers(1, 200), st.integers(1, 200)),
                min_size=0, max_size=300))
@settings(max_examples=30, deadline=None)
def test_numpy_cc_matches_unionfind(edges):
    from hsearch_ray.reference_impl import UnionFind
    from hsearch_ray.stages.unionfind import _numpy_cc

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    u = np.array([e[0] for e in edges], dtype=np.int64)
    v = np.array([e[1] for e in edges], dtype=np.int64)
    nodes, labels = _numpy_cc(u, v)
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    want = {n: uf.find(n) for n in set(u) | set(v)}
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == want


@given(st.lists(uint63, min_size=2, max_size=200), st.integers(2, 32))
@settings(max_examples=30, deadline=None)
def test_pairs_within_runs_canonical(vals, cap):
    from hsearch_ray.stages.lsh import _pairs_within_runs

    keys = np.sort(np.array([v % 7 for v in vals], dtype=np.int64))
    fids = np.array(vals[: keys.size], dtype=np.int64)
    a, b = _pairs_within_runs(keys, fids, cap)
    assert np.all(a <= b)  # canonical ordering
    # every emitted pair shares a key
    key_of = {}
    for k, f in zip(keys, fids):
        key_of.setdefault(int(f), set()).add(int(k))
    for x, y in zip(a, b):
        assert key_of[int(x)] & key_of[int(y)]


@given(st.lists(st.binary(min_size=0, max_size=60), min_size=1, max_size=30),
       st.integers(2, 12))
@settings(max_examples=40, deadline=None)
def test_batched_rolling_hash_equals_per_doc(docs, k):
    """The batched signing fast path (one rolling hash over the
    concatenated buffer, boundary-safe slices) must produce EXACTLY the
    per-doc stream for every document — the invariant that keeps the
    distributed path bit-identical to the reference oracle."""
    import pyarrow as pa

    from hsearch_ray import hashing as H

    data = np.frombuffer(b"".join(docs), dtype=np.uint8)
    off = np.cumsum([0] + [len(d) for d in docs])
    full = H.rolling_hash(data, k)
    for i, d in enumerate(docs):
        want = H.shingle_stream(d, k)
        s, e = off[i], off[i + 1]
        if e - s >= k:
            got = full[s : e - k + 1]
        else:
            got = H.shingle_stream(d, k)  # short-content special case
        assert np.array_equal(got, want)


@given(st.lists(st.lists(uint63, min_size=1, max_size=120), min_size=1, max_size=20),
       st.sampled_from([16, 64, 128]))
@settings(max_examples=30, deadline=None)
def test_batch_oph_equals_per_doc(doc_vals, nbins):
    """batch_minhash_oph must be bit-identical to the per-doc kernel for
    arbitrary sorted-unique inputs (incl. docs clustered in one bin)."""
    from hsearch_ray import hashing as H

    docs = [np.unique(np.array(v, dtype=np.uint64)) for v in doc_vals]
    allsh = np.concatenate(docs)
    offsets = np.cumsum([0] + [d.size for d in docs[:-1]], dtype=np.int64)
    got = H.batch_minhash_oph(allsh, offsets, nbins, 42)
    for i, d in enumerate(docs):
        assert np.array_equal(got[i], H.minhash_oph(d, nbins, 42))


@given(st.lists(st.lists(uint63, min_size=0, max_size=80), min_size=1, max_size=16))
@settings(max_examples=30, deadline=None)
def test_segmented_sketch_equals_per_doc_oph_lsb(doc_vals):
    """The prefilter sketch (_segmented_sketch over the packed store
    layout, incl. zero-shingle docs) must equal the per-doc OPH kernel's
    LSBs packed into one uint64 — the b-bit-minhash contract, at any
    chunk boundary."""
    from hsearch_ray import hashing as H
    from hsearch_ray.stages.verify import _segmented_sketch

    docs = [np.unique(np.array(v, dtype=np.uint64)) for v in doc_vals]
    vals = (np.concatenate([d for d in docs if d.size])
            if any(d.size for d in docs) else np.empty(0, np.uint64))
    lens = np.array([d.size for d in docs], dtype=np.int64)
    # tiny chunk size forces multi-chunk paths on small inputs too
    got = _segmented_sketch(vals, lens, seed=42, chunk_shingles=7)
    for i, d in enumerate(docs):
        if d.size == 0:
            assert got[i] == 0
            continue
        bits = H.minhash_oph(d, 64, 42) & np.uint64(1)
        want = np.uint64(0)
        for j in range(64):
            if bits[j]:
                want |= np.uint64(1) << np.uint64(j)
        assert got[i] == want


@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=1, max_size=50),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=200, deadline=None)
def test_int_range_cuts_cover_all_keys(keys, n):
    """Every key routes to exactly one shard and falls inside that
    shard's [lo, hi) range (hi=None for the last): the float64-linspace
    bug dropped keys between a true extreme and its rounded bound."""
    import numpy as np

    from hsearch_ray.hashing import int_range_cuts

    k = np.array(keys, dtype=np.int64)
    lo, hi = int(k.min()), int(k.max())
    end = min(hi, np.iinfo(np.int64).max - 1) + 1
    bounds = int_range_cuts(lo, end, n)
    assert bounds[0] == lo
    assert bounds.size >= 2  # at least one shard even when end <= lo
    bl = [int(b) for b in bounds]  # np.diff would overflow at 2^63 spans
    # interiors strictly increase; the FINAL cut is an exclusive-end
    # marker only (last shard is unbounded above), so it may equal the
    # previous cut when the clamped range collapses to a single point
    # (every key == int64 max)
    assert all(a < b for a, b in zip(bl[:-1], bl[1:-1]))
    assert bl[-1] >= bl[-2]
    sh = (np.searchsorted(bounds[1:-1], k, side="right")
          if bounds.size > 2 else np.zeros(k.size, np.int64))
    last = bounds.size - 2
    for key, s in zip(k, sh):
        assert key >= bounds[s]
        if s != last:
            assert key < bounds[s + 1]


@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), max_size=60),
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 50)), max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_merge_insertion_matches_bisect(rights, probes):
    """_merge_insertion must equal per-probe bisect_left over the
    lex-sorted rights for ANY inputs (probes pre-sorted, the kernel's
    contract)."""
    import bisect

    import numpy as np

    from hsearch_ray.stages.events import _merge_insertion

    rights = sorted(rights)
    probes = sorted(probes)
    ru = np.array([r[0] for r in rights], dtype=np.int64)
    rts = np.array([r[1] for r in rights], dtype=np.int64)
    pu = np.array([p[0] for p in probes], dtype=np.int64)
    pts = np.array([p[1] for p in probes], dtype=np.int64)
    got = _merge_insertion(ru, rts, pu, pts)
    want = [bisect.bisect_left(rights, p) for p in probes]
    assert list(got) == want


@given(st.lists(st.integers(0, 2**64 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_hll_bit_length_and_merge(hashes):
    """The branch-free bit_length must equal Python's int.bit_length,
    and splitting a hash stream anywhere must merge to the whole-stream
    registers."""
    import numpy as np

    from hsearch_ray.stages.sketches import (_bit_length_u64, hll_merge,
                                             hll_partial)

    h = np.array(hashes, dtype=np.uint64)
    assert list(_bit_length_u64(h)) == [int(x).bit_length() for x in hashes]
    whole = hll_partial(h, p=6)
    k = len(hashes) // 2
    parts = np.stack([hll_partial(h[:k], p=6), hll_partial(h[k:], p=6)])
    assert (hll_merge(parts) == whole).all()


@given(
    st.lists(st.integers(-10**6, 10**6), min_size=0, max_size=3000),
    st.integers(1, 7),
    st.integers(4, 64),
)
@settings(max_examples=150, deadline=None)
def test_quantile_summary_rank_error_bound(values, n_blocks, max_samples):
    """The one-per-k block summary must answer every quantile within
    the advertised rank bound sum_b ceil(n_b / max_samples) regardless
    of how the data is partitioned into blocks, and weights must sum
    to n (the mergeable-aggregate mass-conservation law)."""
    from hsearch_ray.stages.sketches import (quantile_summary_partial,
                                             quantile_summary_query)

    v = np.array(values, dtype=np.int64)
    if v.size == 0:
        sv, sw = quantile_summary_partial(v, max_samples)
        assert sv.size == 0 and sw.size == 0
        return
    cuts = np.linspace(0, v.size, n_blocks + 1).astype(int)
    samples, weights, bound = [], [], 0
    for i in range(n_blocks):
        blk = v[cuts[i]:cuts[i + 1]]
        if blk.size == 0:
            continue
        sv, sw = quantile_summary_partial(blk, max_samples)
        assert int(sw.sum()) == blk.size
        assert (np.diff(sv) >= 0).all()
        samples.append(sv)
        weights.append(sw)
        bound += -(-blk.size // max_samples)  # per-block k = ceil(n_b/m)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    est = quantile_summary_query(np.concatenate(samples),
                                 np.concatenate(weights), qs)
    exact = np.sort(v)
    n = v.size
    for q, e in zip(qs, est):
        target = min(n, max(1, int(np.ceil(q * n))))  # 1-based exact rank
        # rank of the estimate in the exact order must be within the
        # advertised bound (2x: one k_b for the sample spacing, one for
        # the <=-vs-< tie rounding at the merge)
        lo = np.searchsorted(exact, e, side="left") + 1
        hi = np.searchsorted(exact, e, side="right")
        assert lo - 2 * bound <= target <= hi + 2 * bound
