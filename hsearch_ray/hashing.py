"""Deterministic, vectorized hashing kernels shared by the distributed
pipeline and the single-process oracle (``reference_impl``).

Everything here is a pure function of ``(config.seed, input bytes)`` —
no wall-clock, no global RNG — so retried Ray tasks reproduce identical
rows and the distributed path is bit-identical to the oracle
(BASELINE.json: recall >= 0.99 "at the same shingle/signature config").

Reference analogs (/root/reference):
  - rolling shingle hash  <- k-mer windowing, hclust/src/hclust/kmer_search.cpp:68-81
    and base-k integer packing, pcluster/src/pcluster/util.hpp:244-266
  - minhash permutations  <- the L x K p-stable hash family, hclust/src/hclust/lsh.hpp:10-59
  - simhash               <- cosine-LSH sign bits over the bag-of-shingles,
    pcluster/src/pcluster/lsh.cpp:40-49
  - band hash             <- concatenated bucket-index key, hclust/src/hclust/hclust.cpp:166-173
The reference seeds all of these from ``srand(time(NULL))`` (non-reproducible,
lsh.hpp:19-20); here every family derives from ``(seed, band)``.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_MASK64 = U64(0xFFFFFFFFFFFFFFFF)
# polynomial base for the rolling shingle hash (odd, high-entropy)
_POLY_BASE = U64(0x100000001B3)  # FNV-1a prime
# splitmix64 constants (public-domain mixer, Steele et al.)
_SM_GAMMA = U64(0x9E3779B97F4A7C15)
_SM_M1 = U64(0xBF58476D1CE4E5B9)
_SM_M2 = U64(0x94D049BB133111EB)

_ERRSTATE = {"over": "ignore"}  # uint64 arithmetic is intentionally mod 2^64


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """Finalizing mixer; uint64 in, uint64 out (vectorized)."""
    with np.errstate(**_ERRSTATE):
        z = (np.asarray(x, dtype=U64) + _SM_GAMMA) & _MASK64
        z = ((z ^ (z >> U64(30))) * _SM_M1) & _MASK64
        z = ((z ^ (z >> U64(27))) * _SM_M2) & _MASK64
        return z ^ (z >> U64(31))


def int_range_cuts(lo: int, hi_end: int, n: int) -> np.ndarray:
    """n+1 cut points partitioning [lo, hi_end) into n near-equal
    integer ranges, in EXACT Python-int arithmetic.  np.linspace works
    in float64, whose ulp near 2^63 is 2^11: computed bounds can land
    INSIDE the true key range, and range-masked shard builders then
    silently drop keys between the true extreme and the rounded bound
    (full-range hash keys hit this; sequential ids never did).

    The final cut is an exclusive-END MARKER only: callers treat the
    last shard as unbounded above (they pass hi=None for it), so when
    the representable range collapses to a single point (every key ==
    int64 max, so the clamped hi_end == lo) the result is [lo, lo] —
    one unbounded shard — rather than zero shards that drop every key."""
    if hi_end <= lo:
        return np.array([lo, lo], dtype=np.int64)
    return np.unique(np.array(
        [lo + (hi_end - lo) * s // n for s in range(n + 1)],
        dtype=np.int64,
    ))


def perm_params(seed: int, num_perms: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift permutation parameters, a odd, shape (num_perms,).

    Derived from a PCG64 stream keyed on the seed — identical on every
    worker; regenerated per actor instead of shipped (SURVEY.md §2.3 T1).
    """
    rng = np.random.Generator(np.random.PCG64(seed ^ 0xA5A5_0001))
    a = rng.integers(1, 1 << 63, size=num_perms, dtype=np.uint64) * U64(2) + U64(1)
    b = rng.integers(0, 1 << 63, size=num_perms, dtype=np.uint64)
    return a, b


import re as _re

# module-level compiled patterns (T7 constant pattern): identifier tokens
# and horizontal-whitespace runs.  \x01 cannot occur in an identifier, so
# canonicalization is idempotent.
_IDENT_RE = _re.compile(rb"[A-Za-z_][A-Za-z0-9_]*")
_WS_RE = _re.compile(rb"[ \t]+")


def normalize_for_shingles(content: bytes, canonicalize: bool = False) -> bytes:
    """Similarity-space normalization: CRLF -> LF always; with
    ``canonicalize`` (config ``token_canonicalize``, the M6 analog of the
    reference's compressed-alphabet encode, hash_search.cpp:34-75
    murphy10), identifier tokens additionally collapse to one symbol and
    whitespace runs to one space, so rename-only / reformat-only clones
    share shingles.  A recall lever with a documented precision cost —
    structure, literals and punctuation still distinguish files.

    sha256 / exact dedup stays on RAW bytes (FIXTURES.md F5: CRLF and LF
    variants share shingles but keep distinct sha256).
    """
    out = content.replace(b"\r\n", b"\n") if b"\r" in content else content
    if canonicalize:
        out = _IDENT_RE.sub(b"\x01", out)
        out = _WS_RE.sub(b" ", out)
    return out


def shingle_hashes(content: bytes, k: int) -> np.ndarray:
    """Unique uint64 hashes of all k-byte shingles of ``content`` (sorted).

    Rolling polynomial hash over raw bytes (UTF-8 level, per SURVEY.md §7.3
    determinism requirement) followed by a splitmix64 finalizer.  Contents
    shorter than k yield one whole-content shingle; empty -> empty array.
    """
    return np.unique(shingle_stream(content, k))


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """128-perm (len(a)) MinHash signature of a unique-shingle array.

    sig[p] = min over s of (a[p]*s + b[p]) mod 2^64.  Empty shingle set
    -> all-max sentinel (never collides into LSH buckets of real files
    because band hashes mix in the band id).
    """
    if shingles.size == 0:
        return np.full(a.shape[0], _MASK64, dtype=U64)
    offs = np.array([0], dtype=np.int64)
    return batch_minhash(shingles, offs, a, b)[0]


def batch_minhash(
    allsh: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray,
    max_elems: int = 50_000,
) -> np.ndarray:
    """MinHash for many documents at once: ``allsh`` is the concatenation
    of every doc's (non-empty) unique-shingle array, ``offsets`` the start
    index of each doc.  Processes doc ranges of <= max_elems shingles with
    all permutations at once and segment-reduces via np.minimum.reduceat
    (micro-benchmarked ~10x faster than per-document kernels; the
    (P, max_elems) temporary stays cache/actor-memory friendly).
    Returns (ndocs, num_perms) uint64.  Docs with zero shingles must be
    excluded by the caller (sentinel handling in minhash_signature)."""
    ndocs = offsets.size
    P = a.shape[0]
    out = np.empty((ndocs, P), dtype=U64)
    ends = np.append(offsets[1:], allsh.size)
    i = 0
    with np.errstate(**_ERRSTATE):
        while i < ndocs:
            j = i
            while j < ndocs and ends[j] - offsets[i] <= max_elems:
                j += 1
            if j == i:  # single doc larger than max_elems
                j = i + 1
            sub = allsh[offsets[i] : ends[j - 1]]
            so = offsets[i:j] - offsets[i]
            vals = a[:, None] * sub[None, :] + b[:, None]
            out[i:j] = np.minimum.reduceat(vals, so, axis=1).T
            i = j
    return out


def minhash_oph(shingles: np.ndarray, num_bins: int, seed: int) -> np.ndarray:
    """One-Permutation-Hashing MinHash (Li et al., NIPS 2012) with
    densification (Shrivastava, ICML 2017 'optimal densification' — here
    the deterministic rotation variant): split the 64-bit hash space
    into ``num_bins`` equal ranges by the TOP bits and take each range's
    minimum.  Because per-doc shingle arrays are sorted-unique, every
    bin minimum is simply the element at a searchsorted boundary —
    O(bins·log n) per doc and no (bins x n) temporary, unlike the
    classic independent-permutation kernel which is memory-bandwidth
    bound at many cores.

    Empty bins borrow the next non-empty bin's value (cyclic
    forward-fill) mixed with the bin index — deterministic, so two docs
    empty in the same bin that borrow equal values still collide, and
    distinct bins never alias.  Empty shingle set -> all-max sentinel.
    """
    if shingles.size == 0:
        return np.full(num_bins, _MASK64, dtype=U64)
    if num_bins & (num_bins - 1):
        raise ValueError("num_bins must be a power of two")
    # bin k covers [k << shift_bits, (k+1) << shift_bits)
    shift_bits = 64 - int(np.log2(num_bins))
    edges = (np.arange(num_bins + 1, dtype=U64) << U64(shift_bits)) & _MASK64
    edges[-1] = _MASK64  # top edge inclusive guard
    idx = np.searchsorted(shingles, edges[:-1], side="left")
    idx_next = np.append(idx[1:], shingles.size)
    nonempty = idx < idx_next
    sig = np.empty(num_bins, dtype=U64)
    sig[nonempty] = shingles[idx[nonempty]]
    if not nonempty.all():
        # cyclic forward-fill from the next non-empty bin, then mix in the
        # bin index so runs of empty bins don't produce identical values
        order = np.nonzero(nonempty)[0]
        empty = np.nonzero(~nonempty)[0]
        src = order[np.searchsorted(order, empty) % order.size]
        sig[empty] = splitmix64(sig[src] ^ (empty.astype(U64) * _SM_GAMMA))
    # final per-bin mix decorrelates bins that captured the same low-range
    # minima across docs with very different set sizes
    return splitmix64(sig ^ (np.arange(num_bins, dtype=U64) * _SM_M1))


def batch_minhash_oph(allsh: np.ndarray, offsets: np.ndarray,
                      num_bins: int, seed: int) -> np.ndarray:
    """minhash_oph for many documents in one vectorized pass —
    BIT-IDENTICAL to the per-document kernel (property-tested).

    ``allsh`` concatenates each doc's SORTED-unique shingle array (all
    docs non-empty), ``offsets`` the start index per doc.  Because each
    doc's values are ascending and a value's bin is its top bits, the
    (doc, bin) key is non-decreasing over the concatenation; run starts
    therefore mark every non-empty bin's minimum.  Densification (the
    cyclic next-non-empty fill) and the final per-bin mix are computed
    as whole-matrix operations."""
    if num_bins & (num_bins - 1):
        raise ValueError("num_bins must be a power of two")
    ndocs = offsets.size
    shift = np.uint64(64 - int(np.log2(num_bins)))
    counts = np.diff(np.append(offsets, allsh.size))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    bins = (allsh >> shift).astype(np.int64)
    combined = doc_idx * num_bins + bins
    starts = np.nonzero(np.concatenate(([True], combined[1:] != combined[:-1])))[0]
    mat = np.zeros(ndocs * num_bins, dtype=U64)
    ne = np.zeros(ndocs * num_bins, dtype=bool)
    mat[combined[starts]] = allsh[starts]
    ne[combined[starts]] = True
    mat = mat.reshape(ndocs, num_bins)
    ne = ne.reshape(ndocs, num_bins)
    if not ne.all():
        col = np.arange(num_bins, dtype=np.int64)
        # next non-empty column >= j (cyclic): right-to-left suffix min of
        # positions, wrapping to the row's first non-empty + num_bins
        pos = np.where(ne, col[None, :], 2 * num_bins)
        sufmin = np.minimum.accumulate(pos[:, ::-1], axis=1)[:, ::-1]
        first_ne = sufmin[:, :1]  # min position == first non-empty column
        nxt = np.where(sufmin < num_bins, sufmin, first_ne + num_bins) % num_bins
        rows = np.arange(ndocs, dtype=np.int64)[:, None]
        fill = splitmix64(mat[rows, nxt] ^ (col[None, :].astype(U64) * _SM_GAMMA))
        mat = np.where(ne, mat, fill)
    return splitmix64(mat ^ (np.arange(num_bins, dtype=U64)[None, :] * _SM_M1))


_BIT_SHIFTS = np.arange(64, dtype=U64)


def simhash64(shingles: np.ndarray) -> np.uint64:
    """64-bit SimHash of the unique-shingle set (sign of per-bit vote sum)."""
    if shingles.size == 0:
        return U64(0)
    return batch_simhash(shingles, np.array([0], dtype=np.int64))[0]


def batch_simhash(allsh: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """SimHash for many documents at once (see batch_minhash for the
    layout).  Bit votes come from np.unpackbits over the little-endian
    byte view (8x less memory traffic than a 64-wide int64 matrix) and
    are segment-summed with np.add.reduceat.  Returns (ndocs,) uint64."""
    counts = np.diff(np.append(offsets, allsh.size))
    # bits[i, j] = bit j of shingle i, j indexed LSB-first
    bytes_ = allsh.astype("<u8").view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(bytes_, axis=1, bitorder="little")  # (n, 64) uint8
    # accumulate in int64 via the ufunc's buffered cast — an explicit
    # bits.astype(int64) materializes an 8x copy (512 MB per 1M shingles),
    # which made the store-build simhash pass memory-bandwidth-bound
    votes = np.add.reduceat(bits, offsets, axis=0, dtype=np.int64)  # (ndocs, 64)
    majority = (2 * votes) > counts[:, None]
    weights = (U64(1) << _BIT_SHIFTS)[None, :]
    return np.bitwise_or.reduce(np.where(majority, weights, U64(0)), axis=1)


def oph_sketch64(allsh: np.ndarray, offsets: np.ndarray, seed: int) -> np.ndarray:
    """64-bit b-bit minwise sketch: the LSB of each of 64 OPH minhash
    bins, packed into one uint64 per doc (1-bit × 64-bin b-bit minwise
    hashing — Li & König, "b-Bit Minwise Hashing", WWW 2010).  Two docs
    with Jaccard J agree on each bit with probability ≈ (1+J)/2, so
    hamming64(sketch_a, sketch_b) ~ Binomial(64, (1-J)/2) — a cheap
    similarity gate ~180x cheaper to build than SimHash bit votes
    (the OPH kernel reads each shingle once; no bit unpacking).
    Layout contract matches batch_minhash_oph: ``allsh`` concatenates
    per-doc SORTED-unique shingle arrays, all docs non-empty."""
    sig = batch_minhash_oph(allsh, offsets, 64, seed)
    lsb = (sig & U64(1)).astype(np.uint8)
    return np.packbits(lsb, axis=1, bitorder="little").view(np.uint64).ravel()


def band_hashes(sig: np.ndarray, num_bands: int, rows_per_band: int) -> np.ndarray:
    """Fold each band's row slice of the signature into one uint64 key.

    Mixes the band id into the accumulator so identical row values in
    different bands never collide (replaces the reference's per-table
    string keys, hclust.cpp:166-173).  Works on a single signature
    (num_perms,) or a batch (n, num_perms) -> (n, num_bands).
    """
    single = sig.ndim == 1
    s = sig.reshape(-1, num_bands, rows_per_band)
    with np.errstate(**_ERRSTATE):
        acc = splitmix64(np.arange(num_bands, dtype=U64))[None, :] * np.ones(
            (s.shape[0], 1), dtype=U64
        )
        for r in range(rows_per_band):
            acc = splitmix64((acc ^ s[:, :, r]) & _MASK64)
    return acc[0] if single else acc


def hamming64(x: np.ndarray | int, y: np.ndarray | int) -> np.ndarray | int:
    """Popcount of xor — SimHash distance (F1 analog: popcount(x^y))."""
    v = np.bitwise_xor(np.asarray(x, dtype=U64), np.asarray(y, dtype=U64))
    # vectorized popcount via unpackbits on the byte view
    b = v.reshape(-1).view(np.uint8)
    cnt = np.unpackbits(b).reshape(-1, 8 * v.dtype.itemsize).sum(axis=1)
    return cnt.reshape(np.shape(v)) if np.ndim(v) else int(cnt[0])


def intersect_count(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| for two SORTED-unique arrays in O(small * log(big)) via
    searchsorted (np.intersect1d re-sorts; this doesn't)."""
    if a.size == 0 or b.size == 0:
        return 0
    small, big = (a, b) if a.size <= b.size else (b, a)
    idx = np.searchsorted(big, small)
    idx[idx == big.size] = big.size - 1
    return int(np.count_nonzero(big[idx] == small))


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 arrays (verification;
    analog of the exact Euclidean check, kmer_search.cpp:107-111)."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = intersect_count(a, b)
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def containment(a: np.ndarray, b: np.ndarray) -> float:
    """|A ∩ B| / min(|A|,|B|) — near-containment score (SURVEY.md §7.3)."""
    m = min(a.size, b.size)
    if m == 0:
        return 0.0
    return intersect_count(a, b) / m


def sha256_hex(content: bytes) -> str:
    return hashlib.sha256(content).hexdigest()


def file_id_from_key(repo: str, path: str, commit: str) -> int:
    """Deterministic 63-bit row id from the (repo, path, commit) key.

    63 bits (top bit clear) so the id round-trips losslessly through
    int64 engines (DuckDB oracle).  At the 10^12-row design scale this
    widens to binary(16) of the same digest; the pipeline only relies
    on ids being unique + orderable, not on their width.
    """
    h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def winnow_fingerprints(shingle_stream: np.ndarray, window: int) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD 2003): per sliding window of
    ``window`` consecutive shingle hashes keep the minimum -> unique
    fingerprints.  ``shingle_stream`` is the POSITIONAL (non-unique)
    rolling-hash stream.  This is the scalable stand-in for the
    reference's global suffix-array shared-substring pass
    (suffix_array.cpp:72-84, gen_kmers_from_suffix_array.cpp:51-65):
    two files sharing a long substring share its window minima.
    """
    n = shingle_stream.size
    if n == 0:
        return np.empty(0, dtype=U64)
    if n <= window:
        return np.unique(shingle_stream.min(keepdims=True))
    w = np.lib.stride_tricks.sliding_window_view(shingle_stream, window)
    return np.unique(w.min(axis=1))


def rolling_hash(b: np.ndarray, k: int) -> np.ndarray:
    """Vectorized k-byte polynomial rolling hash over a uint8 array:
    out[p] = hash of b[p : p+k] for every position.  One pass of k
    multiply-adds over the WHOLE array — callers batching many documents
    hash their concatenated buffer once and slice per document (windows
    crossing document boundaries are simply not sliced)."""
    n = b.size - k + 1
    if n <= 0:
        return np.empty(0, dtype=U64)
    with np.errstate(**_ERRSTATE):
        acc = np.zeros(n, dtype=U64)
        for j in range(k):
            acc = (acc * _POLY_BASE + b[j : j + n]) & _MASK64
    return splitmix64(acc)


def shingle_stream(content: bytes, k: int) -> np.ndarray:
    """Positional (non-unique) rolling-hash stream — input to winnowing.
    Contents shorter than k hash as one whole-content shingle."""
    b = np.frombuffer(content, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=U64)
    if b.size < k:
        k = b.size
    return rolling_hash(b, k)
