"""Kernel unit tests: determinism, edge cases, algebraic properties."""

import numpy as np
import pytest

from hsearch_ray import hashing as H


def test_shingle_determinism():
    a = H.shingle_hashes(b"the quick brown fox jumps", 5)
    b = H.shingle_hashes(b"the quick brown fox jumps", 5)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint64
    assert np.all(a[:-1] < a[1:])  # sorted unique


def test_shingle_edge_cases():
    assert H.shingle_hashes(b"", 9).size == 0
    short = H.shingle_hashes(b"ab", 9)
    assert short.size == 1  # whole-content shingle
    assert H.shingle_hashes(b"ab", 9)[0] == H.shingle_hashes(b"ab", 2)[0]


def test_crlf_normalization():
    lf = H.normalize_for_shingles(b"a\nb\nc")
    crlf = H.normalize_for_shingles(b"a\r\nb\r\nc")
    assert lf == crlf
    assert H.sha256_hex(b"a\nb\nc") != H.sha256_hex(b"a\r\nb\r\nc")


def test_minhash_jaccard_estimate():
    rng = np.random.Generator(np.random.PCG64(0))
    base = rng.integers(0, 1 << 63, size=2000, dtype=np.uint64)
    x = np.unique(base)
    y = np.unique(np.concatenate([base[:1600], rng.integers(0, 1 << 63, 400, dtype=np.uint64)]))
    true_j = H.exact_jaccard(x, y)
    a, b = H.perm_params(42, 128)
    est = (H.minhash_signature(x, a, b) == H.minhash_signature(y, a, b)).mean()
    assert abs(est - true_j) < 0.15


def test_oph_jaccard_estimate():
    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.integers(0, 1 << 63, size=3000, dtype=np.uint64)
    x = np.unique(base)
    y = np.unique(np.concatenate([base[:2400], rng.integers(0, 1 << 63, 600, dtype=np.uint64)]))
    true_j = H.exact_jaccard(x, y)
    sx = H.minhash_oph(x, 128, seed=42)
    sy = H.minhash_oph(y, 128, seed=42)
    est = (sx == sy).mean()
    assert abs(est - true_j) < 0.15


def test_oph_determinism_and_edges():
    x = np.unique(np.random.Generator(np.random.PCG64(1)).integers(0, 1 << 63, 40, dtype=np.uint64))
    a = H.minhash_oph(x, 128, seed=42)  # 40 shingles -> many empty bins
    b = H.minhash_oph(x, 128, seed=42)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint64
    assert np.all(H.minhash_oph(np.empty(0, np.uint64), 128, 42) == np.uint64(0xFFFFFFFFFFFFFFFF))
    with pytest.raises(ValueError):
        H.minhash_oph(x, 100, seed=42)


def test_minhash_empty_sentinel():
    a, b = H.perm_params(42, 128)
    sig = H.minhash_signature(np.empty(0, dtype=np.uint64), a, b)
    assert np.all(sig == np.uint64(0xFFFFFFFFFFFFFFFF))


def test_band_hash_batch_matches_single():
    a, b = H.perm_params(42, 128)
    s1 = H.minhash_signature(H.shingle_hashes(b"x" * 50 + b"abcdef", 9), a, b)
    s2 = H.minhash_signature(H.shingle_hashes(b"totally different content here", 9), a, b)
    batch = H.band_hashes(np.stack([s1, s2]), 16, 8)
    assert np.array_equal(batch[0], H.band_hashes(s1, 16, 8))
    assert np.array_equal(batch[1], H.band_hashes(s2, 16, 8))


def test_hamming():
    assert H.hamming64(np.uint64(0), np.uint64(0)) == 0
    assert H.hamming64(np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0)) == 64
    arr = H.hamming64(np.array([1, 3], dtype=np.uint64), np.array([0, 0], dtype=np.uint64))
    assert list(arr) == [1, 2]


def test_jaccard_and_containment():
    x = np.array([1, 2, 3, 4], dtype=np.uint64)
    y = np.array([3, 4, 5, 6, 7, 8], dtype=np.uint64)
    assert H.exact_jaccard(x, y) == pytest.approx(2 / 8)
    assert H.containment(x, y) == pytest.approx(2 / 4)
    assert H.exact_jaccard(x, x) == 1.0


def test_winnowing_substring_sharing():
    base = b"def f(x):\n    return x + 1\n" * 8
    big = base + b"def g(y):\n    return y * 2\n" * 8
    f1 = H.winnow_fingerprints(H.shingle_stream(base, 9), 16)
    f2 = H.winnow_fingerprints(H.shingle_stream(big, 9), 16)
    shared = np.intersect1d(f1, f2).size
    assert shared >= 1  # containment pair shares window minima


def test_file_id_positive_int63():
    fid = H.file_id_from_key("org/repo", "src/a.py", "deadbeef")
    assert 0 < fid < 1 << 63
    assert fid == H.file_id_from_key("org/repo", "src/a.py", "deadbeef")
