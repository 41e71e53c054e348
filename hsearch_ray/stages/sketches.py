"""Mergeable-sketch aggregates: HyperLogLog approximate distinct count.

At 100-TB scale an EXACT distinct count over a high-cardinality key
(vocabulary, URL set, shingle universe) is a full all-to-all shuffle of
every key (the `top_tokens_docs` path); when a ~1% answer is enough,
HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, AofA 2007) replaces it
with ONE 2^p-byte register array per block and a driver max-merge —
no shuffle at all.  The register layout, bias constant and
linear-counting small-range correction follow the published paper; the
hash is the repo-standard deterministic polars utf8 hash, so the
estimate is exactly reproducible run to run.

The sketch is MERGEABLE (element-wise max), which is what makes it a
legal distributed aggregate: registers from any block partitioning
merge to the identical array (pinned by test) — the property a
combiner-style plan needs at any cluster size.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    x = x.copy()
    n = np.zeros(x.shape, U64)
    for s in (32, 16, 8, 4, 2, 1):
        s = U64(s)
        m = x >= (U64(1) << s)
        n[m] += s
        x[m] >>= s
    n += (x > 0)
    return n.astype(np.int64)


def hll_partial(hashes: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8, size 2^p) for one batch of 64-bit hashes.

    Bucket = top p bits; rho = position of the first 1-bit in the
    remaining 64-p bits (1-based; all-zero suffix -> 64-p+1)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if hashes.size == 0:
        return regs
    h = hashes.astype(U64, copy=False)
    idx = (h >> U64(64 - p)).astype(np.int64)
    w = (h << U64(p)) & U64(0xFFFFFFFFFFFFFFFF)
    rho = np.where(w == 0, 64 - p + 1, 64 - _bit_length_u64(w) + 1).astype(
        np.uint8
    )
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(reg_rows: np.ndarray) -> np.ndarray:
    """Element-wise max over stacked register rows (the mergeable-
    aggregate combine)."""
    return np.maximum.reduce(reg_rows, axis=0)


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected HLL estimate with the small-range linear-counting
    correction (the 64-bit-hash variant needs no large-range term)."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.ldexp(1.0, -regs.astype(np.int64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))


I64 = np.int64


def quantile_summary_partial(
    values: np.ndarray, max_samples: int = 1024
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block epsilon-approximate quantile summary: sort the block
    and keep every k-th order statistic with weight k, where
    k = ceil(n/max_samples) (a trailing remainder r attaches to the
    block maximum with weight r) — the uniform one-per-k summary of
    Manku, Rajagopalan & Lindsay (SIGMOD 1998).  Any rank inside the
    block is answered within k, and because blocks PARTITION the data,
    merged summaries answer any global rank within
    sum_b k_b <= n/max_samples + n_blocks — the mergeable-aggregate
    property that makes this a legal one-pass distributed quantile
    (contrast the exact multi-pass histogram recursion).

    Returns (sample values ascending, int64 weights); weights sum to n.
    """
    v = np.asarray(values)
    if v.size == 0:
        return np.empty(0, v.dtype), np.empty(0, I64)
    a = np.sort(v)
    n = a.size
    k = -(-n // max_samples)  # ceil(n / max_samples)
    full = n // k
    idx = np.arange(1, full + 1, dtype=np.int64) * k - 1
    w = np.full(full, k, I64)
    r = n - full * k
    if r:
        idx = np.append(idx, n - 1)
        w = np.append(w, I64(r))
    return a[idx], w


def quantile_summary_query(
    vals: np.ndarray, weights: np.ndarray, qs
) -> np.ndarray:
    """Answer quantile queries from merged weighted samples: sort by
    value, cumulative-sum the weights, and return for each q the
    smallest sample whose cumulative weight reaches ceil(q * n) — the
    lower weighted-quantile convention, deterministic for a fixed
    sample multiset."""
    order = np.argsort(vals, kind="stable")
    v = np.asarray(vals)[order]
    cw = np.cumsum(np.asarray(weights, I64)[order])
    n = int(cw[-1])
    out = []
    for q in qs:
        target = min(n, max(1, int(np.ceil(float(q) * n))))
        out.append(v[int(np.searchsorted(cw, target))])
    return np.asarray(out)
