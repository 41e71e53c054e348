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
