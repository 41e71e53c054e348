"""Single-process NumPy reference implementation (the oracle).

This is the "reference cluster assignments" of the north rule: the
identical shingle/signature/LSH/verify/union-find algorithm run in one
process over in-memory arrays, against which the distributed Ray
pipeline must achieve dup-pair recall >= 0.99 (BASELINE.json).  It
plays the role of the reference's brute-force + evaluator pair
(/root/reference/hclust/src/hclust/motif_both_points_noLSH.cpp:36-56,
motif_both_points.cpp:100-165) — with the LSH path computed exactly and
an optional all-pairs brute-force oracle for recall bounding.

It shares every kernel with the distributed path via ``hashing`` —
same seeds => bit-identical signatures.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig


class UnionFind:
    """Path-compressing union-find; union-by-min-root so cluster ids are
    order-independent (unlike the reference's greedy insertion-order
    clustering, hclust2.cpp:116-131; union-find scaffold at
    pcluster/src/pcluster/union_find.cpp:16-33)."""

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


@dataclass
class ReferenceResult:
    file_ids: np.ndarray          # int64, one per input row
    sha256: list[str]
    pairs: pa.Table               # a,b (a<b), jaccard, method
    clusters: pa.Table            # file_id, cluster_id


def _prep(corpus: pa.Table, cfg: PipelineConfig):
    repo = corpus["repo"].to_pylist()
    path = corpus["path"].to_pylist()
    commit = corpus["commit"].to_pylist()
    contents = [c.encode() for c in corpus["content"].to_pylist()]
    fids = np.array(
        [H.file_id_from_key(r, p, c) for r, p, c in zip(repo, path, commit)],
        dtype=np.int64,
    )
    sha = [H.sha256_hex(c) for c in contents]
    return fids, sha, contents


def run_reference(
    corpus: pa.Table, cfg: PipelineConfig | None = None
) -> ReferenceResult:
    """LSH-path oracle: exact dedup -> minhash -> bands -> all-pairs within
    buckets -> exact Jaccard >= threshold -> union-find -> clusters."""
    cfg = cfg or PipelineConfig()
    fids, sha, contents = _prep(corpus, cfg)
    n = len(contents)

    # exact dedup on raw sha256: keep-first by min file_id, exact edges
    by_sha: dict[str, list[int]] = {}
    for i in range(n):
        by_sha.setdefault(sha[i], []).append(i)
    uf = UnionFind()
    rep_rows: list[int] = []
    exact_pairs: list[tuple[int, int]] = []
    for _, rows in by_sha.items():
        rows.sort(key=lambda i: fids[i])
        rep_rows.append(rows[0])
        for j in rows[1:]:
            a, b = sorted((int(fids[rows[0]]), int(fids[j])))
            exact_pairs.append((a, b))
            uf.union(a, b)

    # signatures over unique contents (normalized for similarity space);
    # scheme dispatch shared with the distributed Signer => bit-identical
    a_p, b_p = (
        H.perm_params(cfg.seed, cfg.num_perms)
        if cfg.minhash_scheme == "perms"
        else (None, None)
    )
    shingle_sets: dict[int, np.ndarray] = {}
    sigs: dict[int, np.ndarray] = {}
    for i in rep_rows:
        raw = contents[i]
        if not (cfg.min_content_len <= len(raw) <= cfg.max_content_len):
            continue
        norm = H.normalize_for_shingles(raw, cfg.token_canonicalize)
        sh = H.shingle_hashes(norm, cfg.shingle_k)
        fid = int(fids[i])
        shingle_sets[fid] = sh
        sigs[fid] = (
            H.minhash_oph(sh, cfg.num_perms, cfg.seed)
            if cfg.minhash_scheme == "oph"
            else H.minhash_signature(sh, a_p, b_p)
        )

    # LSH banding -> buckets -> all-pairs candidates (oracle is exhaustive
    # within buckets; the distributed path may cap hot buckets)
    buckets: dict[tuple[int, int], list[int]] = {}
    for fid, sig in sigs.items():
        bh = H.band_hashes(sig, cfg.num_bands, cfg.rows_per_band)
        for band in range(cfg.num_bands):
            buckets.setdefault((band, int(bh[band])), []).append(fid)

    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))

    # exact Jaccard verification
    verified: list[tuple[int, int, float]] = []
    for a, b in sorted(cand):
        jac = H.exact_jaccard(shingle_sets[a], shingle_sets[b])
        if jac >= cfg.jaccard_threshold:
            verified.append((a, b, jac))
            uf.union(a, b)

    pairs = pa.table(
        {
            "a": pa.array(
                [p[0] for p in exact_pairs] + [v[0] for v in verified], pa.int64()
            ),
            "b": pa.array(
                [p[1] for p in exact_pairs] + [v[1] for v in verified], pa.int64()
            ),
            "jaccard": pa.array(
                [1.0] * len(exact_pairs) + [v[2] for v in verified], pa.float64()
            ),
            "method": pa.array(
                ["exact"] * len(exact_pairs) + ["minhash_lsh"] * len(verified),
                pa.string(),
            ),
        }
    )
    cluster_ids = np.array([uf.find(int(f)) for f in fids], dtype=np.int64)
    clusters = pa.table(
        {"file_id": pa.array(fids, pa.int64()), "cluster_id": pa.array(cluster_ids, pa.int64())}
    )
    return ReferenceResult(file_ids=fids, sha256=sha, pairs=pairs, clusters=clusters)


def brute_force_pairs(
    corpus: pa.Table, cfg: PipelineConfig | None = None, margin: float = 0.1
) -> pa.Table:
    """All-pairs exact-Jaccard oracle (F3; analog of
    motif_both_points_noLSH.cpp:36-56).  Small scale only — O(n^2)."""
    cfg = cfg or PipelineConfig()
    fids, sha, contents = _prep(corpus, cfg)
    sets: dict[int, np.ndarray] = {}
    for i, raw in enumerate(contents):
        norm = H.normalize_for_shingles(raw, cfg.token_canonicalize)
        sets[int(fids[i])] = H.shingle_hashes(norm, cfg.shingle_k)
    ids = sorted(sets)
    rows = []
    thr = cfg.jaccard_threshold - margin
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = H.exact_jaccard(sets[ids[i]], sets[ids[j]])
            if jac >= thr:
                con = H.containment(sets[ids[i]], sets[ids[j]])
                rows.append((ids[i], ids[j], jac, con))
    return pa.table(
        {
            "a": pa.array([r[0] for r in rows], pa.int64()),
            "b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
            "containment": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def cluster_pairs(clusters: pa.Table) -> set[tuple[int, int]]:
    """Co-membership pair set of a (file_id, cluster_id) table, excluding
    singletons — the unit of dup-pair recall (north rule)."""
    fid = clusters["file_id"].to_numpy(zero_copy_only=False)
    cid = clusters["cluster_id"].to_numpy(zero_copy_only=False)
    groups: dict[int, list[int]] = {}
    for f, c in zip(fid, cid):
        groups.setdefault(int(c), []).append(int(f))
    out: set[tuple[int, int]] = set()
    for members in groups.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out
