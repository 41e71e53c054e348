"""Distributed connected components: correctness vs a trivial union-find,
order independence, star-forest convergence."""

import numpy as np
import pyarrow as pa
import pytest

from hsearch_ray.reference_impl import UnionFind


def _cc_via_ray(edges, driver_threshold=0):
    """driver_threshold=0 forces the DISTRIBUTED star-contraction path."""
    import ray.data

    from hsearch_ray.stages.unionfind import connected_components

    tbl = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    roots = connected_components(
        ray.data.from_arrow(tbl), driver_threshold=driver_threshold
    )
    out = {}
    for r in roots.take_all():
        out[int(r["file_id"])] = int(r["cluster_id"])
    return out


def _cc_expected(edges):
    uf = UnionFind()
    nodes = set()
    for a, b in edges:
        uf.union(a, b)
        nodes.update((a, b))
    return {n: uf.find(n) for n in nodes}


CASES = [
    [(1, 2)],
    [(1, 2), (2, 3), (3, 4)],                      # chain
    [(10, 1), (10, 2), (10, 3)],                   # star with large hub
    [(1, 2), (3, 4), (5, 6), (2, 3)],              # merge two comps
    [(i, i + 1) for i in range(1, 40)],            # long chain (log rounds)
    [(100, 7), (7, 55), (55, 100), (200, 201)],    # cycle + separate
]


@pytest.mark.parametrize("edges", CASES)
def test_cc_matches_unionfind(ray_session, edges):
    got = _cc_via_ray(edges)
    want = _cc_expected(edges)
    assert got == want


def test_cc_order_independence(ray_session):
    rng = np.random.Generator(np.random.PCG64(3))
    edges = [(int(a), int(b)) for a, b in rng.integers(1, 60, size=(80, 2)) if a != b]
    fwd = _cc_via_ray(edges)
    rev = _cc_via_ray(list(reversed([(b, a) for a, b in edges])))
    assert fwd == rev
    assert fwd == _cc_expected(edges)


def test_cc_empty(ray_session):
    got = _cc_via_ray([])
    assert got == {}


def test_cc_hybrid_matches_distributed(ray_session):
    rng = np.random.Generator(np.random.PCG64(9))
    edges = [(int(a), int(b)) for a, b in rng.integers(1, 80, size=(120, 2)) if a != b]
    assert _cc_via_ray(edges, driver_threshold=0) == _cc_via_ray(
        edges, driver_threshold=10**6
    )


def test_cc_distributed_at_scale(ray_session):
    """The distributed star path on a 10x-plus edge set (mixed chains,
    stars, random clumps) matches the driver union-find — and terminates
    in bounded wall time (the vectorized-segment-scan rewrite; the old
    per-node map_groups version would crawl here)."""
    import time

    rng = np.random.Generator(np.random.PCG64(31))
    edges = [(int(a), int(b)) for a, b in rng.integers(1, 900, size=(1500, 2)) if a != b]
    edges += [(i, i + 1) for i in range(2000, 2150)]          # long chain
    edges += [(3000, 3000 + i) for i in range(1, 200)]        # big star hub
    t0 = time.perf_counter()
    got = _cc_via_ray(edges, driver_threshold=0)
    elapsed = time.perf_counter() - t0
    assert got == _cc_expected(edges)
    assert elapsed < 120, f"distributed CC too slow: {elapsed:.0f}s"


def test_attach_join_matches_broadcast(ray_session):
    """The Dataset.join attach fallback (forced via broadcast_above=0)
    must produce exactly the broadcast-searchsorted attach's output —
    including identity rows for files with no edges and 64-bit hash ids
    that would lose precision through a float null-fill."""
    import ray.data

    from hsearch_ray.stages.unionfind import attach_clusters, connected_components

    big = np.int64(2**62)  # beyond float64's 2^53 integer precision
    edges = pa.table({"a": pa.array([1, 2, big], pa.int64()),
                      "b": pa.array([2, 3, big + 1], pa.int64())})
    corpus = pa.table({"file_id": pa.array(
        [1, 2, 3, 50, 60, big, big + 1, big + 7], pa.int64())})
    roots = connected_components(ray.data.from_arrow(edges))

    def as_map(ds):
        return {int(r["file_id"]): int(r["cluster_id"]) for r in ds.take_all()}

    bc = as_map(attach_clusters(ray.data.from_arrow(corpus), roots))
    jn = as_map(attach_clusters(ray.data.from_arrow(corpus), roots,
                                broadcast_above=0))
    assert jn == bc
    assert bc[50] == 50 and bc[big + 7] == big + 7  # identity fill
    assert bc[big + 1] == bc[big]
