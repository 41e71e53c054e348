"""PageRank over an edge Dataset: bit-equality with the identical-
arithmetic local reference across block layouts, agreement with float
power iteration, and hub detection on a planted star."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from hsearch_ray.stages.graph import UNIT, pagerank, pagerank_local


def _edges_tbl(edges: np.ndarray) -> pa.Table:
    return pa.table({"a": pa.array(edges[:, 0], pa.int64()),
                     "b": pa.array(edges[:, 1], pa.int64())})


def _many_blocks(tbl, n=11):
    step = max(1, tbl.num_rows // n)
    return ray.data.from_arrow(
        [tbl.slice(i, step) for i in range(0, tbl.num_rows, step)]
    )


def _float_pr(edges: np.ndarray, d=0.85, iters=60):
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:src.size], inv[src.size:]
    n = nodes.size
    deg = np.bincount(si, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = d * r[si] / deg[si]
        r = np.zeros(n)
        np.add.at(r, di, c)
        r += (1 - d) / n
    return dict(zip(nodes.tolist(), r.tolist()))


def test_pagerank_matches_local_reference_across_layouts(ray_session):
    rng = np.random.default_rng(3)
    edges = rng.integers(0, 60, size=(200, 2)).astype(np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    want = pagerank_local(edges, iters=12)
    tbl = _edges_tbl(edges)
    for ds in (ray.data.from_arrow(tbl), _many_blocks(tbl)):
        got = pagerank(ds, iters=12).to_pandas()
        got_map = dict(zip(got["node"].astype(int),
                           got["rank_units"].astype(int)))
        assert got_map == want


def test_pagerank_close_to_float_power_iteration(ray_session):
    rng = np.random.default_rng(9)
    edges = rng.integers(0, 40, size=(120, 2)).astype(np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    got = pagerank(ray.data.from_arrow(_edges_tbl(edges)),
                   iters=40).to_pandas()
    ref = _float_pr(edges, iters=60)
    for node, units in zip(got["node"], got["rank_units"]):
        assert abs(units / UNIT - ref[int(node)]) < 5e-3


def test_pagerank_star_hub_ranks_first(ray_session):
    """A star (hub touching every spoke) must rank the hub strictly
    first — the boilerplate-hub detection contract."""
    hub, spokes = 1000, np.arange(30, dtype=np.int64)
    edges = np.stack([np.full(30, hub, np.int64), spokes], axis=1)
    got = pagerank(ray.data.from_arrow(_edges_tbl(edges)),
                   iters=15).to_pandas()
    top = got.sort_values(["rank_units", "node"],
                          ascending=[False, True]).iloc[0]
    assert int(top["node"]) == hub
    hub_units = int(top["rank_units"])
    spoke_units = got[got["node"] != hub]["rank_units"].max()
    assert hub_units > 5 * int(spoke_units)


def test_pagerank_empty_graph(ray_session):
    got = pagerank(ray.data.from_arrow(
        _edges_tbl(np.empty((0, 2), np.int64)))).to_pandas()
    assert len(got) == 0
