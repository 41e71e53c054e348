"""Iterative graph analytics over an edge Dataset — PageRank power
iteration (Brin & Page 1998, public textbook algorithm), the engine's
representative of the ITERATIVE-algorithm family (the one shape that is
neither a single shuffle nor a window: a fixed-point loop whose state
is corpus-sized and must never land on the driver).

Data-curation use: centrality over the document SIMILARITY graph ranks
template/boilerplate hubs — a doc similar to many others is a hub, and
hubs are what near-dup capping (lsh.py hub-star) and keeper selection
need to know about.  The reference's analog state is the k-NN DAG of
SURVEY §2.3 T8 (offline analysis); here the loop is first-class.

Physical plan per iteration (nothing driver-sized):
  rank kv store (node -> rank units)  +  out-degree kv store
  edges.map_batches: probe both stores, emit (dst, contribution)
  grouped_agg_ds sum  ->  next rank table  ->  next kv store
Ranks are INTEGER micro-units (1e12 = mass 1.0): grouped integer sums
are order-independent, so the fixed point is bit-deterministic across
block layouts and retries — the repo's float-free hash discipline
applied to an iterative algorithm.  Integer division truncates, so a
little mass evaporates each round instead of being redistributed; the
pytest pins the result against an identical-arithmetic local reference
and against float power iteration within a tolerance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from hsearch_ray.stages.agg import default_num_partitions, grouped_agg_ds
from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

I64 = np.int64
UNIT = 1_000_000_000_000  # 1e12 micro-units = rank mass 1.0


def _sym_edges(edges_ds):
    """Undirected (a, b) pairs -> both directed arcs (src, dst)."""

    def _sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    return edges_ds.map_batches(_sym, batch_format="pyarrow")


def pagerank(edges_ds, damping_ppm: int = 850_000, iters: int = 20):
    """PageRank over an undirected (a, b) edge Dataset.  Returns a
    Dataset (node, rank_units) over every node with >= 1 edge (isolated
    nodes hold the uniform floor by definition and are not emitted).

    damping is the rational damping_ppm/1e6 and every update is integer
    (units * damping_ppm // 1e6 // degree), so the result is exactly
    reproducible under any partitioning.  Truncation bleeds mass, which
    only DAMPS the iteration further — convergence is monotone."""
    arcs = _sym_edges(edges_ds).materialize()

    deg = grouped_agg_ds(
        arcs.map_batches(
            lambda t: pa.table({
                "src": t["src"],
                "one": pa.array(np.ones(t.num_rows, I64), pa.int64()),
            }),
            batch_format="pyarrow",
        ),
        ["src"], {"one": ["sum"]},
    ).materialize()
    deg_ref = ray.put(build_kv_store(deg, "src", "one__sum"))

    # node table = distinct sources (symmetric arcs => every node
    # appears as src); n = node count for the teleport floor
    nodes = deg.map_batches(
        lambda t: pa.table({"node": t["src"]}), batch_format="pyarrow"
    ).materialize()
    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(pa.schema(
            [("node", pa.int64()), ("rank_units", pa.int64())]
        ).empty_table())
    floor = (UNIT - damping_ppm * UNIT // 1_000_000) // n
    init = UNIT // n

    rank = nodes.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "rank_units": pa.array(
                np.full(t.num_rows, init, I64), pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        rank_ref = ray.put(build_kv_store(rank, "node", "rank_units"))

        def _contrib(batch: pa.Table, rank_ref=rank_ref) -> pa.Table:
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            r, _ = _kv_lookup(rank_ref).lookup(src)
            d, ok = _kv_lookup(deg_ref).lookup(src)
            d = np.where(ok & (d > 0), d, 1)
            c = (r * I64(damping_ppm)) // I64(1_000_000) // d
            return pa.table({"node": pa.array(dst, pa.int64()),
                             "c": pa.array(c, pa.int64())})

        contrib = grouped_agg_ds(
            arcs.map_batches(_contrib, batch_format="pyarrow"),
            ["node"], {"c": ["sum"]},
        )

        def _next(batch: pa.Table) -> pa.Table:
            c = batch["c__sum"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": batch["node"],
                "rank_units": pa.array(c + I64(floor), pa.int64()),
            })

        # every node with an edge receives >= 1 contribution row
        # (symmetric arcs), so the contrib table covers all n nodes
        rank = contrib.map_batches(
            _next, batch_format="pyarrow").materialize()

    return rank


def pagerank_local(edges: np.ndarray, damping_ppm: int = 850_000,
                   iters: int = 20) -> dict[int, int]:
    """Single-process reference with IDENTICAL integer arithmetic (the
    test oracle): edges is an (m, 2) int64 array of undirected pairs."""
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:src.size], inv[src.size:]
    n = nodes.size
    deg = np.bincount(si, minlength=n).astype(I64)
    floor = (UNIT - damping_ppm * UNIT // 1_000_000) // n
    rank = np.full(n, UNIT // n, I64)
    for _ in range(iters):
        c = (rank[si] * I64(damping_ppm)) // I64(1_000_000) // deg[si]
        rank = np.zeros(n, I64)
        np.add.at(rank, di, c)
        rank += floor
    return {int(k): int(v) for k, v in zip(nodes, rank)}


def triangle_count(edges_ds) -> int:
    """Distributed triangle count over an UNDIRECTED edge set stored
    once per edge as columns (a, b) with a < b — the two-join MapReduce
    formulation (Suri & Vassilvitskii WWW'11 shape): wedges = edges ⋈
    edges on the middle vertex, closed wedges = wedges ⋈ edges on the
    (low, high) endpoints.  Because edges are canonical a < b, every
    triangle x<y<z materializes exactly one wedge (x,y),(y,z) and one
    closure probe (x,z) — no /6 correction, no driver adjacency; both
    joins are Dataset hash shuffles and only the count leaves the
    cluster."""
    import ray

    # the edge set is consumed THREE times (base, wedge side, closure
    # side); a lazy input (e.g. a similarity join) would re-execute its
    # whole plan per consumption — pin it once, edges are the small side
    edges_ds = edges_ds.materialize()
    num_partitions = default_num_partitions()
    e2 = edges_ds.rename_columns(["w_mid", "w_hi"])
    wedges = edges_ds.join(
        e2, join_type="inner", num_partitions=num_partitions,
        on=("b",), right_on=("w_mid",),
    )
    # schema barrier: the hash-shuffle join emits EMPTY-SCHEMA bundles
    # for empty partitions (map UDFs are skipped on zero-row blocks, so
    # they can't repair it) and a downstream join then fails resolving
    # its key FieldRefs; the repartition rebuilds uniform-schema blocks
    # at wedge (not corpus) size
    wedges = wedges.repartition(num_partitions)
    e3 = edges_ds.rename_columns(["c_lo", "c_hi"])
    closed = wedges.join(
        e3, join_type="inner", num_partitions=num_partitions,
        on=("a", "w_hi"), right_on=("c_lo", "c_hi"),
    )
    return int(closed.count())
