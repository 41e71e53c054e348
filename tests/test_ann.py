

def test_lsh_topk_multiprobe_recall(ray_session, tmp_path):
    """Bucketed ANN is approximate BY DESIGN; this pins its measured
    recall vs the exact baseline and that multiprobe (Hamming-1 bucket
    expansion) strictly improves on single-probe."""
    import ray.data

    from hsearch_ray.pipelines.queries import _load_queries
    from hsearch_ray.stages.ann import brute_force_topk, lsh_topk

    sf = "/root/testdata/sf0.001"
    q = _load_queries(sf)
    bf = brute_force_topk(ray.data.read_parquet(f"{sf}/embeddings.parquet"), q, k=5).to_pandas()
    want = set(zip(bf["query_id"], bf["neighbor_id"]))

    def recall(mp):
        got = lsh_topk(ray.data.read_parquet(f"{sf}/embeddings.parquet"), q,
                       k=5, multiprobe=mp).to_pandas()
        return len(want & set(zip(got["query_id"], got["neighbor_id"]))) / len(want)

    r0, r1 = recall(0), recall(1)
    assert r1 > r0  # multiprobe recovers single-probe misses
    assert r1 >= 0.15  # near-random embeddings: weak but measured floor


def _local_cosine_pairs(ids, mat, threshold):
    """Driver-local all-pairs oracle (test-only)."""
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sims = (mat / norms) @ (mat / norms).T
    hit = (sims >= threshold) & (ids[:, None] < ids[None, :])
    r, c = np.nonzero(hit)
    return set(zip(ids[r].tolist(), ids[c].tolist()))


def test_cosine_grid_matches_local_brute(ray_session):
    """The distributed block-pair grid (ann.cosine_dup_pairs) must emit
    EXACTLY the same pair set as a driver-local all-pairs pass — the
    grid is a physical-plan change only, never a semantic one."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from hsearch_ray.stages.ann import cosine_dup_pairs

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    mat = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    want = _local_cosine_pairs(ids, mat, 0.45)
    assert want  # fixture sanity: threshold must produce pairs

    got = cosine_dup_pairs(
        ray.data.read_parquet(f"{sf}/embeddings.parquet"),
        threshold=0.45, num_shards=4,
    ).to_pandas()
    assert set(zip(got["a"], got["b"])) == want
    # canonical orientation
    assert (got["a"] < got["b"]).all()


def test_cosine_grid_empty_input(ray_session):
    import pyarrow as pa
    import ray.data

    from hsearch_ray.stages.ann import cosine_dup_pairs

    empty = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    got = cosine_dup_pairs(empty, threshold=0.5).to_pandas()
    assert len(got) == 0


def _planted_embeddings(n=240, dim=32, n_dups=24, seed=11):
    """n base unit vectors + n_dups planted near-dups (cosine >= ~0.97);
    random 32-d vectors are near-orthogonal so non-planted pairs stay
    far below any high threshold."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.standard_normal((n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup_src = rng.choice(n, size=n_dups, replace=False)
    dups = base[dup_src] + 0.05 * rng.standard_normal((n_dups, dim))
    mat = np.vstack([base, dups])
    ids = np.arange(mat.shape[0], dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.astype(np.float32) for r in mat],
                              pa.list_(pa.float32())),
    })
    return ids, mat, tbl


def test_cosine_lsh_recall_and_precision(ray_session):
    """The scale path (hyperplane-band candidates + exact verify) must
    have perfect precision (verify is exact cosine) and high recall on
    planted near-dups at a production-grade threshold."""
    import numpy as np
    import ray.data

    from hsearch_ray.stages.ann import cosine_dup_pairs_lsh

    ids, mat, tbl = _planted_embeddings()
    thr = 0.9
    want = _local_cosine_pairs(ids, mat.astype(np.float64), thr)
    assert len(want) >= 20  # planted dups survive the threshold

    got = cosine_dup_pairs_lsh(
        ray.data.from_arrow([tbl.slice(0, 150), tbl.slice(150)]),
        threshold=thr, num_shards=3,
    ).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= want  # exact verify -> precision 1.0
    recall = len(got_pairs & want) / len(want)
    assert recall >= 0.9


def test_lsh_topk_more_tables_improve_recall(ray_session):
    """L-table union-of-candidates (the reference's multi-table
    discipline, hclust2.cpp:102-133): recall is monotone-ish in L;
    pin that 4 tables beat 1 on the same input."""
    import numpy as np
    import ray.data

    from hsearch_ray.stages.ann import brute_force_topk, lsh_topk

    ids, mat, tbl = _planted_embeddings(seed=23)
    rng = np.random.Generator(np.random.PCG64(5))
    q = {int(i): mat[i] + 0.05 * rng.standard_normal(mat.shape[1])
         for i in rng.choice(ids.size, size=8, replace=False)}
    ds = lambda: ray.data.from_arrow([tbl.slice(0, 150), tbl.slice(150)])  # noqa: E731
    bf = brute_force_topk(ds(), q, k=5).to_pandas()
    want = set(zip(bf["query_id"], bf["neighbor_id"]))

    def recall(L):
        got = lsh_topk(ds(), q, k=5, ntables=L).to_pandas()
        return len(want & set(zip(got["query_id"], got["neighbor_id"]))) / len(want)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    # deterministic (seeded): measured 0.525 @ L=4 vs lower @ L=1; most
    # top-5 tail entries are near-random neighbors in 32-d, so full
    # top-5 recall is intrinsically modest at nbits=8
    assert r4 >= 0.5


def test_ivf_topk_recall(ray_session):
    """IVF (k-means cells + nprobe probing) recall vs the exact brute
    arm on the planted-dup fixture; probing more cells helps."""
    import ray.data

    from hsearch_ray.stages.ann import brute_force_topk, ivf_topk

    import numpy as np

    ids, mat, tbl = _planted_embeddings(seed=31)
    rng = np.random.Generator(np.random.PCG64(8))
    q = {int(i): mat[i] + 0.05 * rng.standard_normal(mat.shape[1])
         for i in rng.choice(ids.size, size=8, replace=False)}
    ds = lambda: ray.data.from_arrow([tbl.slice(0, 150), tbl.slice(150)])  # noqa: E731
    bf = brute_force_topk(ds(), q, k=5).to_pandas()
    want = set(zip(bf["query_id"], bf["neighbor_id"]))

    def recall(nprobe):
        got = ivf_topk(ds(), q, k=5, nlist=16, nprobe=nprobe).to_pandas()
        return len(want & set(zip(got["query_id"], got["neighbor_id"]))) / len(want)

    r2, r8 = recall(2), recall(8)
    assert r8 >= r2
    assert r8 >= 0.6
    # full probe == exact: every cell scanned reproduces brute force
    assert recall(16) == 1.0


def test_semantic_dup_pairs_recall_and_precision(ray_session):
    """SemDeDup arm (k-means buckets + exact within-cluster cosine):
    precision must be 1.0 (within-cluster scoring is exact), recall vs
    the local all-pairs oracle high on planted near-dups — a planted
    dup sits ~0.97 cosine from its source, so k-means puts the pair in
    the same cell almost always; a small tile size forces the tiled
    matmul path."""
    import numpy as np
    import ray.data

    from hsearch_ray.stages.ann import semantic_dup_pairs

    ids, mat, tbl = _planted_embeddings()
    thr = 0.9
    want = _local_cosine_pairs(ids, mat.astype(np.float64), thr)
    assert len(want) >= 20

    got = semantic_dup_pairs(
        ray.data.from_arrow([tbl.slice(0, 150), tbl.slice(150)]),
        threshold=thr, nlist=8, tile=16,
    ).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= want  # exact within-cluster scoring: precision 1
    recall = len(got_pairs & want) / len(want)
    assert recall >= 0.9


def test_pq_topk_recall_and_determinism(ray_session):
    """The PQ arm (ADC scan + exact re-rank) must recover most of the
    exact top-5 (recall@5 >= 0.8 at ksub=16 on the 500-vector table —
    the re-rank makes every returned rank exact) and be exactly
    deterministic run to run."""
    import pandas as pd
    import ray.data

    from hsearch_ray.pipelines.queries import _load_queries
    from hsearch_ray.stages.ann import brute_force_topk, pq_topk

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    q = _load_queries(sf)
    exact = brute_force_topk(emb, q, k=5).to_pandas()
    got1 = pq_topk(emb, q, k=5)
    got2 = pq_topk(emb, q, k=5)
    pd.testing.assert_frame_equal(
        got1.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True),
        got2.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True),
    )
    want = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))
    got = set(map(tuple, got1[["query_id", "neighbor_id"]].to_numpy()))
    recall = len(got & want) / len(want)
    assert recall >= 0.8, recall
