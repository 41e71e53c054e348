

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
