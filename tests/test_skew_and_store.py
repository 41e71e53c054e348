"""Scale-path behaviors: lazy shard routing in the verifier and the
distributive handling of a mega-bucket that spans many sorted blocks."""

import numpy as np
import pyarrow as pa
import pytest

from hsearch_ray.config import PipelineConfig


def _corpus(rows):
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows], pa.string()),
            "path": pa.array([r[1] for r in rows], pa.string()),
            "commit": pa.array(["head"] * len(rows), pa.string()),
            "lang": pa.array(["py"] * len(rows), pa.string()),
            "content": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_verifier_fetches_only_referenced_shards(ray_session):
    """A verify task ray.gets ONLY the shards its batch references: with
    candidate pairs confined to a narrow id range, most of the sharded
    store is never pulled (the multi-node replication fix)."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import Verifier, build_store

    cfg = PipelineConfig()
    rng = np.random.Generator(np.random.PCG64(4))
    rows = [("r", f"p{i}.py", f"content {i} " + " ".join(
        str(rng.integers(0, 9999)) for _ in range(30))) for i in range(64)]
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    store_ref = build_store(corpus, ids, cfg, num_shards=8)

    lo_ids = ids[:8]  # one narrow id range
    pairs = pa.table({"a": pa.array(lo_ids[:-1], pa.int64()),
                      "b": pa.array(lo_ids[1:], pa.int64())})
    v = Verifier(cfg, store_ref)
    assert len(v._shards) == 0  # nothing fetched up front
    v(pairs)
    assert 1 <= len(v._shards) <= 2  # only the id range's shard(s)

    # and the lazily-routed verifier returns exactly what a full pass does
    v_full = Verifier(cfg, store_ref)
    for s in range(len(v_full.shard_refs)):
        v_full._shard(s)
    assert v(pairs).equals(v_full(pairs))


def test_bloom_store_filter_equivalent(ray_session):
    """Forcing the Bloom candidate-id filter (bloom_above=0) produces a
    store whose verification output is BIT-IDENTICAL to the exact-id
    path: false positives only over-include files the verifier never
    looks up."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import (Verifier, bloom_build,
                                           bloom_contains, build_store)

    rng = np.random.Generator(np.random.PCG64(9))
    base = " ".join(str(rng.integers(0, 99)) for _ in range(80))
    rows = [("r", f"f{i}.py", base + f" tail{i % 7}") for i in range(48)]
    cfg = PipelineConfig(jaccard_threshold=0.5)
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    # only half the files are candidates: the filter has something to cut
    cand = ids[::2]
    pairs = pa.table({"a": pa.array(cand[:-1], pa.int64()),
                      "b": pa.array(cand[1:], pa.int64())})
    exact = Verifier(cfg, build_store(corpus, cand, cfg, num_shards=4))(pairs)
    bloom = Verifier(cfg, build_store(corpus, cand, cfg, num_shards=4,
                                      bloom_above=0))(pairs)
    assert exact.num_rows > 0
    assert bloom.equals(exact)

    # and the primitive honors its contract: no false negatives
    bm = bloom_build(cand)
    assert bloom_contains(bm, cand).all()


def test_mega_bucket_spanning_blocks_stays_distributed(ray_session):
    """An adversarial bucket holding most of the corpus spans many sorted
    blocks; its postings are re-grouped on workers (never a driver
    funnel), hub-starred to O(n) edges, and still produce ONE cluster."""
    import ray.data

    from hsearch_ray.corpus import generate_corpus
    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, truth = generate_corpus(n_files=400, seed=13, hot_bucket_size=300)
    cfg = PipelineConfig(max_bucket_pairs_exhaustive=16)
    res = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
    assert res.metrics["hot_members_max"] > 16
    n_pairs = res.pairs.count()
    # hub-star keeps pair emission linear in the hot-bucket size
    assert n_pairs < 6 * 400, f"pair explosion: {n_pairs}"
    clusters = {int(r["file_id"]): int(r["cluster_id"])
                for r in res.clusters.take_all()}
    from hsearch_ray import hashing as H

    hot = [
        H.file_id_from_key(r, p, c)
        for r, p, c, k in zip(truth["repo"].to_pylist(), truth["path"].to_pylist(),
                              truth["commit"].to_pylist(), truth["kind"].to_pylist())
        if k == "hot"
    ]
    assert len({clusters[f] for f in hot}) == 1


def test_hot_bucket_window_recovers_pairs(ray_session):
    """cfg.hot_bucket_window wiring: a hub-starred hot bucket emits ONLY
    star edges at window=0; window=w adds the ring-recovery pairs
    (O(n·w), pair-level recall inside the bucket) — and every emitted
    pair is a true within-bucket pair."""
    import ray.data

    from hsearch_ray.stages.lsh import counted_pairs_from_keyed

    n = 40
    fids = np.arange(100, 100 + n, dtype=np.int64)
    keyed = pa.table({"gkey": pa.array(np.full(n, 7), pa.int64()),
                      "file_id": pa.array(fids, pa.int64())})

    def run(window):
        ds, _ = counted_pairs_from_keyed(
            ray.data.from_arrow(keyed), cap=8, window=window
        )
        df = ds.to_pandas()
        return set(zip(df["a"], df["b"]))

    star = run(0)
    assert len(star) == n - 1  # hub-star only: every member to the min
    ring = run(3)
    assert star < ring  # window recovers additional in-bucket pairs
    assert len(ring) >= len(star) + n  # ~n·w extra, minus overlaps
    all_pairs = {(int(a), int(b)) for i, a in enumerate(fids)
                 for b in fids[i + 1:]}
    assert ring <= all_pairs  # recovery never invents cross-bucket pairs


def test_sketch_prefilter_flag(ray_session):
    """cfg.use_sketch_prefilter wiring: near-dup pairs whose b-bit
    minhash sketches differ by more than prefilter_hamming bits skip
    exact verification (precision lever, lossy); a generous bound
    changes nothing."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import Verifier, build_store

    base = " ".join(f"token{i}" for i in range(120))
    variant = base
    for i in (3, 17, 31, 44, 62, 77, 90, 104):  # J ~ 0.78: sketches differ
        variant = variant.replace(f"token{i} ", f"tok{i}x ")
    rows = [("r", "a.py", base), ("r", "b.py", variant)]
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    pairs = pa.table({"a": pa.array(ids[:1], pa.int64()),
                      "b": pa.array(ids[1:], pa.int64())})

    def verify(cfg):
        store = build_store(corpus, ids, cfg, num_shards=2)
        return Verifier(cfg, store)(pairs)

    off = verify(PipelineConfig(jaccard_threshold=0.5))
    assert off.num_rows == 1  # the pair is a true near-dup
    strict = verify(PipelineConfig(jaccard_threshold=0.5,
                                   use_sketch_prefilter=True,
                                   prefilter_hamming=0))
    assert strict.num_rows == 0  # sketches differ -> exact verify skipped
    loose = verify(PipelineConfig(jaccard_threshold=0.5,
                                  use_sketch_prefilter=True,
                                  prefilter_hamming=63))
    assert loose.equals(off)  # generous bound: same verdicts

def test_spill_path_carries_ring_order_key():
    """VERDICT-r3 item 5: a hot bucket that spans blocks (spill path)
    must recover the SAME ring-window pairs as a block-interior hot run
    — the 'ord' key survives as the spill column 'o'.  Also pins the
    hub ∪ ring per-key dedup (one key emits each pair at most once)."""
    from hsearch_ray.stages.lsh import _emit_bucket_runs, _emit_spill_group

    rng = np.random.Generator(np.random.PCG64(21))
    n, cap, window = 30, 8, 3
    fids = rng.permutation(np.arange(500, 500 + n)).astype(np.int64)
    ords = rng.integers(0, 1 << 40, size=n).astype(np.int64)

    # interior layout: boundary keys 0/9 bracket the hot key 7
    interior = pa.table({
        "gkey": pa.array(np.r_[0, np.full(n, 7), 9], pa.int64()),
        "file_id": pa.array(np.r_[1000, fids, 1001], pa.int64()),
        "ord": pa.array(np.r_[0, ords, 0], pa.int64()),
    })
    out = _emit_bucket_runs(interior, cap=cap, window=window)
    kind = out["kind"].to_numpy(zero_copy_only=False)
    ia = out["a"].to_numpy(zero_copy_only=False)[kind == 0]
    ib = out["b"].to_numpy(zero_copy_only=False)[kind == 0]
    interior_pairs = list(zip(ia, ib))
    assert len(interior_pairs) == len(set(interior_pairs))  # per-key dedup

    # spill layout: the same bucket arrives as kind=1 postings (a=gkey,
    # b=fid, o=ord) regrouped on a worker
    single = pa.table({
        "gkey": pa.array(np.full(n, 7), pa.int64()),
        "file_id": pa.array(fids, pa.int64()),
        "ord": pa.array(ords, pa.int64()),
    })
    spilled = _emit_bucket_runs(single, cap=cap, window=window)
    assert (spilled["kind"].to_numpy(zero_copy_only=False) == 1).all()
    assert "o" in spilled.column_names
    regrouped = _emit_spill_group(cap, window)(spilled)
    spill_pairs = list(zip(regrouped["a"].to_numpy(zero_copy_only=False),
                           regrouped["b"].to_numpy(zero_copy_only=False)))
    assert len(spill_pairs) == len(set(spill_pairs))
    assert set(spill_pairs) == set(interior_pairs)


def test_counted_n_not_inflated_by_ring_window(ray_session):
    """With a single shared key, every pair's multiplicity n must be
    exactly 1 even when hub-star and ring-window would emit the same
    pair twice from that key (the over-admission ADVICE finding)."""
    import ray.data

    from hsearch_ray.stages.lsh import counted_pairs_from_keyed

    n = 40
    fids = np.arange(100, 100 + n, dtype=np.int64)
    keyed = pa.table({"gkey": pa.array(np.full(n, 7), pa.int64()),
                      "file_id": pa.array(fids, pa.int64())})
    ds, _ = counted_pairs_from_keyed(
        ray.data.from_arrow(keyed), cap=8, window=4
    )
    df = ds.to_pandas()
    assert len(df) > n - 1  # star + ring recovery both present
    assert (df["n"] == 1).all()


def test_prefilter_handles_zero_shingle_docs(ray_session):
    """A shard whose LAST doc has zero shingles must not crash the
    sketch prefilter, and interior zero-shingle docs must not absorb a
    neighbor's shingles (the empty-segment trap: the OPH kernel requires
    non-empty docs, so empty ones are excluded and scattered back as 0).
    Exercised BOTH ways: precomputed at store build (with_sketch) and
    the lazy fallback for stores built without the flag."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import Verifier, build_store

    base = " ".join(f"token{i}" for i in range(120))
    variant = base.replace("token3 ", "token3x ")
    # empty-content docs land in the store when min_content_len=0;
    # one sorts between the pair, one last in the single shard
    rows = [("r", "a.py", base), ("r", "b.py", variant),
            ("r", "mid.py", ""), ("r", "zz.py", "")]
    cfg = PipelineConfig(jaccard_threshold=0.5, min_content_len=0,
                         use_sketch_prefilter=True, prefilter_hamming=32)
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    pdf = corpus.to_pandas()
    fid_a = int(pdf.loc[pdf["path"] == "a.py", "file_id"].iloc[0])
    fid_b = int(pdf.loc[pdf["path"] == "b.py", "file_id"].iloc[0])
    a, b = sorted((fid_a, fid_b))
    pairs = pa.table({"a": pa.array([a], pa.int64()),
                      "b": pa.array([b], pa.int64())})
    v = Verifier(cfg, build_store(corpus, ids, cfg, num_shards=1))
    out = v(pairs)  # crashed (or mis-voted) before the fix
    assert out.num_rows == 1
    sh = v._shard_sketch(0)
    ids0, _, lens0 = v._shard(0)[:3]
    assert (sh[lens0 == 0] == 0).all()  # empty docs sketch to 0
    assert (sh[lens0 > 0] != 0).all()
    # lazy-fallback path (store built WITHOUT the flag) must agree
    cfg_off = PipelineConfig(jaccard_threshold=0.5, min_content_len=0)
    v2 = Verifier(cfg, build_store(corpus, ids, cfg_off, num_shards=1))
    assert np.array_equal(v2._shard_sketch(0), sh)


def test_verifier_cached_per_process(ray_session):
    """_cached_verifier returns ONE Verifier per (store ref, config) in a
    process, so lazily-fetched shards and the prefilter's per-shard
    simhash cache survive across batches."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import _cached_verifier, build_store

    rows = [("r", f"c{i}.py", f"text {i} " * 30) for i in range(8)]
    cfg = PipelineConfig()
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    store_ref = build_store(corpus, ids, cfg, num_shards=2)

    v1 = _cached_verifier(store_ref, cfg)
    assert _cached_verifier(store_ref, cfg) is v1  # same store+cfg: one instance
    other = PipelineConfig(jaccard_threshold=0.5)
    assert _cached_verifier(store_ref, other) is not v1  # cfg is part of the key


def test_kv_store_extreme_int64_keys(ray_session):
    """Full-range hash keys survive the kv store: shard cut points are
    exact integers (np.linspace's float64 rounding near 2^63 shifted
    bounds INSIDE the key range, silently dropping keys between the
    true extreme and the rounded bound), and the last shard is
    unbounded above so int64-max itself is storable."""
    import ray
    import ray.data

    from hsearch_ray.stages.lsh import _ShardedKvLookup, build_kv_store

    info = np.iinfo(np.int64)
    keys = np.array(
        [info.min, info.min + 1, -7499754882926326045, -1, 0, 1,
         3870238688000063145, info.max - 1, info.max],
        dtype=np.int64,
    )
    vals = np.arange(1, keys.size + 1, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    )
    store = build_kv_store(ds, "k", "v", num_shards=4)
    look = _ShardedKvLookup(ray.put(store))
    out, ok = look.lookup(keys)
    assert ok.all()
    assert (out == vals).all()
    miss, ok_miss = look.lookup(np.array([42], dtype=np.int64))
    assert not ok_miss.any()


def test_shard_coherent_verify_equivalent(ray_session, small_corpus):
    """Forcing the shard-coherent pair reorder + a 1-entry shard LRU
    (the harshest residency bound) yields the IDENTICAL verified pair
    set and clustering as the default unbounded path — the routing
    lever moves data residency, never results."""
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, _ = small_corpus

    def run(cfg):
        res = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
        pairs = res.pairs.to_pandas().sort_values(
            ["a", "b", "method"]).reset_index(drop=True)
        clus = res.clusters.to_pandas().sort_values(
            "file_id").reset_index(drop=True)
        return pairs, clus

    base_pairs, base_clus = run(PipelineConfig(shard_coherent_verify=False,
                                               verify_shard_cache=0))
    co_pairs, co_clus = run(PipelineConfig(shard_coherent_verify=True,
                                           verify_shard_cache=1))
    assert len(base_pairs) > 0
    assert co_pairs.equals(base_pairs)
    assert co_clus.equals(base_clus)


def test_verifier_shard_lru_bounded(ray_session):
    """With verify_shard_cache=N, a verifier never keeps more than N
    shards mapped — even when one batch references every shard — and
    still verifies identically to the unbounded map (batch-local refs
    keep evicted shards alive for the duration of the batch)."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import Verifier, build_store

    rng = np.random.Generator(np.random.PCG64(11))
    base = " ".join(str(rng.integers(0, 99)) for _ in range(60))
    rows = [("r", f"s{i}.py", base + f" t{i % 5}") for i in range(64)]
    cfg = PipelineConfig(jaccard_threshold=0.5, verify_shard_cache=2)
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    store_ref = build_store(corpus, ids, cfg, num_shards=8)
    # pairs spanning the whole id range: every shard gets referenced
    order = rng.permutation(ids.size - 1)
    pairs = pa.table({"a": pa.array(np.minimum(ids[:-1], ids[1:])[order], pa.int64()),
                      "b": pa.array(np.maximum(ids[:-1], ids[1:])[order], pa.int64())})
    bounded = Verifier(cfg, store_ref)
    out = bounded(pairs)
    assert len(bounded._shards) <= 2
    unbounded = Verifier(PipelineConfig(jaccard_threshold=0.5,
                                        verify_shard_cache=0), store_ref)
    assert out.equals(unbounded(pairs))
    assert len(unbounded._shards) == 8


def test_store_shard_count_scales_and_layouts_agree(ray_session):
    """The default shard count must grow with the CANDIDATE COUNT (a
    fixed per-CPU count makes one shard O(corpus) — the 61M-file OOM),
    and verified pairs must be identical across shard layouts."""
    import ray
    import ray.data

    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.verify import Verifier, build_store

    cfg = PipelineConfig()
    rng = np.random.Generator(np.random.PCG64(9))
    rows = [("r", f"p{i}.py", f"doc {i} " + " ".join(
        str(rng.integers(0, 9999)) for _ in range(30))) for i in range(48)]
    corpus = normalize(ray.data.from_arrow(_corpus(rows))).materialize()
    ids = np.sort(corpus.to_pandas()["file_id"].to_numpy(dtype=np.int64))
    pairs = pa.table({"a": pa.array(ids[:-1], pa.int64()),
                      "b": pa.array(ids[1:], pa.int64())})

    base = Verifier(cfg, build_store(corpus, ids, cfg, num_shards=1))(pairs)
    many = Verifier(cfg, build_store(corpus, ids, cfg, num_shards=17))(pairs)
    assert base.equals(many)

    # the default derivation adds a ceiling shard per 262,144 candidate
    # ids on top of the CPU floor — asserted against the PRODUCTION
    # helper (agg.default_num_shards), so a regression to the constant
    # or expression is caught; each store's parameterization is checked
    # (a real multi-million-id store is out of test budget)
    from hsearch_ray.stages.agg import default_num_shards

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # shingle store (verify.build_store): 262k ids/shard, cpu floor
    for n_ids, want in ((1_000, max(4, cpus)),
                        (10_000_000, max(4, cpus, 39)),
                        (30_000_000, max(4, cpus, 115))):
        assert default_num_shards(n_ids, 262_144) == want
    # kv store (lsh.build_kv_store): 4M rows/shard, cpus//2 floor
    assert default_num_shards(100_000_000, 4_000_000,
                              cpu_floor=cpus // 2) == max(4, cpus // 2, 25)
    # vector store (ann.build_vec_store): 2M vecs/shard, sqrt grid floor
    grid = int(np.ceil(np.sqrt(2 * cpus)))
    assert default_num_shards(50_000_000, 2_000_000,
                              cpu_floor=grid, floor=2) == max(2, grid, 25)
    # token-set store (setjoin.build_set_store): 262k docs/shard
    assert default_num_shards(1_048_576, 262_144,
                              cpu_floor=cpus // 2) == max(4, cpus // 2, 4)


def test_staged_exchange_equals_single_pass(ray_session):
    """cfg.exchange_stage_ranges partitions the candidate exchange into
    key-range passes staged through parquet (the 61M envelope lever);
    pairs and clusters must be IDENTICAL to the single-pass exchange —
    bucket keys never span ranges, so run/spill semantics are unchanged."""
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    rng = np.random.Generator(np.random.PCG64(31))
    rows = []
    base = " ".join(str(rng.integers(0, 9999)) for _ in range(60))
    for i in range(30):
        words = base.split()
        words[2 * i % len(words)] = f"w{i}"
        rows.append(("r", f"c{i}.py", " ".join(words)))  # near-clone family
    for i in range(30):
        rows.append(("r", f"u{i}.py", " ".join(
            str(rng.integers(0, 9999)) for _ in range(60))))
    corpus = _corpus(rows)

    plain = dedup_pipeline(ray.data.from_arrow(corpus), PipelineConfig())
    staged = dedup_pipeline(
        ray.data.from_arrow(corpus),
        PipelineConfig(exchange_stage_ranges=4))

    def cmap(res):
        return {int(r["file_id"]): int(r["cluster_id"])
                for r in res.clusters.take_all()}

    def pset(res):
        return {(int(r["a"]), int(r["b"])) for r in res.pairs.take_all()}

    assert cmap(staged) == cmap(plain)
    assert pset(staged) == pset(plain)
