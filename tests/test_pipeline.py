"""End-to-end distributed pipeline vs the single-process oracle.

This is the north-rule gate: dup-pair recall >= 0.99 at identical
shingle/signature config (BASELINE.json), plus the per-row sha256
invariant and the skew (hub-star) path.
"""

import pyarrow as pa
import pytest

from hsearch_ray.config import PipelineConfig
from hsearch_ray.corpus import generate_corpus
from hsearch_ray.reference_impl import cluster_pairs, run_reference


def _run(corpus, cfg):
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    ds = ray.data.from_arrow(corpus)
    res = dedup_pipeline(ds, cfg)
    clusters = pa.Table.from_pylist(res.clusters.take_all())
    pairs = pa.Table.from_pylist(res.pairs.take_all())
    return res, clusters, pairs


def test_recall_vs_reference(ray_session, tiny_corpus):
    corpus, _ = tiny_corpus
    cfg = PipelineConfig()
    res, clusters, pairs = _run(corpus, cfg)
    ref = run_reference(corpus, cfg)
    want = cluster_pairs(ref.clusters)
    got = cluster_pairs(clusters)
    assert len(want) > 20
    hit = sum(1 for p in want if p in got)
    assert hit / len(want) >= 0.99
    # precision guard: no pair the oracle does not have
    assert all(p in want for p in got)


def test_sha256_invariant(ray_session, tiny_corpus):
    """Every surviving row's sha256 must equal the input's (input_hint)."""
    import hashlib

    import ray.data

    from hsearch_ray.stages.exact_dedup import exact_dedup
    from hsearch_ray.stages.normalize import normalize

    corpus, _ = tiny_corpus
    want = {
        hashlib.sha256(c.encode()).hexdigest()
        for c in corpus["content"].to_pylist()
    }
    _, kept, _ = exact_dedup(normalize(ray.data.from_arrow(corpus)))
    rows = kept.take_all()
    for r in rows:
        assert hashlib.sha256(r["content"].encode()).hexdigest() == r["sha256"]
        assert r["sha256"] in want
    assert {r["sha256"] for r in rows} == want  # kept = exactly distinct contents


def test_exact_dedup_shuffle_combine_equivalent(ray_session, tiny_corpus):
    """The distributed partial-combine path (forced via a 1-row driver
    bound) must produce identical tagging to the driver combine — the
    auto-switch is a physical-plan change only."""
    import ray.data

    from hsearch_ray.stages.exact_dedup import exact_dedup
    from hsearch_ray.stages.normalize import normalize

    corpus, _ = tiny_corpus
    # clone a few rows so real duplicates exist
    import pyarrow as pa

    dup = corpus.slice(0, 5)
    both = pa.concat_tables([corpus, dup.set_column(
        dup.schema.get_field_index("path"),
        "path",
        pa.array([p + "_copy" for p in dup["path"].to_pylist()]),
    )])

    def run(bound):
        tagged, kept, edges = exact_dedup(
            normalize(ray.data.from_arrow(both)), driver_combine_max_rows=bound
        )
        tag_map = {int(r["file_id"]): int(r["rep_id"]) for r in tagged.take_all()}
        edge_set = {(int(r["a"]), int(r["b"])) for r in edges.take_all()}
        return tag_map, kept.count(), edge_set

    driver = run(8_000_000)
    shuffle = run(1)
    assert driver == shuffle
    # the cloned contents are true exact dups: edges must exist and be
    # identical across the two combine plans
    assert len(driver[2]) >= 5


def test_hot_bucket_hub_star(ray_session):
    """A >cap near-identical cluster takes the broadcast hub-star path
    (no quadratic group) and still lands in ONE cluster."""
    corpus, truth = generate_corpus(n_files=160, seed=5, hot_bucket_size=100)
    cfg = PipelineConfig(max_bucket_pairs_exhaustive=32)
    res, clusters, pairs = _run(corpus, cfg)
    assert res.metrics["buckets_hot"] >= 1
    assert res.metrics["hot_members_max"] > 32
    # collect the hot files' cluster ids via truth table
    from hsearch_ray import hashing as H

    hot_keys = [
        (r, p, c)
        for r, p, c, k in zip(
            truth["repo"].to_pylist(),
            truth["path"].to_pylist(),
            truth["commit"].to_pylist(),
            truth["kind"].to_pylist(),
        )
        if k == "hot"
    ]
    fid2cid = dict(zip(clusters["file_id"].to_pylist(), clusters["cluster_id"].to_pylist()))
    cids = {fid2cid[H.file_id_from_key(*k)] for k in hot_keys}
    assert len(cids) == 1, f"hot cluster split into {len(cids)} clusters"


def test_exact_and_crlf_clones_share_cluster(ray_session, tiny_corpus):
    corpus, truth = tiny_corpus
    cfg = PipelineConfig()
    _, clusters, _ = _run(corpus, cfg)
    from collections import defaultdict

    from hsearch_ray import hashing as H

    fid2cid = dict(zip(clusters["file_id"].to_pylist(), clusters["cluster_id"].to_pylist()))
    by_truth = defaultdict(set)
    for r, p, c, tc, k in zip(
        truth["repo"].to_pylist(),
        truth["path"].to_pylist(),
        truth["commit"].to_pylist(),
        truth["truth_cluster"].to_pylist(),
        truth["kind"].to_pylist(),
    ):
        if tc > 0 and k in ("base", "exact", "crlf"):
            by_truth[tc].add(fid2cid[H.file_id_from_key(r, p, c)])
    assert by_truth and all(len(v) == 1 for v in by_truth.values())
