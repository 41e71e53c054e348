"""Oracle self-consistency: the single-process LSH path recovers the
brute-force pair set on planted fixtures (the reference's evaluator
strategy, motif_both_points.cpp:100-165)."""

import pyarrow.compute as pc

from hsearch_ray.config import PipelineConfig
from hsearch_ray.reference_impl import brute_force_pairs, cluster_pairs, run_reference


def test_reference_recall_vs_brute_force(tiny_corpus):
    corpus, truth = tiny_corpus
    cfg = PipelineConfig()
    res = run_reference(corpus, cfg)
    bf = brute_force_pairs(corpus, cfg)
    bf_thr = bf.filter(pc.field("jaccard") >= cfg.jaccard_threshold)
    want = set(zip(bf_thr["a"].to_pylist(), bf_thr["b"].to_pylist()))
    got = cluster_pairs(res.clusters)
    hit = sum(1 for p in want if p in got)
    assert len(want) > 20  # fixture actually plants duplicates
    assert hit / len(want) >= 0.99


def test_reference_exact_clones_clustered(tiny_corpus):
    corpus, truth = tiny_corpus
    res = run_reference(corpus)
    # every planted exact clone shares a cluster with its base
    import collections

    from hsearch_ray import hashing as H

    fid = {
        (r, p, c): H.file_id_from_key(r, p, c)
        for r, p, c in zip(
            corpus["repo"].to_pylist(),
            corpus["path"].to_pylist(),
            corpus["commit"].to_pylist(),
        )
    }
    cid = dict(
        zip(res.clusters["file_id"].to_pylist(), res.clusters["cluster_id"].to_pylist())
    )
    by_truth = collections.defaultdict(list)
    for i, tc in enumerate(truth["truth_cluster"].to_pylist()):
        kind = truth["kind"].to_pylist()[i]
        if tc > 0 and kind in ("base", "exact", "crlf"):
            key = (
                truth["repo"].to_pylist()[i],
                truth["path"].to_pylist()[i],
                truth["commit"].to_pylist()[i],
            )
            by_truth[tc].append(cid[fid[key]])
    for tc, cids in by_truth.items():
        assert len(set(cids)) == 1, f"truth cluster {tc} split: {cids}"


def test_reference_determinism(tiny_corpus):
    corpus, _ = tiny_corpus
    r1 = run_reference(corpus)
    r2 = run_reference(corpus)
    assert r1.pairs.equals(r2.pairs)
    assert r1.clusters.equals(r2.clusters)
