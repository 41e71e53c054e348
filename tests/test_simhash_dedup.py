"""SimHash-as-dedup: 4-chunk blocking + exact hamming verify equals the
brute-force all-pairs oracle EXACTLY (pigeonhole: <= 3 differing bits
cannot touch all 4 chunks, so recall is 1 by construction)."""

import numpy as np
import pytest

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig


def _brute_pairs(corpus, cfg, max_hamming=3):
    fids, hashes = [], []
    for r, p, c, content in zip(corpus["repo"].to_pylist(),
                                corpus["path"].to_pylist(),
                                corpus["commit"].to_pylist(),
                                corpus["content"].to_pylist()):
        raw = content.encode()
        sh = H.shingle_hashes(H.normalize_for_shingles(raw), cfg.shingle_k)
        fids.append(H.file_id_from_key(r, p, c))
        hashes.append(int(H.simhash64(sh)))
    out = set()
    for i in range(len(fids)):
        for j in range(i + 1, len(fids)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= max_hamming:
                a, b = sorted((fids[i], fids[j]))
                out.add((a, b, d))
    return out


def test_simhash_dup_pairs_match_brute_force(ray_session, tiny_corpus):
    import ray.data

    from hsearch_ray.stages.lsh import simhash_dup_pairs
    from hsearch_ray.stages.normalize import normalize
    from hsearch_ray.stages.signatures import sign

    corpus, _ = tiny_corpus
    cfg = PipelineConfig()
    want = _brute_pairs(corpus, cfg)
    assert len(want) > 5  # fixture must actually exercise the path

    sigs = sign(normalize(ray.data.from_arrow(corpus)), cfg, with_simhash=True)
    got = {
        (int(r["a"]), int(r["b"]), int(r["hamming"]))
        for r in simhash_dup_pairs(
            sigs.select_columns(["file_id", "simhash"])
        ).take_all()
    }
    assert got == want