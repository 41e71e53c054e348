"""Checkpoint / lineage / resume behavior (north rule: job resumes from
per-stage parquet checkpoints with lineage + metrics)."""

import json
import os

import pyarrow as pa
import pytest

from hsearch_ray.config import PipelineConfig
from hsearch_ray.corpus import generate_corpus


def _clusters_map(res):
    return {
        int(r["file_id"]): int(r["cluster_id"]) for r in res.clusters.take_all()
    }


def test_checkpoint_write_and_resume(ray_session, tiny_corpus, tmp_path):
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, _ = tiny_corpus
    cfg = PipelineConfig()
    ckpt = str(tmp_path / "ckpt")

    with pytest.raises(ValueError):
        # checkpoints without an input identity are refused (a config-only
        # fingerprint would silently resume onto a different corpus)
        dedup_pipeline(ray.data.from_arrow(corpus), cfg, checkpoint_dir=ckpt)

    r1 = dedup_pipeline(ray.data.from_arrow(corpus), cfg, checkpoint_dir=ckpt,
                        input_tag="tiny_corpus")
    c1 = _clusters_map(r1)
    assert os.path.exists(f"{ckpt}/tagged/_lineage.json")
    assert os.path.exists(f"{ckpt}/pairs/_lineage.json")
    with open(f"{ckpt}/tagged/_lineage.json") as f:
        manifest = json.load(f)
    assert manifest["complete"] is True
    assert manifest["rows"] > 0
    assert "seed=42" in manifest["fingerprint"]
    # per-partition lineage: every written parquet file accounted for
    assert manifest["partitions"]
    assert sum(p["rows"] for p in manifest["partitions"]) == manifest["rows"]
    assert all(p["bytes"] > 0 for p in manifest["partitions"])

    # second run resumes from both checkpoints and reproduces the result —
    # WITHOUT executing the upstream input at all (short-circuit): the
    # input dataset below raises if any batch is ever computed
    def _boom(batch):
        raise RuntimeError("upstream stage executed despite valid checkpoint")

    poisoned = ray.data.from_arrow(corpus).map_batches(_boom, batch_format="pyarrow")
    r2 = dedup_pipeline(poisoned, cfg, checkpoint_dir=ckpt, input_tag="tiny_corpus")
    assert r2.metrics.get("resumed_from") == "tagged"
    assert r2.metrics.get("resumed_pairs") is True
    assert _clusters_map(r2) == c1


def test_stale_checkpoint_invalidated_by_config(ray_session, tiny_corpus, tmp_path):
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, _ = tiny_corpus
    ckpt = str(tmp_path / "ckpt2")
    dedup_pipeline(ray.data.from_arrow(corpus), PipelineConfig(), checkpoint_dir=ckpt,
                   input_tag="tiny_corpus")
    # different config -> fingerprint mismatch -> recompute, not resume
    cfg2 = PipelineConfig(jaccard_threshold=0.8)
    r = dedup_pipeline(ray.data.from_arrow(corpus), cfg2, checkpoint_dir=ckpt,
                       input_tag="tiny_corpus")
    assert "resumed_from" not in r.metrics
    # different INPUT tag, same config -> also recompute (the ADVICE
    # stale-corpus scenario)
    dedup_pipeline(ray.data.from_arrow(corpus), cfg2, checkpoint_dir=ckpt,
                   input_tag="tiny_corpus")
    r3 = dedup_pipeline(ray.data.from_arrow(corpus), cfg2, checkpoint_dir=ckpt,
                        input_tag="other_corpus")
    assert "resumed_from" not in r3.metrics


def test_interrupted_checkpoint_is_invalid(ray_session, tmp_path):
    """A half-written (tmp) checkpoint dir never validates."""
    from hsearch_ray.state import lineage

    stage = str(tmp_path / "stage")
    os.makedirs(stage + ".tmp")
    with open(os.path.join(stage + ".tmp", "_lineage.json"), "w") as f:
        f.write("{}")
    assert not lineage.checkpoint_valid(stage, "fp")
    assert not lineage.checkpoint_valid(stage + ".tmp", "fp")


def test_rerun_determinism(ray_session, tiny_corpus):
    """Same corpus, same config, two fresh runs -> identical pairs and
    clusters (FIXTURES.md F5 determinism property)."""
    import ray.data

    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, _ = tiny_corpus
    cfg = PipelineConfig()
    r1 = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
    r2 = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
    p1 = sorted((int(r["a"]), int(r["b"])) for r in r1.pairs.take_all())
    p2 = sorted((int(r["a"]), int(r["b"])) for r in r2.pairs.take_all())
    assert p1 == p2
    assert _clusters_map(r1) == _clusters_map(r2)
