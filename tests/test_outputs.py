"""Output sink: partitioned parquet + metrics, atomic, re-readable."""

import json
import os

import pyarrow.parquet as pq


def test_write_outputs(ray_session, tiny_corpus, tmp_path):
    import ray.data

    from hsearch_ray.config import PipelineConfig
    from hsearch_ray.pipelines.dedup import dedup_pipeline
    from hsearch_ray.pipelines.outputs import write_outputs

    corpus, _ = tiny_corpus
    res = dedup_pipeline(ray.data.from_arrow(corpus), PipelineConfig())
    out = str(tmp_path / "out")
    summary = write_outputs(res, out)

    clusters = pq.read_table(summary["clusters"])
    assert clusters.num_rows == corpus.num_rows
    assert set(clusters.schema.names) == {"file_id", "cluster_id"}
    pairs = pq.read_table(summary["pairs"])
    assert set(pairs.schema.names) == {"a", "b", "jaccard", "method"}
    manifest = pq.read_table(summary["kept_manifest"])
    assert set(manifest.schema.names) == {"file_id", "sha256"}
    with open(summary["metrics"]) as f:
        m = json.load(f)
    assert "stage_sec" in m and "elapsed_sec" in m
    # no leftover tmp dirs (atomic rename)
    assert not any(p.endswith(".tmp") for p in os.listdir(out))


def test_write_pair_report(ray_session, tiny_corpus, tmp_path):
    """S7 analog: human-readable capped pair report."""
    import ray.data

    from hsearch_ray.config import PipelineConfig
    from hsearch_ray.pipelines.dedup import dedup_pipeline
    from hsearch_ray.pipelines.outputs import write_pair_report

    corpus, _ = tiny_corpus
    res = dedup_pipeline(ray.data.from_arrow(corpus), PipelineConfig())
    path = str(tmp_path / "pairs.txt")
    n = write_pair_report(res.pairs, path, limit=10)
    assert 0 < n <= 10
    lines = open(path).read().splitlines()
    assert lines[0].startswith("#")
    assert len(lines) == n + 1
    a, b, score, method = lines[1].split("\t")
    assert int(a) < int(b) and 0.0 <= float(score) <= 1.0
