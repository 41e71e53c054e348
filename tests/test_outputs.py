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
