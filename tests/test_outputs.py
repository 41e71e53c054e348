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


def test_cli_dedup_roundtrip(tmp_path):
    """python -m hsearch_ray dedup: end-to-end CLI over parquet, with
    checkpointed resume (separate Ray session per invocation)."""
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq2

    from hsearch_ray.corpus import generate_corpus

    corpus, _ = generate_corpus(n_files=60, seed=21)
    cdir = tmp_path / "corpus"
    cdir.mkdir()
    pq2.write_table(corpus, str(cdir / "part-0.parquet"))

    def run():
        out = subprocess.run(
            [sys.executable, "-m", "hsearch_ray", "dedup",
             "--input", str(cdir), "--out", str(tmp_path / "out"),
             "--checkpoint", str(tmp_path / "ckpt"),
             "--input-tag", "t", "--num-cpus", "4"],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    s1 = run()
    assert s1["clusters_rows"] == 60
    c1 = pq2.read_table(s1["clusters"]).to_pydict()
    s2 = run()  # resumes from the checkpoints; identical output
    c2 = pq2.read_table(s2["clusters"]).to_pydict()
    assert sorted(zip(c1["file_id"], c1["cluster_id"])) == sorted(
        zip(c2["file_id"], c2["cluster_id"])
    )
