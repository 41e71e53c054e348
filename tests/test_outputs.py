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


def test_resumable_shard_write_skips_done_shards(ray_session, tmp_path):
    """Shard-grain resume: first run writes every shard; deleting three
    .done markers makes a rerun redo EXACTLY those three (skip proven by
    the summary counts and untouched mtimes), and the union of shard
    outputs equals the direct transform of the whole input."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq2

    from hsearch_ray.pipelines.outputs import resumable_shard_write

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    files = []
    for i in range(8):
        t = pa.table({
            "doc_id": pa.array(range(i * 100, i * 100 + 100), pa.int64()),
            "n": pa.array([i] * 100, pa.int64()),
        })
        p = str(in_dir / f"part-{i}.parquet")
        pq2.write_table(t, p)
        files.append(p)

    def double(t: pa.Table) -> pa.Table:
        return t.set_column(1, "n", pc.multiply(t["n"], 2))

    out = tmp_path / "out"
    s1 = resumable_shard_write(files, str(out), fn=double, max_in_flight=3)
    assert s1 == {"written_shards": 8, "skipped_shards": 0, "rows": 800}

    kept_mtimes = {
        f: os.stat(out / f"shard-{i:05d}.parquet").st_mtime_ns
        for i, f in enumerate(sorted(files)) if i >= 3
    }
    for i in range(3):
        os.remove(out / f"shard-{i:05d}.done")
    s2 = resumable_shard_write(files, str(out), fn=double, max_in_flight=3)
    assert s2 == {"written_shards": 3, "skipped_shards": 5, "rows": 300}
    for i, f in enumerate(sorted(files)):
        if i >= 3:
            assert os.stat(out / f"shard-{i:05d}.parquet").st_mtime_ns \
                == kept_mtimes[f]

    got = pq2.read_table([str(out / f"shard-{i:05d}.parquet")
                          for i in range(8)])
    want = double(pq2.read_table(files))
    assert got.sort_by("doc_id").equals(want.sort_by("doc_id"))
    assert not any(p.endswith(".tmp") for p in os.listdir(out))


def test_hive_partitioned_write_and_compaction(ray_session, tmp_path):
    """The key-partitioned sink must produce the hive layout with a
    correct distributed manifest, round-trip every row, support
    partition-pruned reads, and the compactor must coalesce many tiny
    shards into few files with identical content."""
    import json

    import pandas as pd
    import pyarrow.parquet as pq2
    import ray.data

    from hsearch_ray.pipelines.outputs import (compact_parquet_dir,
                                               hive_partitioned_write)

    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "by_lang")
    manifest = hive_partitioned_write(
        ray.data.from_pandas(src).repartition(8), out, "lang")
    assert manifest == src["lang"].value_counts().astype(int).to_dict()
    with open(f"{out}/_manifest.json") as f:
        assert json.load(f) == manifest
    # hive layout + partition-pruned read
    langs = sorted(d.split("=")[1] for d in os.listdir(out)
                   if d.startswith("lang="))
    assert langs == sorted(manifest)
    one = ray.data.read_parquet(f"{out}/lang={langs[0]}").count()
    assert one == manifest[langs[0]]
    # full round-trip (partition col is re-derived from the dir name)
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == len(src)
    assert sorted(back["doc_id"]) == sorted(src["doc_id"])
    # compaction: many tiny files -> 1 file, identical content
    tiny = str(tmp_path / "tiny")
    ray.data.from_pandas(src).repartition(16).write_parquet(tiny)
    n_before = len([f for f in os.listdir(tiny) if f.endswith(".parquet")])
    compact = str(tmp_path / "compact")
    n_after = compact_parquet_dir(tiny, compact, target_rows_per_file=100_000)
    assert n_before > n_after
    got = pq2.read_table(compact).sort_by("doc_id")
    assert got.equals(pq2.read_table(tiny).sort_by("doc_id"))
