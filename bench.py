"""Benchmark harness.

Default mode: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:

  {"metric": "dedup_pipeline_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "corpus_files": F, "files_per_sec": F/sec}

The headline is the flagship near-dup pipeline (normalize -> exact dedup
-> MinHash sign -> LSH bands -> verify -> connected components) over the
documents table amplified ~AMPLIFYx with seeded near-clone mutations
(deterministic; planted dups make the dedup path do real work).

--scaling: runs bench.py twice in FRESH processes at num_cpus=8 and 32
on the same input (sandbox stand-in for N vs 4N nodes), prints both
throughputs + scaling efficiency, and records them in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
AMPLIFY = int(os.environ.get("GRAFT_BENCH_AMPLIFY", "4"))


def _amplified_corpus(sf_dir: str, factor: int):
    """documents -> corpus-shaped Arrow table replicated `factor`x with
    seeded mutations (copy 0 = original; copies >0 = near/exact clones)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = docs["text"].to_pylist()
    doc_id = docs["doc_id"].to_numpy(zero_copy_only=False)
    src = docs["source"].to_pylist()
    lang = docs["lang"].to_pylist()
    rng = np.random.Generator(np.random.PCG64(42))
    repo, path, commit, langs, content = [], [], [], [], []
    for copy in range(factor):
        for i, t in enumerate(texts):
            if copy == 0:
                body = t
                kind = "orig"
            elif copy % 3 == 1:
                body = t  # exact clone under a different path
                kind = "exact"
            else:
                words = t.split(" ")
                for _ in range(1 + int(rng.integers(0, 3))):
                    j = int(rng.integers(0, len(words)))
                    words[j] = words[j] + "x"
                body = " ".join(words)
                kind = "near"
            repo.append(f"src/{src[i]}")
            path.append(f"doc/{int(doc_id[i])}_{copy}_{kind}.txt")
            commit.append("head")
            langs.append(lang[i])
            content.append(body)
    return pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(content, pa.string()),
        }
    )


def run_bench() -> dict:
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hsearch_ray.config import PipelineConfig
    from hsearch_ray.pipelines import queries as Q
    from hsearch_ray.pipelines.dedup import dedup_pipeline

    timings: dict[str, float] = {}

    # warm the page cache (untimed)
    ray.data.read_parquet(f"{SF_DIR}/documents.parquet").count()
    ray.data.read_parquet(f"{SF_DIR}/lineitem.parquet").count()

    corpus = _amplified_corpus(SF_DIR, AMPLIFY)
    n_files = corpus.num_rows

    t0 = time.perf_counter()
    res = dedup_pipeline(ray.data.from_arrow(corpus), PipelineConfig())
    n_clusters = res.clusters.count()
    headline = time.perf_counter() - t0
    timings["dedup_pipeline"] = round(headline, 3)

    def bench_q(name: str, fn):
        t = time.perf_counter()
        out = fn(SF_DIR)
        # consume (Dataset is lazy; DataFrame already materialized)
        if hasattr(out, "count"):
            out.count()
        timings[name] = round(time.perf_counter() - t, 3)

    bench_q("q1_pricing_summary", Q.q1_pricing_summary)
    bench_q("orders_by_nation", Q.q_orders_by_nation)
    bench_q("token_count_docs", Q.q_token_count_docs)
    bench_q("exact_dedup_docs", Q.q_exact_dedup_docs)
    bench_q("ann_topk", Q.q_ann_topk)
    bench_q("containment_pairs_docs", Q.q_containment_pairs_docs)

    result = {
        "metric": "dedup_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "corpus_files": n_files,
        "clusters_rows": n_clusters,
        "files_per_sec": round(n_files / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (the sandbox
    stand-in for N vs 4N nodes per the driver instruction)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    thr_lo, thr_hi = lo["files_per_sec"], hi["files_per_sec"]
    eff = (thr_hi / thr_lo) / (32 / 8)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "files_per_sec_8": thr_lo,
        "files_per_sec_32": thr_hi,
        "corpus_files": hi["corpus_files"],
        "sf": SF_DIR,
    }
    _record_baseline(result)
    return result


def _record_baseline(result: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    marker = "## Measured (bench.py --scaling)"
    block = (
        f"{marker}\n\n"
        f"| metric | value |\n|---|---|\n"
        f"| corpus files | {result['corpus_files']} |\n"
        f"| wall sec @ num_cpus=8 | {result['sec_8']} |\n"
        f"| wall sec @ num_cpus=32 | {result['sec_32']} |\n"
        f"| files/sec @ 8 | {result['files_per_sec_8']} |\n"
        f"| files/sec @ 32 | {result['files_per_sec_32']} |\n"
        f"| scaling efficiency (8 -> 32 cpus, ideal 4x) | {result['value']} |\n"
    )
    try:
        with open(path) as f:
            txt = f.read()
        txt = txt.split(marker)[0].rstrip() + "\n\n" + block
        with open(path, "w") as f:
            f.write(txt)
    except OSError:
        pass


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
