"""Output sinks: write a DedupResult as partitioned parquet + metrics.

Analog of the reference's file writers (M8 hits writer
pcluster/src/pcluster/hash_search.cpp:1288-1308, cluster file writer
hclust/src/hclust/hclust2.cpp:137-150, points writer
protein2datapoints.cpp:33-73) — unified as one parquet directory per
logical table plus a job-level metrics JSON, written atomically
(tmp + rename) so a rerun can skip completed outputs.
"""

from __future__ import annotations

import json
import os
import shutil


def write_outputs(result, out_dir: str) -> dict:
    """Write clusters/, pairs/, kept_manifest/ parquet dirs + metrics.json.
    Returns a small summary dict."""
    os.makedirs(out_dir, exist_ok=True)
    summary: dict = {}
    for name, ds in (
        ("clusters", result.clusters),
        ("pairs", result.pairs),
    ):
        target = os.path.join(out_dir, name)
        tmp = target + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ds.write_parquet(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.replace(tmp, target)
        summary[name] = target
    # survivors manifest: narrow (file_id, sha256) — enough to re-derive
    # the kept set without rewriting content
    manifest = result.kept.select_columns(["file_id", "sha256"])
    target = os.path.join(out_dir, "kept_manifest")
    tmp = target + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    manifest.write_parquet(tmp)
    if os.path.exists(target):
        shutil.rmtree(target)
    os.replace(tmp, target)
    summary["kept_manifest"] = target

    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(result.metrics, f, indent=2, default=str)
    summary["metrics"] = os.path.join(out_dir, "metrics.json")
    return summary


def write_pair_report(pairs_ds, path: str, limit: int = 10_000) -> int:
    """Human-readable pair report (S7 analog: the alignment text writer,
    pcluster/src/pcluster/hash_search.cpp:1275-1286) — a DEBUG sink, so
    it deliberately caps at ``limit`` rows; the parquet pairs table is
    the machine-readable output.  Returns the number of rows written."""
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "w") as f:
        f.write("# a\tb\tscore\tmethod\n")
        for row in pairs_ds.limit(limit).iter_rows():
            f.write(f"{int(row['a'])}\t{int(row['b'])}\t"
                    f"{row['jaccard']:.6f}\t{row['method']}\n")
            n += 1
    os.replace(tmp, path)
    return n
