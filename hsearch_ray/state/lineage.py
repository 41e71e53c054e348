"""Per-stage parquet checkpoints with lineage manifests (north-rule
resumability).

The reference's only "checkpointing" is its multi-binary file-handoff
chain (each tool writes files the next reads; e.g. the suffix array is
written once and reused, /root/reference/IGC/shuffle_data/IGC/
suffix_array.cpp:88-93, gen_kmers_from_suffix_array.cpp:46).  Here each
stage can write its output Dataset to parquet plus a ``_lineage.json``
manifest (input fingerprint, row count, wall time); a rerun with the
same fingerprint short-circuits to ``read_parquet`` — completed stages
are skipped, which is what resume-from-checkpoint means for a batch
pipeline.

Writes are atomic: data lands in ``<dir>.tmp`` then renames to
``<dir>``, so a killed run never leaves a half-valid checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_lineage.json")


def checkpoint_valid(stage_dir: str, fingerprint: str) -> bool:
    try:
        with open(_manifest_path(stage_dir)) as f:
            m = json.load(f)
        return m.get("fingerprint") == fingerprint and m.get("complete") is True
    except (OSError, json.JSONDecodeError):
        return False


def write_checkpoint(ds, stage_dir: str, fingerprint: str, stage: str,
                     metrics: dict | None = None):
    """Write ds -> parquet dir + manifest, atomically. Returns a
    re-read Dataset (so downstream consumers read from disk instead of
    re-executing the producing pipeline)."""
    tmp = stage_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    elapsed = time.perf_counter() - t0
    out = ray.data.read_parquet(tmp)
    n = out.count()
    # per-partition lineage: row count + bytes per written file, so a
    # resumed / auditing run can validate each partition independently
    import pyarrow.parquet as pq

    partitions = []
    for name in sorted(os.listdir(tmp)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(tmp, name)
        meta = pq.ParquetFile(path).metadata
        partitions.append(
            {"file": name, "rows": meta.num_rows, "bytes": os.path.getsize(path)}
        )
    with open(_manifest_path(tmp), "w") as f:
        json.dump(
            {
                "stage": stage,
                "fingerprint": fingerprint,
                "rows": n,
                "elapsed_write_sec": round(elapsed, 3),
                "partitions": partitions,
                "metrics": metrics or {},
                "complete": True,
            },
            f,
            indent=2,
        )
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.replace(tmp, stage_dir)
    return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])


def load_checkpoint(stage_dir: str):
    return ray.data.read_parquet(stage_dir, file_extensions=["parquet"])


def read_manifest(stage_dir: str) -> dict:
    with open(_manifest_path(stage_dir)) as f:
        return json.load(f)
