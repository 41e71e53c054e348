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

import ray


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


@ray.remote
def _write_one_shard(in_file: str, out_dir: str, tag: str, fn) -> int:
    """Transform + write ONE input shard, memory-bounded by row-group
    streaming (never the whole shard in heap), atomically: data file
    renamed into place BEFORE the .done marker appears, so a crash
    between the two leaves a re-doable shard, never a lying marker."""
    import pyarrow.parquet as _pq

    tmp = os.path.join(out_dir, tag + ".parquet.tmp")
    dst = os.path.join(out_dir, tag + ".parquet")
    pf = _pq.ParquetFile(in_file)
    n = 0
    writer = None
    try:
        for batch in pf.iter_batches(batch_size=65536):
            import pyarrow as _pa

            t = _pa.Table.from_batches([batch])
            if fn is not None:
                t = fn(t)
            if writer is None:
                writer = _pq.ParquetWriter(tmp, t.schema)
            writer.write_table(t)
            n += t.num_rows
        if writer is None:  # empty shard: keep an empty file for schema
            writer = _pq.ParquetWriter(tmp, pf.schema_arrow)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, dst)
    with open(os.path.join(out_dir, tag + ".done"), "w") as f:
        json.dump({"input": in_file, "rows": n}, f)
    return n


def resumable_shard_write(input_files, out_dir: str, fn=None,
                          max_in_flight: int = 64) -> dict:
    """Resumable partitioned sink: one output parquet + ``.done`` marker
    per INPUT shard, so a failed 100-TB run re-does only the missing
    shards (the prompt-level resume contract; ``state/lineage.py`` is
    the whole-stage analog).  A raw-task escape hatch BY DESIGN: the
    per-shard transform must be a pure per-row map/filter (no cross-
    shard state), which is exactly when shard-grain resume is sound —
    wide stages resume via lineage checkpoints instead.  Tasks are
    throttled with a ``ray.wait`` sliding window so a million-shard
    corpus never floods the scheduler; ``out_dir`` must be storage all
    nodes share.  Returns {written_shards, skipped_shards, rows}."""
    os.makedirs(out_dir, exist_ok=True)
    pending: list[tuple[str, str]] = []
    skipped = 0
    for i, f in enumerate(sorted(input_files)):
        tag = f"shard-{i:05d}"
        if os.path.exists(os.path.join(out_dir, tag + ".done")):
            skipped += 1
            continue
        pending.append((f, tag))
    rows = 0
    in_flight: list = []
    for f, tag in pending:
        if len(in_flight) >= max_in_flight:
            done, in_flight = ray.wait(in_flight, num_returns=1)
            rows += sum(ray.get(done))
        in_flight.append(_write_one_shard.remote(f, out_dir, tag, fn))
    rows += sum(ray.get(in_flight))
    return {"written_shards": len(pending), "skipped_shards": skipped,
            "rows": rows}


def hive_partitioned_write(ds, out_dir: str, partition_col: str) -> dict:
    """Key-partitioned parquet sink — hive layout (one
    ``col=value/`` directory per partition value), the "one directory
    per key range" resumable-output shape: a failed downstream consumer
    re-reads only the partitions it needs, and partition pruning at the
    read is free (``read_parquet(out_dir/col=value)``).

    Rides Ray Data's native ``write_parquet(partition_cols=...)`` (each
    task writes its block's partition slices — no extra shuffle), made
    atomic with the repo-standard tmp+rename.  Returns a {value: rows}
    manifest computed DISTRIBUTED: per-block value counts combine on
    the driver (O(blocks x values) rows, never the data)."""
    import pandas as pd

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[partition_col].value_counts()
        return pd.DataFrame({"v": vc.index.astype(str),
                             "n": vc.to_numpy()})

    parts = ds.map_batches(_counts, batch_format="pandas").to_pandas()
    manifest = ({} if parts.empty else
                {str(v): int(n) for v, n in
                 parts.groupby("v")["n"].sum().items()})

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, partition_cols=[partition_col])
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_rows_per_file: int = 1 << 20) -> int:
    """Small-file compaction — the maintenance pass a long-running
    100-TB pipeline needs when incremental runs leave thousands of tiny
    shards: stream the directory back in and rewrite it with
    ``max_rows_per_file`` bounded (Ray packs blocks into files at the
    write; no driver materialization, no full shuffle).  Returns the
    number of output files."""
    ds = ray.data.read_parquet(in_dir)
    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp, min_rows_per_file=target_rows_per_file,
                     max_rows_per_file=target_rows_per_file)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
