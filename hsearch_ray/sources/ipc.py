"""Arrow IPC (Feather v2) source/sink — the zero-copy interchange
format, implemented as the engine's CUSTOM-DATASOURCE pattern: Ray Data
has no read_ipc, so the reader composes ``read_binary_files`` (shard
parallelism, streaming) with a per-file ``pyarrow.ipc`` decode inside
``map_batches`` — the template for any file format the built-in readers
lack.  The writer is shard-parallel with the repo's atomic-rename
discipline (data fully written BEFORE it becomes visible), so a reader
never sees a torn file.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import ray.data


def write_ipc(ds, out_dir: str) -> int:
    """One .arrow (IPC file format) shard per block, written to a temp
    name and atomically renamed into place.  Returns the number of
    shards written.  Shard-parallel; nothing lands on the driver but
    the per-shard row counts."""
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        name = uuid.uuid4().hex
        tmp = os.path.join(out_dir, f".{name}.tmp")
        dst = os.path.join(out_dir, f"{name}.arrow")
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, batch.schema) as w:
                w.write_table(batch)
        os.rename(tmp, dst)
        return pa.table({"shard": pa.array([dst], pa.string()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    manifest = ds.map_batches(_write, batch_format="pyarrow").to_pandas()
    return len(manifest)


def read_ipc(dir_or_file: str, required: tuple[str, ...] = ()):
    """Validating Arrow-IPC reader: ``read_binary_files`` distributes
    the shard list; each worker decodes its files with the streaming
    IPC reader (zero-copy to Arrow) and fails loudly on a shard missing
    a required column — the JSONL reader's schema-drift discipline."""
    files = ray.data.read_binary_files(
        dir_or_file, file_extensions=["arrow"])

    def _decode(batch: dict) -> pa.Table:
        tables = []
        for raw in batch["bytes"]:
            t = pa.ipc.open_file(pa.BufferReader(raw)).read_all()
            for c in required:
                if c not in t.schema.names:
                    raise ValueError(
                        f"ipc shard missing required column {c!r}; "
                        f"got {t.schema.names}")
            tables.append(t)
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(_decode, batch_format="numpy", batch_size=4)
