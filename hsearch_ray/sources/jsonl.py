"""JSONL source/sink — the raw-corpus interchange format.

Most web-scale pretraining corpora arrive as JSON-lines shards; this
module gives the engine a validating JSONL reader (the S1
reader/normalizer discipline applied to a second wire format — the TSV
reader in ``queries.q_tsv_lang_count_docs`` is the first) and a
shard-parallel writer.  Reading rides ``ray.data.read_json`` (Arrow's
JSON parser per shard, no driver-side parsing); validation is one
zero-copy ``map_batches`` pass.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def write_jsonl(ds, out_dir: str) -> None:
    """One .json (JSONL) file per block — shard-parallel, no driver
    materialization; pair with ``outputs.resumable_shard_write`` when
    shard-grain resume matters."""
    ds.write_json(out_dir)


def read_jsonl(path: str, required: tuple[str, ...] = (),
               int_cols: tuple[str, ...] = ()):
    """Validating JSONL reader: fail loudly on a shard missing a
    required column (a schema-drifted producer must not silently yield
    nulls downstream), null-check + cast id-like columns to int64 (JSON
    has no integer width; Arrow may infer a narrower or floating type
    on clean-looking shards)."""
    ds = ray.data.read_json(path)

    def _validate(batch: pa.Table) -> pa.Table:
        for c in required:
            if c not in batch.schema.names:
                raise ValueError(f"jsonl shard missing required column {c!r}; "
                                 f"got {batch.schema.names}")
        for c in int_cols:
            col = batch[c]
            if col.null_count:
                raise ValueError(f"jsonl column {c!r} has nulls")
            batch = batch.set_column(
                batch.schema.get_field_index(c), c, col.cast(pa.int64())
            )
        return batch

    return ds.map_batches(_validate, batch_format="pyarrow")
