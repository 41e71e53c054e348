"""Normalize + fingerprint stage (stateless map_batches).

Analog of the reference's validating FASTA reader
(/root/reference/pcluster/src/pcluster/read_proteins.cpp:6-41) — but
deterministic: where the reference replaces unknown symbols with a
RANDOM residue (read_proteins.cpp:31, non-reproducible), we keep raw
bytes exactly and assert the per-row sha256 invariant
(BASELINE.json.input_hint) at every stage.

Adds:
  file_id : int63 digest of (repo, path, commit)   [row identity]
  sha256  : hex digest of RAW content bytes         [exact-dup key]
  sha_hi/sha_lo : first 128 digest bits as two int64 columns — the
      vectorizable exact-dup grouping key (numpy/pandas group int
      columns at C speed; 64-char hex strings don't).  128 bits is the
      same key width the DuckDB md5 oracle groups on; a collision needs
      two distinct contents sharing a 128-bit digest prefix.
  size    : content byte length
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from hsearch_ray import hashing as H


def normalize_batch(batch: pa.Table) -> pa.Table:
    if "content" not in batch.column_names:
        raise ValueError(
            "corpus input must carry a 'content' column (expected schema: "
            "repo, path, commit, lang, content — or file_id + content); got "
            f"columns {batch.column_names}"
        )
    content = batch["content"].cast(pa.large_binary()).to_pylist()
    n = len(content)
    if "file_id" not in batch.column_names:
        # derive row identity from the key columns; callers may instead
        # supply their own id column (e.g. doc_id) upstream
        repo = batch["repo"].to_pylist()
        path = batch["path"].to_pylist()
        commit = batch["commit"].to_pylist()
        fid = [H.file_id_from_key(repo[i], path[i], commit[i]) for i in range(n)]
        batch = batch.append_column("file_id", pa.array(fid, pa.int64()))
    digests = [hashlib.sha256(c).digest() for c in content]
    sha = [d.hex() for d in digests]
    packed = (
        np.frombuffer(b"".join(d[:16] for d in digests), dtype="<i8").reshape(n, 2)
        if n
        else np.empty((0, 2), dtype=np.int64)
    )
    size = [len(c) for c in content]
    return (
        batch.append_column("sha256", pa.array(sha, pa.string()))
        .append_column("sha_hi", pa.array(packed[:, 0], pa.int64()))
        .append_column("sha_lo", pa.array(packed[:, 1], pa.int64()))
        .append_column("size", pa.array(size, pa.int64()))
    )


def normalize(ds, batch_size: int = 2048):
    """corpus Dataset -> corpus + (file_id, sha256, size)."""
    return ds.map_batches(normalize_batch, batch_format="pyarrow", batch_size=batch_size)
