"""Exact content dedup: sha256 keep-first by min file_id — WITHOUT
shuffling content.

Analog of the reference's exact dedup (D1/D2 in SURVEY.md §2.7: global
unordered_set in /root/reference/IGC/shuffle_data/IGC/pep2kmers.cpp:22,33-35
and sorted-run collapse in gen_kmers_from_suffix_array.cpp:51-65).

Plan (combiner + broadcast semi-join; no full-row shuffle at all):
  1. Narrow partial aggregation over (sha256, file_id) only:
     per-batch pandas groupby -> (sha256, min file_id, count) partials,
     combined once (stages.agg).  Bytes moved ~= 80B/row, not content.
  2. Only hashes with count > 1 (actual duplicates) enter the broadcast
     ``dup_map {sha256: rep_id}`` — typically a tiny fraction of rows.
     Every row then tags itself via one dict lookup in map_batches.
  3. kept = rows whose file_id == rep (or sha unseen in dup_map);
     exact edges = (rep_id, file_id) for the rest.

Scale note (10^12 rows): when the duplicate-hash set outgrows broadcast,
step 2 becomes a Bloom filter (false positives re-checked by a hash join
of only the Bloom-positive rows) — the partial-agg pass is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from hsearch_ray.stages.agg import grouped_agg


def edges_from_tagged(batch: pa.Table) -> pa.Table:
    """Project a tagged batch to (a=rep_id, b=file_id) exact-dup edges."""
    keep = pc.invert(pc.equal(batch["file_id"], batch["rep_id"]))
    sub = batch.filter(keep)
    return pa.table({"a": sub["rep_id"].cast(pa.int64()),
                     "b": sub["file_id"].cast(pa.int64())})


def exact_dedup(ds):
    """normalized Dataset -> (tagged, kept, exact_edges).

    tagged : input + rep_id column (rep_id == file_id for non-dups)
    kept   : unique-content survivors (all original columns)
    exact_edges : (a=rep_id, b=file_id) rows for the duplicates
    """
    stats = grouped_agg(
        ds.select_columns(["sha256", "file_id"]),
        ["sha256"],
        {"file_id": ["min"]},
        count_alias="n",
    )
    dups = stats[stats["n"] > 1]
    dup_map = dict(zip(dups["sha256"], dups["file_id__min"].astype(np.int64)))
    ref = ray.put(dup_map)

    def tag(batch: pa.Table) -> pa.Table:
        dmap = ray.get(ref)
        sha = batch["sha256"].to_pylist()
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        rep = np.array([dmap.get(s, int(f)) for s, f in zip(sha, fid)], dtype=np.int64)
        return batch.append_column("rep_id", pa.array(rep, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    kept = tagged.filter(expr="file_id == rep_id")
    exact_edges = tagged.map_batches(edges_from_tagged, batch_format="pyarrow")
    return tagged, kept, exact_edges
