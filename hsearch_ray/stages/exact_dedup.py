"""Exact content dedup: sha keep-first by min file_id — WITHOUT
shuffling content and WITHOUT per-row Python in any pass.

Analog of the reference's exact dedup (D1/D2 in SURVEY.md §2.7: global
unordered_set in /root/reference/IGC/shuffle_data/IGC/pep2kmers.cpp:22,33-35
and sorted-run collapse in gen_kmers_from_suffix_array.cpp:51-65).

Plan (combiner + broadcast semi-join; no full-row shuffle at all):
  1. Narrow partial aggregation over (sha_hi, sha_lo, file_id) only:
     per-batch numpy void-key groupby -> (key, min file_id, count)
     partials.  Bytes moved ~= 32B/row, not content.
  2. Driver combine on the partials is a single np.unique over the
     16-byte void keys + segment min/sum — C speed, no pandas string
     hashing (the round-1 driver-combine concern).
  3. Only keys with count > 1 (actual duplicates) enter the broadcast
     dup map (sorted void keys + rep ids, zero-copy numpy on ray.get);
     every row tags itself with ONE vectorized searchsorted.
  4. kept = rows whose file_id == rep_id; exact edges = (rep, file)
     for the rest.

Scale note (10^12 rows): when the duplicate-key set outgrows broadcast,
step 3 becomes a Bloom filter (false positives re-checked by a hash
join of only the Bloom-positive rows) — the partial-agg pass is
unchanged.  The partial combine itself switches to
``stages.agg.grouped_agg(mode="shuffle")`` when partial rows outgrow
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

V16 = np.dtype("V16")


def _void_keys(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Pack two int64 columns into a 16-byte void key (memcmp ordering:
    any consistent total order works for grouping)."""
    arr = np.empty(hi.size, dtype=[("a", "<i8"), ("b", "<i8")])
    arr["a"] = hi
    arr["b"] = lo
    return arr.view(V16).reshape(-1)


_PARTIAL_SCHEMA = pa.schema(
    [("sha_hi", pa.int64()), ("sha_lo", pa.int64()),
     ("min_fid", pa.int64()), ("n", pa.int64())]
)


def _sha_partial(batch: pa.Table) -> pa.Table:
    """(sha_hi, sha_lo, min file_id, count) partial rows — one per
    distinct key per batch, fully vectorized."""
    if batch.num_rows == 0:  # empty blocks occur post-sort/filter
        return _PARTIAL_SCHEMA.empty_table()
    hi = batch["sha_hi"].to_numpy(zero_copy_only=False)
    lo = batch["sha_lo"].to_numpy(zero_copy_only=False)
    fid = batch["file_id"].to_numpy(zero_copy_only=False)
    keys = _void_keys(hi, lo)
    order = np.argsort(keys, kind="stable")
    ks, fs = keys[order], fid[order]
    starts = np.nonzero(np.concatenate(([True], ks[1:] != ks[:-1])))[0]
    mins = np.minimum.reduceat(fs, starts) if fs.size else np.empty(0, np.int64)
    counts = np.diff(np.append(starts, ks.size))
    sel = order[starts]
    return pa.table(
        {
            "sha_hi": pa.array(hi[sel], pa.int64()),
            "sha_lo": pa.array(lo[sel], pa.int64()),
            "min_fid": pa.array(mins, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def edges_from_tagged(batch: pa.Table) -> pa.Table:
    """Project a tagged batch to (a=rep_id, b=file_id) exact-dup edges."""
    keep = pc.invert(pc.equal(batch["file_id"], batch["rep_id"]))
    sub = batch.filter(keep)
    return pa.table({"a": sub["rep_id"].cast(pa.int64()),
                     "b": sub["file_id"].cast(pa.int64())})


def exact_dedup(ds, driver_combine_max_rows: int = 8_000_000):
    """normalized Dataset -> (tagged, kept, exact_edges).

    tagged : input + rep_id column (rep_id == file_id for non-dups)
    kept   : unique-content survivors (all original columns)
    exact_edges : (a=rep_id, b=file_id) rows for the duplicates

    Partial combine auto-switch (the module-docstring scale rule, now
    wired): partial rows up to ``driver_combine_max_rows`` combine on
    the driver (one np.unique over 16-byte void keys — C speed); above
    it, the combine runs as a distributed sort-based ``grouped_agg_ds``
    and only the ACTUAL-DUPLICATE keys (count > 1, O(dups) by
    construction) ever reach the driver for the broadcast dup map.
    """
    partials = (
        ds.map_batches(_sha_partial, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )
    if partials.count() <= driver_combine_max_rows:
        pdf = partials.to_pandas()
        if len(pdf):
            keys = _void_keys(pdf["sha_hi"].to_numpy(dtype=np.int64),
                              pdf["sha_lo"].to_numpy(dtype=np.int64))
            mf = pdf["min_fid"].to_numpy(dtype=np.int64)
            cnt = pdf["n"].to_numpy(dtype=np.int64)
            order = np.argsort(keys, kind="stable")
            ks, mf, cnt = keys[order], mf[order], cnt[order]
            starts = np.nonzero(np.concatenate(([True], ks[1:] != ks[:-1])))[0]
            rep = np.minimum.reduceat(mf, starts)
            tot = np.add.reduceat(cnt, starts)
            dupmask = tot > 1
            dup_keys = ks[starts][dupmask]  # sorted void keys
            dup_reps = rep[dupmask]
        else:
            dup_keys = np.empty(0, dtype=V16)
            dup_reps = np.empty(0, dtype=np.int64)
    else:
        from hsearch_ray.stages.agg import grouped_agg_ds

        dup_pdf = (
            grouped_agg_ds(partials, ["sha_hi", "sha_lo"],
                           {"min_fid": ["min"], "n": ["sum"]})
            .filter(expr="n__sum > 1")
            .to_pandas()
        )
        if len(dup_pdf):
            keys = _void_keys(dup_pdf["sha_hi"].to_numpy(dtype=np.int64),
                              dup_pdf["sha_lo"].to_numpy(dtype=np.int64))
            order = np.argsort(keys, kind="stable")
            dup_keys = keys[order]
            dup_reps = dup_pdf["min_fid__min"].to_numpy(dtype=np.int64)[order]
        else:
            dup_keys = np.empty(0, dtype=V16)
            dup_reps = np.empty(0, dtype=np.int64)
    ref = ray.put((dup_keys, dup_reps))

    def tag(batch: pa.Table) -> pa.Table:
        dkeys, dreps = ray.get(ref)  # zero-copy numpy
        fid = batch["file_id"].to_numpy(zero_copy_only=False)
        if dkeys.size == 0:
            rep = fid
        else:
            keys = _void_keys(batch["sha_hi"].to_numpy(zero_copy_only=False),
                              batch["sha_lo"].to_numpy(zero_copy_only=False))
            pos = np.searchsorted(dkeys, keys)
            pos_c = np.minimum(pos, dkeys.size - 1)
            hit = dkeys[pos_c] == keys
            rep = np.where(hit, dreps[pos_c], fid)
        return batch.append_column("rep_id", pa.array(rep, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    kept = tagged.filter(expr="file_id == rep_id")
    exact_edges = tagged.map_batches(edges_from_tagged, batch_format="pyarrow")
    return tagged, kept, exact_edges
