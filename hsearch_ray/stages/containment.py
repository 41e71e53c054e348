"""Near-containment pass: shared-substring detection via winnowing
fingerprints.

Reference analog: the global suffix array finds exact shared substrings
across the corpus by sorting every suffix position and collapsing equal
k-prefix runs (/root/reference/IGC/shuffle_data/IGC/suffix_array.cpp:72-84,
gen_kmers_from_suffix_array.cpp:51-65 — a sort-merge self-join, J5).

At 10^12-file scale a per-position global sort is the most expensive
possible shuffle (one key per BYTE of corpus).  The equivalent
equivalence-classing with bounded cost is winnowing (Schleimer et al.,
SIGMOD 2003): per file keep the minimum rolling hash of each
w-shingle window — files sharing a substring of length >= w+k-1 share
its window minima.  The fingerprint explode + groupby below is then
exactly the suffix-run grouping, with ~|content|/w keys per file
instead of |content|.

Verification computes containment = |A ∩ B| / min(|A|,|B|) over FULL
shingle sets (not just fingerprints), mirroring the exact-verify
discipline of the main path.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import ray

from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages.verify import Verifier, build_store


def explode_fingerprints(sig_ds):
    """signatures(with fps) -> (gkey=fp, file_id) posting rows — the
    keyed input of the shared sorted-run pair machinery (lsh.py).

    Zero-copy over the Arrow list column: the flattened values and the
    offsets buffer are viewed directly (lens = diff(offsets), values
    restricted to [offsets[0], offsets[-1]) — slice-local, so a sliced
    batch never re-reads its parent), no per-row Python lists."""

    def _explode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema(
                [("gkey", pa.int64()), ("file_id", pa.int64())]
            ).empty_table()
        fids = batch["file_id"].to_numpy(zero_copy_only=False)
        col = batch["fps"].combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = col.values.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        flat = values[offsets[0]:offsets[-1]]
        return pa.table(
            {
                "gkey": pa.array(flat.astype(np.int64, copy=False), pa.int64()),
                "file_id": pa.array(np.repeat(fids, lens), pa.int64()),
            }
        )

    return sig_ds.map_batches(_explode, batch_format="pyarrow", batch_size=2048)


class _ContainmentVerifier(Verifier):
    """Shares the sharded zero-copy shingle store with the Jaccard
    verifier; the verdict function is containment = |A∩B| / min(|A|,|B|)
    (no size-ratio prefilter — containment is attainable at any ratio)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        thr = self.cfg.containment_threshold
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        sa_idx, pa_pos, a_ok, na = self._locate(a)
        sb_idx, pb_pos, b_ok, nb = self._locate(b)
        candidates = np.nonzero(a_ok & b_ok & (na > 0) & (nb > 0))[0]
        if candidates.size == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "containment": pa.array([], pa.float64()),
                    "method": pa.array([], pa.string()),
                }
            )
        # one vectorized gather+merge pass for the whole batch (shared
        # with the Jaccard verifier; VERDICT-r2 item 5)
        inter = self._pair_intersections(
            candidates, sa_idx, pa_pos, sb_idx, pb_pos, na, nb
        )
        c_val = inter / np.minimum(na[candidates], nb[candidates])
        adm = c_val >= thr
        sel = candidates[adm]
        return pa.table(
            {
                "a": pa.array(a[sel], pa.int64()),
                "b": pa.array(b[sel], pa.int64()),
                "containment": pa.array(c_val[adm], pa.float64()),
                "method": pa.array(["containment"] * sel.size, pa.string()),
            }
        )


@functools.lru_cache(maxsize=8)
def _cached_containment_verifier(store_ref, cfg: PipelineConfig):
    """Per-process verifier cache (the verify._cached_verifier / lsh.
    _kv_lookup discipline): lazily-fetched store shards survive across
    batches instead of re-fetching per batch."""
    return _ContainmentVerifier(cfg, store_ref)


def containment_pairs(sig_ds, corpus_ds, cfg: PipelineConfig):
    """signatures(with fps) + corpus -> verified containment pairs
    (a, b, containment, method).

    Physical plan = the LSH candidate path's sorted-run machinery
    (lsh.counted_pairs_from_keyed): one sort by fingerprint + vectorized
    run scan (hot boilerplate fingerprints hub-starred), one sort by
    (a, b) counting shared fingerprints per pair — no per-key Python,
    no driver combine.  Pairs sharing >= containment_min_common
    fingerprints are exactly verified on the shared store."""
    from hsearch_ray.stages.lsh import counted_pairs_from_keyed

    postings = explode_fingerprints(sig_ds)
    counted, ids = counted_pairs_from_keyed(
        postings, cfg.max_bucket_pairs_exhaustive
    )
    cand = counted.filter(expr=f"n >= {cfg.containment_min_common}").map_batches(
        lambda t: pa.table({"a": t["a"].cast(pa.int64()),
                            "b": t["b"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    if ids.size == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()),
                 ("containment", pa.float64()), ("method", pa.string())]
            ).empty_table()
        )
    store_ref = build_store(corpus_ds, ids, cfg)

    def _verify_task(batch: pa.Table) -> pa.Table:
        return _cached_containment_verifier(store_ref, cfg)(batch)

    return cand.map_batches(
        _verify_task,
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
    )
