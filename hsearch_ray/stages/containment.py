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

import numpy as np
import pyarrow as pa
import ray

from hsearch_ray import hashing as H
from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages.agg import grouped_agg
from hsearch_ray.stages.verify import Verifier, build_store, candidate_ids

PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def explode_fingerprints(sig_ds):
    """signatures(with fps) -> (fp, file_id) posting rows."""

    def _explode(batch: pa.Table) -> pa.Table:
        fids = batch["file_id"].to_numpy(zero_copy_only=False)
        fps = batch["fps"].to_pylist()
        lens = np.array([len(f) for f in fps], dtype=np.int64)
        flat = np.concatenate([np.asarray(f, dtype=np.int64) for f in fps]) if len(fps) else np.empty(0, np.int64)
        return pa.table(
            {
                "fp": pa.array(flat, pa.int64()),
                "file_id": pa.array(np.repeat(fids, lens), pa.int64()),
            }
        )

    return sig_ds.map_batches(_explode, batch_format="pyarrow", batch_size=2048)


def _emit_fp_pairs(cap: int):
    def emit(group: pa.Table) -> pa.Table:
        fids = np.unique(group["file_id"].to_numpy(zero_copy_only=False))
        n = fids.size
        if n < 2:
            return PAIR_SCHEMA.empty_table()
        if n > cap:
            # boilerplate fingerprint (license headers etc.) — a hot key;
            # star to min keeps cost O(n) (documented truncation)
            a = np.full(n - 1, fids[0], dtype=np.int64)
            return pa.table({"a": pa.array(a, pa.int64()),
                             "b": pa.array(fids[1:], pa.int64())})
        ii, jj = np.triu_indices(n, k=1)
        return pa.table({"a": pa.array(fids[ii], pa.int64()),
                         "b": pa.array(fids[jj], pa.int64())})

    return emit


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
        oa, ob, oc = [], [], []
        for i in candidates:
            sa = self._slice(sa_idx[i], pa_pos[i])
            sb = self._slice(sb_idx[i], pb_pos[i])
            c = H.intersect_count(sa, sb) / min(sa.size, sb.size)
            if c >= thr:
                oa.append(int(a[i]))
                ob.append(int(b[i]))
                oc.append(c)
        return pa.table(
            {
                "a": pa.array(oa, pa.int64()),
                "b": pa.array(ob, pa.int64()),
                "containment": pa.array(oc, pa.float64()),
                "method": pa.array(["containment"] * len(oa), pa.string()),
            }
        )


def containment_pairs(sig_ds, corpus_ds, cfg: PipelineConfig):
    """signatures(with fps) + corpus -> verified containment pairs
    (a, b, containment, method).  SHUFFLEs: fp groupby + (a,b) distinct."""
    postings = explode_fingerprints(sig_ds).materialize()
    # prefilter singleton fingerprints (vectorized partial agg + broadcast
    # key set) so the pair-emission groupby only moves pairable postings
    fp_stats = grouped_agg(postings, ["fp"], {}, count_alias="n")
    pairable = fp_stats.loc[fp_stats["n"] >= 2, "fp"].to_numpy(dtype=np.int64)
    pairable.sort()
    pairable_ref = ray.put(pairable)

    def _keep_pairable(batch: pa.Table) -> pa.Table:
        from hsearch_ray.stages.verify import _in_sorted

        fp = batch["fp"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_in_sorted(ray.get(pairable_ref), fp)))

    raw_pairs = (
        postings.map_batches(_keep_pairable, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(_emit_fp_pairs(cfg.max_bucket_pairs_exhaustive), batch_format="pyarrow")
    )
    counts = grouped_agg(raw_pairs, ["a", "b"], {}, count_alias="n_common")
    counts = counts[counts["n_common"] >= cfg.containment_min_common]
    if counts.empty:
        cand = ray.data.from_arrow(
            pa.schema([("a", pa.int64()), ("b", pa.int64())]).empty_table()
        )
    else:
        cand = ray.data.from_arrow(
            pa.table({"a": pa.array(counts["a"].to_numpy(dtype=np.int64), pa.int64()),
                      "b": pa.array(counts["b"].to_numpy(dtype=np.int64), pa.int64())})
        )
    ids = candidate_ids(cand)
    if ids.size == 0:
        return ray.data.from_arrow(
            pa.schema(
                [("a", pa.int64()), ("b", pa.int64()),
                 ("containment", pa.float64()), ("method", pa.string())]
            ).empty_table()
        )
    store_ref = build_store(corpus_ds, ids, cfg)

    def _verify_task(batch: pa.Table) -> pa.Table:
        return _ContainmentVerifier(cfg, store_ref)(batch)

    return cand.map_batches(
        _verify_task,
        batch_format="pyarrow",
        batch_size=cfg.verify_batch_size,
    )
