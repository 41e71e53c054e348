"""Exact duplicated-n-gram accounting over the whole corpus — the
engine's analog of the reference's global suffix-array shared-substring
pass (/root/reference/IGC/shuffle_data/IGC/suffix_array.cpp:72-84 sorts
all 2.47e9 suffix positions single-threaded with std::sort;
gen_kmers_from_suffix_array.cpp:51-65 then scans the sorted runs), and
the primitive behind exact-substring training-data dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022).

Ray-Data-first shape — nothing corpus-sized ever lands on the driver:

1. per-batch posting partials: each doc's positional k-gram stream (the
   ONE-pass rolling hash over the batch's concatenated Arrow buffer,
   ``signatures.batched_streams``) collapses to DISTINCT (gram, doc)
   rows carrying the doc's position count, so within-doc repeats never
   reach the shuffle;
2. ONE distributed sort by gram hash — the suffix-array sort, but
   parallel and on 8-byte keys instead of 500-char suffix compares;
3. a vectorized per-block run scan classifies each gram as cross-doc
   duplicated (run length >= 2; (gram, doc) rows are globally unique
   because a doc lives in exactly one phase-1 batch), with block-edge
   runs spilled to a tiny per-key regroup (the lsh.py boundary
   discipline);
4. a distributed grouped sum builds the per-doc ledger.

64-bit rolling-hash grouping stands in for byte-exact gram grouping
(collision odds ~ n_grams^2 / 2^64 — the repo-wide argument).  Grams
are BYTE-level k-grams; on ASCII corpora this equals the char-level
definition a SQL oracle uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from hsearch_ray.stages.signatures import batched_streams

I64 = np.int64

_SCAN_SCHEMA = pa.schema(
    [("g", pa.int64()), ("doc_id", pa.int64()), ("cnt", pa.int64()),
     ("kind", pa.int8())]
)
_DOC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("cnt", pa.int64())])


def _gram_posting_partials(batch: pa.Table, k: int, id_col: str,
                           text_col: str) -> pa.Table:
    """One posting row per DISTINCT (gram, doc) in this batch with the
    doc's position count.  Docs shorter than k emit nothing (no k-gram
    exists — matches the SQL generate_series oracle)."""
    schema = pa.schema([("g", pa.int64()), ("doc_id", pa.int64()),
                        ("cnt", pa.int64())])
    if batch.num_rows == 0:
        return schema.empty_table()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(I64)
    col = batch[text_col].cast(pa.large_binary())
    blen = pc.binary_length(col).to_numpy(zero_copy_only=False)
    streams = batched_streams(col, k)
    keep = blen >= k
    if not keep.any():
        return schema.empty_table()
    kept = [s for s, m in zip(streams, keep) if m]
    lens = np.fromiter((s.size for s in kept), dtype=I64, count=len(kept))
    gi = np.concatenate(kept).view(I64)
    di = np.repeat(ids[keep], lens)
    # within-batch (doc, gram) combine: docs are whole within a batch,
    # so these rows are GLOBALLY unique per (gram, doc)
    order = np.lexsort((gi, di))
    gs, ds_ = gi[order], di[order]
    new = np.concatenate(([True], (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])))
    starts = np.nonzero(new)[0]
    cnt = np.diff(np.append(starts, gs.size))
    return pa.table({"g": pa.array(gs[starts], pa.int64()),
                     "doc_id": pa.array(ds_[starts], pa.int64()),
                     "cnt": pa.array(cnt.astype(I64), pa.int64())})


def _scan_gram_runs(batch: pa.Table) -> pa.Table:
    """One g-sorted block -> kind=0 rows (doc_id, cnt) for every posting
    whose gram's interior run has >= 2 docs, kind=1 spill rows (g,
    doc_id, cnt) for runs touching a block edge (they may continue next
    door; regrouped per key downstream — the _emit_bucket_runs
    discipline, lsh.py)."""
    n = batch.num_rows
    if n == 0:
        return _SCAN_SCHEMA.empty_table()
    g = batch["g"].to_numpy(zero_copy_only=False)
    d = batch["doc_id"].to_numpy(zero_copy_only=False)
    c = batch["cnt"].to_numpy(zero_copy_only=False)
    boundary = (g == g[0]) | (g == g[-1])
    gi, di, ci = g[~boundary], d[~boundary], c[~boundary]
    out_g, out_d, out_c, out_k = [g[boundary]], [d[boundary]], [c[boundary]], [
        np.ones(int(boundary.sum()), np.int8)
    ]
    if gi.size:
        starts = np.nonzero(np.concatenate(([True], gi[1:] != gi[:-1])))[0]
        lens = np.diff(np.append(starts, gi.size))
        dup = np.repeat(lens >= 2, lens)
        m = int(dup.sum())
        out_g.append(np.zeros(m, I64))
        out_d.append(di[dup])
        out_c.append(ci[dup])
        out_k.append(np.zeros(m, np.int8))
    return pa.table({
        "g": pa.array(np.concatenate(out_g).astype(I64), pa.int64()),
        "doc_id": pa.array(np.concatenate(out_d).astype(I64), pa.int64()),
        "cnt": pa.array(np.concatenate(out_c).astype(I64), pa.int64()),
        "kind": pa.array(np.concatenate(out_k), pa.int8()),
    })


def _emit_spill_postings(group: pa.Table) -> pa.Table:
    """One regrouped boundary gram: emit its postings iff >= 2 docs
    share it (rows are unique per (gram, doc) by construction)."""
    if group.num_rows < 2:
        return _DOC_SCHEMA.empty_table()
    return group.select(["doc_id", "cnt"])


def dup_ngram_stats(docs_ds, k: int, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Per-doc duplicated-k-gram ledger: for every doc holding at least
    one k-gram that also occurs in ANOTHER doc, the number of such
    distinct grams (``dup_grams``) and the total positions they cover
    (``dup_positions``).  Returns a Dataset with columns
    (doc_id, dup_grams, dup_positions) — one row per affected doc, so
    the result scales with the corpus and stays distributed."""
    from hsearch_ray.stages.agg import grouped_agg_ds

    postings = docs_ds.map_batches(
        _gram_posting_partials,
        fn_kwargs={"k": k, "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", batch_size=2048,
    )
    scanned = (
        postings.sort("g")
        .map_batches(_scan_gram_runs, batch_size=None, batch_format="pyarrow")
        .materialize()
    )
    interior = scanned.filter(expr="kind == 0").map_batches(
        lambda t: t.select(["doc_id", "cnt"]), batch_format="pyarrow"
    )
    spill = (
        scanned.filter(expr="kind == 1")
        .groupby("g")
        .map_groups(_emit_spill_postings, batch_format="pyarrow")
    )
    per_doc = grouped_agg_ds(
        interior.union(spill), ["doc_id"], {"cnt": ["sum"]},
        count_alias="dup_grams",
    )
    return per_doc.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=I64),
            "dup_grams": df["dup_grams"].to_numpy(dtype=I64),
            "dup_positions": df["cnt__sum"].to_numpy(dtype=I64),
        }),
        batch_format="pandas",
    )


# ------------------------------------------------------- span cutting
#
# Exact-substring span CUTTING — the rewrite step of Lee et al. (ACL
# 2022): every occurrence of a cross-doc duplicated k-gram is removed
# from every doc except the gram's canonical owner (min doc_id), and
# overlapping removals merge into spans.  The reference's suffix-array
# pass stops at the shared-substring LEDGER
# (gen_kmers_from_suffix_array.cpp:51-65); this operator completes the
# family by emitting the cleaned corpus itself.

_CUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("clean_text", pa.string()),
     ("n_cut", pa.int64())]
)


def _raw_views(batch: pa.Table, id_col: str, text_col: str):
    """(ids, byte offsets, concatenated raw bytes) zero-copy views of a
    string column — RAW bytes (no CRLF/canon edits), so gram positions
    map 1:1 onto the original text."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(I64)
    col = batch[text_col].cast(pa.large_binary())
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
    off = np.frombuffer(col.buffers()[1], dtype=np.int64,
                        count=len(col) + 1, offset=col.offset * 8)
    buf = col.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8)
            if buf is not None and len(buf) else np.empty(0, np.uint8))
    data = data[off[0]:off[-1]]
    return ids, off - off[0], data


def _positional_grams(off: np.ndarray, data: np.ndarray, k: int):
    """(gram hashes, owning-row index, data-space positions) for every
    in-doc k-gram window of a batch: ONE rolling-hash pass over the
    concatenated buffer, windows crossing doc boundaries not sliced."""
    from hsearch_ray import hashing as H
    from hsearch_ray.stages.verify import _concat_ranges

    glens = np.maximum(np.diff(off) - k + 1, 0)
    if int(glens.sum()) == 0:
        e = np.empty(0, I64)
        return e, e, e
    full = H.rolling_hash(data, k)
    pos = _concat_ranges(off[:-1][glens > 0], glens[glens > 0])
    docix = np.repeat(np.arange(glens.size, dtype=I64), glens)
    return full[pos].view(I64), docix, pos


def cut_dup_spans(docs_ds, k: int, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Rewrite every doc with its cross-doc duplicated k-gram spans cut.

    Semantics (deterministic, SQL-oracle-matched): a k-gram occurring
    in >= 2 docs has a canonical OWNER = the smallest doc_id holding
    it; in every other doc, all bytes covered by any occurrence of the
    gram are removed (covered = union of [p, p+k) windows).  The owner
    keeps its text for that gram, so exactly one copy of every shared
    substring survives corpus-wide.

    Physical plan: distinct (gram, doc) postings -> distributed grouped
    (min, count) -> duplicated grams only into an id-range-sharded kv
    store (gram hash -> owner) -> one cutting pass over the corpus that
    probes the store per batch and rebuilds each doc's bytes with a
    vectorized coverage diff-array.  Gram hashes are uniform, so every
    batch probes ~all shards: the store must fit aggregate cluster
    memory (it is the DUPLICATED-gram set only); beyond that, replace
    the probe with a sort-based semi-join on gram hash.  Byte-level
    cutting assumes ASCII text (multibyte chars could split)."""
    import ray as _ray

    from hsearch_ray.stages.agg import grouped_agg_ds
    from hsearch_ray.stages.lsh import _kv_lookup, build_kv_store

    def _postings(batch: pa.Table) -> pa.Table:
        schema = pa.schema([("g", pa.int64()), ("doc_id", pa.int64())])
        if batch.num_rows == 0:
            return schema.empty_table()
        ids, off, data = _raw_views(batch, id_col, text_col)
        gi, docix, _ = _positional_grams(off, data, k)
        if gi.size == 0:
            return schema.empty_table()
        di = ids[docix]
        order = np.lexsort((gi, di))
        gs, ds_ = gi[order], di[order]
        first = np.concatenate(
            ([True], (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])))
        return pa.table({"g": pa.array(gs[first], pa.int64()),
                         "doc_id": pa.array(ds_[first], pa.int64())})

    postings = docs_ds.map_batches(_postings, batch_format="pyarrow",
                                   batch_size=2048)
    # docs are whole within a batch => (g, doc) rows globally distinct,
    # so the grouped count is the number of docs holding the gram
    own = grouped_agg_ds(postings, ["g"], {"doc_id": ["min"]},
                         count_alias="nd")
    dup = own.filter(expr="nd >= 2")
    store_ref = _ray.put(build_kv_store(dup, "g", "doc_id__min"))

    def _cut(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _CUT_SCHEMA.empty_table()
        ids, off, data = _raw_views(batch, id_col, text_col)
        gi, docix, pos = _positional_grams(off, data, k)
        cover = np.zeros(data.size + 1, dtype=np.int64)
        if gi.size:
            owner, found = _kv_lookup(store_ref).lookup(gi)
            cutm = found & (owner != ids[docix])
            pcut = pos[cutm]
            np.add.at(cover, pcut, 1)
            np.add.at(cover, pcut + k, -1)  # p+k <= doc end <= data.size
        covered = np.cumsum(cover[:-1]) > 0
        texts: list[str] = []
        ncut = np.zeros(ids.size, dtype=I64)
        for i in range(ids.size):
            s, e = int(off[i]), int(off[i + 1])
            cv = covered[s:e]
            ncut[i] = int(cv.sum())
            texts.append(data[s:e][~cv].tobytes().decode("utf-8"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "clean_text": pa.array(texts, pa.string()),
            "n_cut": pa.array(ncut, pa.int64()),
        })

    return docs_ds.map_batches(_cut, batch_format="pyarrow",
                               batch_size=2048)
