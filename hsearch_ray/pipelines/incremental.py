"""Incremental (snapshot-vs-index) near-dup dedup.

The op a continuously-ingesting pipeline runs on every new batch: flag
each NEW doc that near-duplicates any doc already in the standing
index, WITHOUT re-paying the index side's signing cost per run.

Reference analog: the file-handoff chain reuses the suffix array built
once (/root/reference/IGC/shuffle_data/IGC/suffix_array.cpp:88-93 writes
it; gen_kmers_from_suffix_array.cpp:46 re-reads it) — here the standing
artifact is the index side's banded signature postings, written as a
lineage checkpoint (parquet + fingerprint manifest) on first run and
LOADED on every later run, so only the new batch pays normalize + sign.

Within-batch (new vs new) duplicates are the flagship pipeline's job,
deliberately out of scope here: the cross-side filter keeps index-vs-new
pairs only.
"""

from __future__ import annotations

from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages.lsh import band_explode, candidate_pairs
from hsearch_ray.stages.signatures import sign
from hsearch_ray.stages.verify import verify_pairs


def _index_fingerprint(cfg: PipelineConfig, index_tag: str) -> str:
    """Every knob that can change the banded signature postings; the
    dedup_pipeline fingerprint discipline (dedup.py) minus the
    verify-only knobs (threshold, edit tier, prefilter), which do not
    touch the checkpointed artifact."""
    return (
        f"input={index_tag},seed={cfg.seed},k={cfg.shingle_k},"
        f"perms={cfg.num_perms},bands={cfg.num_bands},"
        f"scheme={cfg.minhash_scheme},canon={cfg.token_canonicalize}"
    )


def incremental_dedup_pairs(
    index_norm_ds,
    new_norm_ds,
    split_id: int,
    cfg: PipelineConfig,
    checkpoint_dir: str | None = None,
    index_tag: str | None = None,
):
    """(index corpus, new corpus) -> (verified cross-side pairs, metrics).

    Both inputs are NORMALIZED corpora (stages.normalize schema) with
    DISJOINT id spaces: index file_ids < ``split_id`` <= new file_ids
    (caller contract — canonical a < b pairs then make the cross filter
    a < split_id <= b exact).

    With ``checkpoint_dir``, the index side's banded postings are the
    standing checkpointed artifact: written under
    ``<checkpoint_dir>/index_banded`` on first run; later runs with a
    matching fingerprint LOAD it and never construct the index sign
    stage (metrics["index_resumed"] = True).  ``index_tag`` identifies
    the index corpus (path / snapshot id / mtime) and is part of the
    fingerprint, so a changed index never resumes stale postings.

    Candidate generation is ONE bucket-key sort over the union of both
    sides' postings (the flagship machinery, skew handling included);
    verification builds the shingle store over candidate ids only, from
    whichever side's blocks hold them.
    """
    metrics: dict = {"index_resumed": False}
    if checkpoint_dir is not None:
        from hsearch_ray.state import lineage

        if index_tag is None:
            raise ValueError("checkpoint_dir requires index_tag (index corpus "
                             "identity is part of the checkpoint fingerprint)")
        fp = _index_fingerprint(cfg, index_tag)
        idx_dir = f"{checkpoint_dir}/index_banded"
        if lineage.checkpoint_valid(idx_dir, fp):
            idx_banded = lineage.load_checkpoint(idx_dir)
            metrics["index_resumed"] = True
        else:
            idx_banded = band_explode(sign(index_norm_ds, cfg), cfg)
            idx_banded = lineage.write_checkpoint(
                idx_banded, idx_dir, fp, "index_banded"
            )
    else:
        idx_banded = band_explode(sign(index_norm_ds, cfg), cfg)

    new_banded = band_explode(sign(new_norm_ds, cfg), cfg)
    cand, _, lsh_metrics = candidate_pairs(idx_banded.union(new_banded), cfg)
    metrics.update(lsh_metrics)
    cross = cand.filter(
        expr=f"a < {split_id} and b >= {split_id}"
    ).materialize()
    # the store build filters to candidate ids, so only pair-referenced
    # docs (a narrow set) are shingled from either side's blocks
    content = index_norm_ds.union(new_norm_ds)
    verified = verify_pairs(cross, content, cfg)
    return verified, metrics


def per_new_doc_summary(verified_df, new_ids_df) -> "pd.DataFrame":
    """Verified cross pairs (driver frame, O(new-batch dups)) -> one row
    per NEW doc: match count, best index match (min id among max rounded
    jaccard), rounded best jaccard, is_dup flag.  Driver-side by design:
    output is O(new batch), not O(corpus)."""
    import pandas as pd

    vdf = verified_df
    if vdf.empty:
        agg = pd.DataFrame(
            columns=["doc_id", "n_matches", "best_match", "best_jaccard"]
        )
    else:
        vdf = vdf.copy()
        vdf["jaccard"] = vdf["jaccard"].round(6)
        vdf = vdf.sort_values(["b", "jaccard", "a"],
                              ascending=[True, False, True])
        agg = vdf.groupby("b", as_index=False).agg(
            n_matches=("a", "count"), best_jaccard=("jaccard", "max")
        )
        agg = agg.merge(
            vdf.drop_duplicates("b")[["b", "a"]].rename(
                columns={"a": "best_match"}
            ),
            on="b",
        ).rename(columns={"b": "doc_id"})

    out = new_ids_df.merge(agg, on="doc_id", how="left")
    out["n_matches"] = out["n_matches"].fillna(0).astype("int64")
    out["best_match"] = out["best_match"].fillna(-1).astype("int64")
    out["best_jaccard"] = out["best_jaccard"].fillna(0.0).astype("float64")
    out["is_dup"] = out["n_matches"] > 0
    return out[["doc_id", "n_matches", "best_match", "best_jaccard", "is_dup"]]
