"""Flagship near-duplicate detection + clustering pipeline.

Composition (SURVEY.md §7.1):

  corpus -> normalize(+sha256/file_id)            stateless map_batches
         -> exact dedup (narrow partials +        no content shuffle
            broadcast dup map)
         -> sign (minhash) -> band explode        stateless, zero-copy
         -> candidate pairs                       SHUFFLE: one gkey sort
         -> distinct (a,b)                        SHUFFLE: one pair sort
         -> Verifier (exact Jaccard)              sharded zero-copy store
         -> union exact edges -> connected comps  tiny edge set
         -> attach cluster ids to every file      broadcast searchsorted

Execution-count discipline (the round-1 scaling lesson): every
``materialize()`` / driver combine is a separate dataset execution with
a fixed scheduling cost, so the pipeline materializes ONLY at true
multi-consumer boundaries — normalized corpus, bucket-run scan,
distinct pairs, verified pairs, CC edges.  Everything else chains into
those executions lazily.

Resume: with ``checkpoint_dir``, the 'tagged' and 'pairs' stages write
parquet + lineage manifests; on rerun, checkpoint validity is tested
FIRST and upstream stages are neither constructed nor executed when a
valid checkpoint covers them.  The fingerprint mixes the config knobs
with ``input_tag`` (caller-supplied input identity — path, snapshot id,
row count...) so a checkpoint never resumes onto a different corpus.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import ray.data

from hsearch_ray.config import PipelineConfig
from hsearch_ray.stages.exact_dedup import edges_from_tagged, exact_dedup
from hsearch_ray.stages.lsh import band_explode, candidate_pairs
from hsearch_ray.stages.normalize import normalize
from hsearch_ray.stages.signatures import sign
from hsearch_ray.stages.unionfind import attach_clusters, connected_components
from hsearch_ray.stages.verify import verify_pairs


@dataclass
class DedupResult:
    clusters: "ray.data.Dataset"       # (file_id, cluster_id) for every row
    pairs: "ray.data.Dataset"          # verified (a,b,jaccard,method)
    kept: "ray.data.Dataset"           # unique-content survivors
    metrics: dict = field(default_factory=dict)


def _project_edges(batch):
    import pyarrow as pa

    return pa.table({"a": batch["a"].cast(pa.int64()),
                     "b": batch["b"].cast(pa.int64())})


def dedup_pipeline(
    corpus_ds,
    cfg: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
    input_tag: str | None = None,
) -> DedupResult:
    """corpus Dataset (repo,path,commit,lang,content) -> DedupResult.

    ``checkpoint_dir`` enables parquet checkpoints + lineage manifests
    after the exact-dedup and verified-pairs stages (resume boundary);
    pass ``input_tag`` to identify the input corpus (required with
    checkpoints — a config-only fingerprint would silently resume onto
    a different input).
    """
    from hsearch_ray.state import lineage

    cfg = cfg or PipelineConfig()
    metrics: dict = {"config_seed": cfg.seed}
    t0 = time.perf_counter()

    if checkpoint_dir and input_tag is None:
        raise ValueError("checkpoint_dir requires input_tag (input identity "
                         "is part of the checkpoint fingerprint)")
    # EVERY knob that can change the checkpointed tables belongs here —
    # a missing knob means a config change silently resumes stale data
    fingerprint = (
        f"input={input_tag},seed={cfg.seed},k={cfg.shingle_k},"
        f"perms={cfg.num_perms},bands={cfg.num_bands},thr={cfg.jaccard_threshold},"
        f"scheme={cfg.minhash_scheme},canon={cfg.token_canonicalize},"
        f"edit={cfg.edit_verify}:{cfg.edit_band}:{cfg.edit_sim_threshold},"
        f"len={cfg.min_content_len}:{cfg.max_content_len},"
        f"skew={cfg.max_bucket_pairs_exhaustive}:{cfg.hot_bucket_window},"
        f"prefilter={cfg.use_sketch_prefilter}:{cfg.prefilter_hamming}"
    )
    tagged_dir = f"{checkpoint_dir}/tagged" if checkpoint_dir else None
    pairs_dir = f"{checkpoint_dir}/pairs" if checkpoint_dir else None
    tagged_ok = tagged_dir is not None and lineage.checkpoint_valid(tagged_dir, fingerprint)
    pairs_ok = pairs_dir is not None and lineage.checkpoint_valid(pairs_dir, fingerprint)

    stage_t: dict[str, float] = {}
    _last = time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal _last
        now = time.perf_counter()
        stage_t[name] = round(now - _last, 3)
        _last = now

    if tagged_ok:
        # resume short-circuit: upstream stages are not even constructed
        tagged = lineage.load_checkpoint(tagged_dir)
        content_src = tagged  # file-backed; build_store materializes it
        metrics["resumed_from"] = "tagged"
        _mark("normalize")
        _mark("exact_dedup")
    else:
        # Parallelism floor: a single-block input (from_arrow, one parquet
        # file with one row group) would serialize every downstream stage
        # to one task.  Split to ~2 blocks per CPU so task pools fill;
        # repartition without shuffle just splits block boundaries.
        import ray as _ray

        target_blocks = max(8, int(_ray.cluster_resources().get("CPU", 8)) * 2)
        try:
            known_blocks = corpus_ds.num_blocks()  # known when materialized
        except NotImplementedError:
            known_blocks = None
        if known_blocks is not None and known_blocks < target_blocks:
            corpus_ds = corpus_ds.repartition(target_blocks)

        # normalize once and pin: every downstream consumer (dedup stats,
        # tag, sign, verify store, attach) reads the pinned blocks instead
        # of re-running sha256 over the corpus.
        norm = normalize(corpus_ds).materialize()
        content_src = norm  # already materialized: the store build scans
        # its blocks directly (no second content copy for `kept`)
        _mark("normalize")
        tagged, _, _ = exact_dedup(norm)
        _mark("exact_dedup")
        if tagged_dir:
            tagged = lineage.write_checkpoint(tagged, tagged_dir, fingerprint, "tagged")

    kept = tagged.filter(expr="file_id == rep_id")
    exact_edges = tagged.map_batches(edges_from_tagged, batch_format="pyarrow")

    if pairs_ok:
        verified = lineage.load_checkpoint(pairs_dir)
        metrics["resumed_pairs"] = True
        _mark("sign_band_candidates")
        _mark("verify")
    else:
        # similarity path over unique contents within size bounds; chains
        # lazily into the candidate-pair sort (no extra execution)
        sim_input = kept.filter(
            expr=f"size >= {cfg.min_content_len} and size <= {cfg.max_content_len}"
        )
        sigs = sign(sim_input, cfg)
        banded = band_explode(sigs, cfg)
        cand, cand_ids, lsh_metrics = candidate_pairs(banded, cfg)
        metrics.update(lsh_metrics)
        _mark("sign_band_candidates")

        verified = verify_pairs(cand, content_src, cfg, ids=cand_ids)
        if pairs_dir:
            verified = lineage.write_checkpoint(
                verified, pairs_dir, fingerprint, "pairs", metrics=metrics
            )
        else:
            verified = verified.materialize()
        _mark("verify")

    edges = verified.map_batches(_project_edges, batch_format="pyarrow").union(exact_edges)
    roots = connected_components(edges)
    _mark("connected_components")
    clusters = attach_clusters(tagged, roots)
    _mark("attach")

    # pair table parity with reference_impl: exact-dup edges appear as
    # (rep, dup, 1.0, "exact") rows alongside the verified LSH pairs
    def _exact_as_pairs(batch):
        import pyarrow as pa

        n = batch.num_rows
        return pa.table(
            {
                "a": batch["a"].cast(pa.int64()),
                "b": batch["b"].cast(pa.int64()),
                "jaccard": pa.array([1.0] * n, pa.float64()),
                "method": pa.array(["exact"] * n, pa.string()),
            }
        )

    pairs = verified.union(
        exact_edges.map_batches(_exact_as_pairs, batch_format="pyarrow")
    )

    metrics["stage_sec"] = stage_t
    metrics["elapsed_sec"] = round(time.perf_counter() - t0, 3)
    return DedupResult(clusters=clusters, pairs=pairs, kept=kept, metrics=metrics)
