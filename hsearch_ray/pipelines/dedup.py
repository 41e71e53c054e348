"""Flagship near-duplicate detection + clustering pipeline.

Composition (SURVEY.md §7.1):

  corpus -> normalize(+sha256/file_id)            stateless map_batches
         -> exact dedup groupby(sha256)           SHUFFLE 1
         -> Signer actor pool (minhash+simhash)   stateful, zero-copy Arrow
         -> band explode -> bucket stats          SHUFFLE 2 (narrow)
         -> candidate pairs (cold groupby /       SHUFFLE 3
            hot hub-star broadcast)
         -> distinct (a,b)                        SHUFFLE 4 (narrow)
         -> Verifier actor pool (exact Jaccard)   stateful, broadcast contents
         -> union exact edges -> connected comps  SHUFFLES 5.. (tiny edge set)
         -> attach cluster ids to every file

Each numbered shuffle is listed in the returned metrics; optional
checkpoints after exact-dedup / signatures / pairs make the run
resumable (state.lineage).
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


def dedup_pipeline(
    corpus_ds,
    cfg: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
) -> DedupResult:
    """corpus Dataset (repo,path,commit,lang,content) -> DedupResult.

    ``checkpoint_dir`` enables parquet checkpoints + lineage manifests
    after the exact-dedup and verified-pairs stages (resume boundary).
    """
    from hsearch_ray.state import lineage

    cfg = cfg or PipelineConfig()
    metrics: dict = {"config_seed": cfg.seed}
    t0 = time.perf_counter()

    fingerprint = f"seed={cfg.seed},k={cfg.shingle_k},perms={cfg.num_perms},bands={cfg.num_bands},thr={cfg.jaccard_threshold}"

    # Parallelism floor: a single-block input (from_arrow, one parquet
    # file with one row group) would serialize every downstream stage to
    # one task.  Split to ~2 blocks per CPU so actor pools actually fill;
    # repartition without shuffle just splits/coalesces block boundaries.
    import ray as _ray

    target_blocks = max(8, int(_ray.cluster_resources().get("CPU", 8)) * 2)
    try:
        known_blocks = corpus_ds.num_blocks()  # only known when materialized
    except NotImplementedError:
        known_blocks = None
    if known_blocks is not None and known_blocks < target_blocks:
        corpus_ds = corpus_ds.repartition(target_blocks)

    # normalize once and pin: every downstream consumer (dedup stats, tag,
    # kept, verification content fetch, cluster attach) reads the pinned
    # blocks instead of re-running sha256 over the corpus.  At design
    # scale this boundary is the first parquet checkpoint.
    stage_t: dict[str, float] = {}
    _last = time.perf_counter()

    def _mark(name: str) -> None:
        nonlocal _last
        now = time.perf_counter()
        stage_t[name] = round(now - _last, 3)
        _last = now

    norm = normalize(corpus_ds).materialize()
    _mark("normalize")
    tagged, kept, exact_edges = exact_dedup(norm)
    _mark("exact_dedup")

    if checkpoint_dir:
        stage_dir = f"{checkpoint_dir}/tagged"
        if lineage.checkpoint_valid(stage_dir, fingerprint):
            tagged = lineage.load_checkpoint(stage_dir)
            metrics["resumed_from"] = "tagged"
        else:
            tagged = lineage.write_checkpoint(tagged, stage_dir, fingerprint, "tagged")
        kept = tagged.filter(expr="file_id == rep_id")
        exact_edges = tagged.map_batches(edges_from_tagged, batch_format="pyarrow")

    # similarity path over unique contents within size bounds
    sim_input = kept.filter(
        expr=f"size >= {cfg.min_content_len} and size <= {cfg.max_content_len}"
    )
    sigs = sign(sim_input, cfg)
    banded = band_explode(sigs, cfg)
    cand, lsh_metrics = candidate_pairs(banded, cfg)
    metrics.update(lsh_metrics)
    _mark("sign_band_candidates")

    verified = verify_pairs(cand, kept, cfg)
    if checkpoint_dir:
        stage_dir = f"{checkpoint_dir}/pairs"
        if lineage.checkpoint_valid(stage_dir, fingerprint):
            verified = lineage.load_checkpoint(stage_dir)
            metrics["resumed_pairs"] = True
        else:
            verified = lineage.write_checkpoint(
                verified, stage_dir, fingerprint, "pairs", metrics=lsh_metrics
            )
    else:
        verified = verified.materialize()
    _mark("verify")

    edges = verified.select_columns(["a", "b"]).union(exact_edges)
    roots = connected_components(edges)
    _mark("connected_components")
    clusters = attach_clusters(tagged.select_columns(["file_id"]), roots)

    _mark("attach")
    metrics["stage_sec"] = stage_t
    metrics["elapsed_sec"] = round(time.perf_counter() - t0, 3)
    return DedupResult(clusters=clusters, pairs=verified, kept=kept, metrics=metrics)
