"""CLI entry point — the analog of the reference's per-binary surface
(pcluster/hclust2/... flags, hclust2.cpp:178-213) collapsed into one
command over parquet tables:

  python -m hsearch_ray dedup --input corpus/ --out out/ \
      [--checkpoint ckpt/ --input-tag snapshot-07] [--threshold 0.7]
      [--shingle-k 9] [--bands 16] [--rows-per-band 8] [--seed 42]
      [--canonicalize] [--edit-verify] [--num-cpus N]

Reads (repo, path, commit, lang, content) parquet, runs the flagship
near-dup pipeline, writes clusters/, pairs/, kept_manifest/ and
metrics.json via pipelines.outputs.  Owns its Ray session (guarded init
+ shutdown) per the driver contract — the library itself never inits.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hsearch_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dedup", help="near-duplicate detection + clustering")
    d.add_argument("--input", required=True, help="parquet file/dir of the corpus")
    d.add_argument("--out", required=True, help="output directory")
    d.add_argument("--checkpoint", default=None, help="checkpoint directory")
    d.add_argument("--input-tag", default=None,
                   help="input identity for checkpoint fingerprinting "
                        "(required with --checkpoint)")
    d.add_argument("--threshold", type=float, default=0.7)
    d.add_argument("--shingle-k", type=int, default=9)
    d.add_argument("--bands", type=int, default=16)
    d.add_argument("--rows-per-band", type=int, default=8)
    d.add_argument("--seed", type=int, default=42)
    d.add_argument("--canonicalize", action="store_true",
                   help="identifier/whitespace canonicalization before shingling")
    d.add_argument("--edit-verify", action="store_true",
                   help="token-similarity tier for borderline pairs")
    d.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        import ray.data

        from hsearch_ray.config import PipelineConfig
        from hsearch_ray.pipelines.dedup import dedup_pipeline
        from hsearch_ray.pipelines.outputs import write_outputs

        cfg = PipelineConfig(
            jaccard_threshold=args.threshold,
            shingle_k=args.shingle_k,
            num_bands=args.bands,
            rows_per_band=args.rows_per_band,
            num_perms=args.bands * args.rows_per_band,
            seed=args.seed,
            token_canonicalize=args.canonicalize,
            edit_verify=args.edit_verify,
        )
        corpus = ray.data.read_parquet(args.input)
        res = dedup_pipeline(corpus, cfg, checkpoint_dir=args.checkpoint,
                             input_tag=args.input_tag)
        summary = write_outputs(res, args.out)
        summary["clusters_rows"] = res.clusters.count()
        print(json.dumps(summary, default=str))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
