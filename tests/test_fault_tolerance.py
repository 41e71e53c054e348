"""Fault-tolerance gates: the engine must survive transient worker
loss (the dominant failure at 100-TB scale — OOM-killed or preempted
workers) without losing or duplicating rows.

Ray tasks retry worker CRASHES by default (max_retries=3), so every
stateless map stage in this repo inherits crash tolerance for free;
these tests prove it end-to-end by injecting a real worker death
(os._exit, indistinguishable from an OOM kill) exactly once and
asserting bit-identical results against a clean run.

Application-level exceptions are deliberately NOT retried: the sources
validate loudly (see test_jsonl_reader_validates) because silently
retrying a deterministic data error would loop forever at scale.
"""

import os
import tempfile

import numpy as np
import pandas as pd
import ray


def test_map_stage_survives_worker_crash(ray_session):
    """A worker death mid-map must be retried transparently and the
    retried task must produce the exact same rows (no loss, no dupes)."""
    marker = tempfile.mktemp(prefix="graft_crash_")

    def crash_once(df: pd.DataFrame) -> pd.DataFrame:
        if int(df["x"].iloc[0]) == 0 and not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("1")
            os._exit(1)
        return pd.DataFrame({"x": df["x"], "y": df["x"] * 2})

    ds = ray.data.from_pandas(
        [pd.DataFrame({"x": np.arange(i * 10, i * 10 + 10, dtype=np.int64)})
         for i in range(4)]
    )
    out = ds.map_batches(crash_once, batch_format="pandas").to_pandas()
    assert os.path.exists(marker), "the crash was never injected"
    assert len(out) == 40
    assert sorted(out["x"]) == list(range(40))
    assert (out.sort_values("x")["y"].to_numpy()
            == np.arange(40) * 2).all()


def test_flagship_survives_worker_crash(ray_session):
    """The full dedup pipeline with a worker death injected into its
    input stage must produce cluster assignments identical to a clean
    run — crash tolerance composes through sort/groupby/verify stages,
    not just the single map that crashed."""
    from hsearch_ray.config import PipelineConfig
    from hsearch_ray.corpus import generate_corpus
    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, _ = generate_corpus(n_files=120, seed=9)
    cfg = PipelineConfig()

    clean = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
    clean_df = clean.clusters.to_pandas().sort_values("file_id")

    marker = tempfile.mktemp(prefix="graft_crash_")

    def crash_once(df: pd.DataFrame) -> pd.DataFrame:
        if not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("1")
            os._exit(1)
        return df

    wounded_input = ray.data.from_arrow(corpus).map_batches(
        crash_once, batch_format="pandas")
    wounded = dedup_pipeline(wounded_input, cfg)
    wounded_df = wounded.clusters.to_pandas().sort_values("file_id")

    assert os.path.exists(marker), "the crash was never injected"
    pd.testing.assert_frame_equal(
        clean_df.reset_index(drop=True), wounded_df.reset_index(drop=True)
    )


def test_flagship_invariant_under_tiny_blocks(ray_session):
    """Block-size independence at the WHOLE-PIPELINE level: shrinking
    target_max_block_size ~1000x (so every stage sees many tiny blocks
    — the spill/backpressure regime a 100-TB run lives in) must produce
    byte-identical cluster assignments."""
    import ray.data

    from hsearch_ray.config import PipelineConfig
    from hsearch_ray.corpus import generate_corpus
    from hsearch_ray.pipelines.dedup import dedup_pipeline

    corpus, _ = generate_corpus(n_files=150, seed=31)
    cfg = PipelineConfig()
    baseline = dedup_pipeline(
        ray.data.from_arrow(corpus), cfg
    ).clusters.to_pandas().sort_values("file_id").reset_index(drop=True)

    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 64 * 1024  # ~1000x below default
        tiny = dedup_pipeline(
            ray.data.from_arrow(corpus), cfg
        ).clusters.to_pandas().sort_values("file_id").reset_index(drop=True)
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(baseline, tiny)
