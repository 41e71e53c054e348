"""Checkpointed-index reuse for incremental snapshot-vs-index dedup:
the index side's banded signatures are signed ONCE, persisted via
lineage.write_checkpoint, and later runs load the artifact instead of
re-signing (the reference's suffix-array reuse discipline,
gen_kmers_from_suffix_array.cpp:46)."""

import numpy as np
import pyarrow as pa

from hsearch_ray.config import PipelineConfig


def _texts(rng, n, length=60):
    words = [f"tok{i:03d}" for i in range(50)]
    return [
        " ".join(words[int(rng.integers(0, 50))] for _ in range(length))
        for _ in range(n)
    ]


def _side(ids, texts):
    n = len(ids)
    return pa.table(
        {
            "repo": pa.array(["r"] * n, pa.string()),
            "path": pa.array([f"p{i}" for i in ids], pa.string()),
            "commit": pa.array(["c"] * n, pa.string()),
            "lang": pa.array(["py"] * n, pa.string()),
            "content": pa.array(texts, pa.string()),
            "file_id": pa.array(list(ids), pa.int64()),
        }
    )


def _pairs(verified_ds):
    df = verified_ds.to_pandas()
    return sorted(zip(df["a"].astype(int), df["b"].astype(int)))


def test_index_checkpoint_reuse(ray_session, tmp_path, monkeypatch):
    import ray.data

    from hsearch_ray.pipelines import incremental
    from hsearch_ray.stages.normalize import normalize

    rng = np.random.default_rng(11)
    idx_texts = _texts(rng, 20)
    extra = _texts(rng, 4)
    # light edit of an index doc -> a true cross-side near-dup
    near = idx_texts[3].replace(idx_texts[3][:6], "tok049", 1)
    ids_idx = list(range(20))
    ids_new = [100, 101, 102, 103, 104]
    idx_norm = normalize(
        ray.data.from_arrow(_side(ids_idx, idx_texts))
    ).materialize()
    new_norm = normalize(
        ray.data.from_arrow(_side(ids_new, [near] + extra))
    ).materialize()

    cfg = PipelineConfig()
    calls = {"n": 0}
    real_sign = incremental.sign

    def counting_sign(ds, c, **kw):
        calls["n"] += 1
        return real_sign(ds, c, **kw)

    monkeypatch.setattr(incremental, "sign", counting_sign)
    ck = str(tmp_path / "incr")

    v1, m1 = incremental.incremental_dedup_pairs(
        idx_norm, new_norm, 100, cfg, checkpoint_dir=ck, index_tag="snap1"
    )
    p1 = _pairs(v1)
    assert m1["index_resumed"] is False
    assert calls["n"] == 2  # both sides signed on the first run
    assert (3, 100) in p1  # the planted cross-side near-dup was found

    calls["n"] = 0
    v2, m2 = incremental.incremental_dedup_pairs(
        idx_norm, new_norm, 100, cfg, checkpoint_dir=ck, index_tag="snap1"
    )
    assert m2["index_resumed"] is True
    assert calls["n"] == 1  # ONLY the new side signed: index loaded from disk
    assert _pairs(v2) == p1  # identical result from the checkpointed artifact

    # a different index identity must invalidate the checkpoint
    calls["n"] = 0
    _, m3 = incremental.incremental_dedup_pairs(
        idx_norm, new_norm, 100, cfg, checkpoint_dir=ck, index_tag="snap2"
    )
    assert m3["index_resumed"] is False
    assert calls["n"] == 2


def test_checkpoint_requires_index_tag(ray_session, tmp_path):
    import pytest
    import ray.data

    from hsearch_ray.pipelines.incremental import incremental_dedup_pairs
    from hsearch_ray.stages.normalize import normalize

    rng = np.random.default_rng(3)
    ds = normalize(ray.data.from_arrow(_side([0, 1], _texts(rng, 2))))
    with pytest.raises(ValueError):
        incremental_dedup_pairs(
            ds, ds, 1, PipelineConfig(), checkpoint_dir=str(tmp_path / "x")
        )
