"""Multimodal plumbing: schema, 1->N sampling, decode-stub dispatch."""

import json

import numpy as np
import pyarrow as pa
import pytest


def _media_table(n=10):
    rng = np.random.Generator(np.random.PCG64(7))
    payloads = [rng.integers(0, 256, size=int(rng.integers(100, 5000)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    mimes = ["image/png" if i % 3 else "audio/wav" for i in range(n)]
    metas = [json.dumps({"n_frames": 25}) for _ in range(n)]
    return pa.table(
        {
            "media": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def test_featurize_schema_and_determinism(ray_session):
    import ray.data

    from hsearch_ray.stages.multimodal import FEATURE_DIM, featurize_media

    tbl = _media_table(12)
    out1 = featurize_media(ray.data.from_arrow(tbl)).take_all()
    out2 = featurize_media(ray.data.from_arrow(tbl)).take_all()
    assert len(out1) == 12
    assert all(len(r["feature"]) == FEATURE_DIM for r in out1)
    assert all(r["decoded"] for r in out1)
    d1 = {r["digest"]: list(r["feature"]) for r in out1}
    d2 = {r["digest"]: list(r["feature"]) for r in out2}
    assert d1 == d2  # deterministic features per payload


def test_featurize_unsupported_mime(ray_session):
    import ray.data

    from hsearch_ray.stages.multimodal import featurize_media

    tbl = pa.table(
        {
            "media": pa.array([b"abc"], pa.binary()),
            "mime": pa.array(["application/pdf"], pa.string()),
            "meta": pa.array(["{}"], pa.string()),
        }
    )
    out = featurize_media(ray.data.from_arrow(tbl)).take_all()
    assert out[0]["decoded"] is False or out[0]["decoded"] == False  # noqa: E712


def test_frame_sample_explosion(ray_session):
    import ray.data

    from hsearch_ray.stages.multimodal import frame_sample

    tbl = _media_table(4)
    out = frame_sample(ray.data.from_arrow(tbl), every_n=10).take_all()
    # 25 frames, every 10th -> frames 0,10,20 => 3 rows per media row
    assert len(out) == 12
    assert sorted({r["frame_no"] for r in out}) == [0, 10, 20]
