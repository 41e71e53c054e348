"""Multimodal (image/audio/video) column stages — Ray-side plumbing.

Driver brief: treat media as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool map_batches stages.  The image/audio codecs are NOT in this
container, so the decode kernel is a clearly-marked deterministic FAKE
(`_fake_decode`) behind the same interface a real libjpeg/ffmpeg-backed
implementation would use — schema, batch sizing, actor signature and
output layout are real and tested (tests/test_multimodal.py).

Schema convention:
  media : binary            (opaque payload)
  mime  : string            ("image/png", "audio/wav", ...)
  meta  : string (JSON)     (width/height/sample_rate/... if known)

Batch sizing: payloads are large, so stages default to SMALL batch_size
(64) so batch x concurrency fits worker heaps (driver brief memory rule).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from hsearch_ray import hashing as H

FEATURE_DIM = 64


class MediaDecodeError(NotImplementedError):
    """Raised when a real codec would be required."""


def _fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in for a codec: derives a pseudo 'pixel/pcm'
    array from the payload bytes.  A real implementation would dispatch
    on mime to PIL / soundfile / pyav here and raise MediaDecodeError
    for unsupported types."""
    if not mime.startswith(("image/", "audio/", "video/")):
        raise MediaDecodeError(f"unsupported mime {mime!r}")
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(16, dtype=np.float32)
    return (b[: 4096].astype(np.float32) - 127.5) / 127.5


class MediaFeaturizer:
    """Actor-pool stage: media binary -> fixed-dim feature vector +
    content digest.  __init__ is where a real model/codec loads ONCE per
    actor; __call__ stays per batch."""

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.dim = feature_dim
        # real impl: load model weights / init codec contexts here
        rng = np.random.Generator(np.random.PCG64(0xFEA7))
        self.proj = rng.standard_normal((4096, feature_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["media"].cast(pa.large_binary()).to_pylist()
        mimes = batch["mime"].to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        digests = []
        ok = []
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            digests.append(H.sha256_hex(p))
            try:
                raw = _fake_decode(p, m)
                buf = np.zeros(4096, dtype=np.float32)
                buf[: raw.size] = raw[:4096]
                feats[i] = buf @ self.proj
                ok.append(True)
            except MediaDecodeError:
                ok.append(False)
        out = {
            "digest": pa.array(digests, pa.string()),
            "decoded": pa.array(ok, pa.bool_()),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.dim
            ),
        }
        for name in batch.column_names:
            if name not in ("media",):  # payload dropped after featurize
                out.setdefault(name, batch[name])
        return pa.table(out)


def featurize_media(ds, concurrency=(1, 4), batch_size: int = 64):
    """media Dataset -> features Dataset (actor pool; payloads are big so
    batches stay small)."""
    return ds.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample(ds, every_n: int = 10, batch_size: int = 64):
    """Video frame-sampling plumbing: 1 media row -> ceil(frames/every_n)
    sampled-frame rows.  Frame extraction itself is the stubbed decode;
    the 1->N row explosion, metadata threading, and output schema are
    the real pattern (M8 analog)."""

    def sample(batch: pa.Table) -> pa.Table:
        payloads = batch["media"].cast(pa.large_binary()).to_pylist()
        metas = batch["meta"].to_pylist()
        out_digest, out_frame, out_payload = [], [], []
        for p, meta in zip(payloads, metas):
            n_frames = int(json.loads(meta or "{}").get("n_frames", 1))
            digest = H.sha256_hex(p)
            for f in range(0, n_frames, every_n):
                out_digest.append(digest)
                out_frame.append(f)
                # real impl: decoded frame bytes; stub: payload slice
                out_payload.append(p[:64])
        return pa.table(
            {
                "digest": pa.array(out_digest, pa.string()),
                "frame_no": pa.array(out_frame, pa.int64()),
                "frame": pa.array(out_payload, pa.binary()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=batch_size)
