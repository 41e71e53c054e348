"""Multimodal (image/audio/video) column stages.

Driver brief: treat media as opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
actor-pool map_batches stages.  Two REAL pure-python decoders ship in
this container: WAV (stdlib ``wave``; PCM8/16/32 -> float32) and PNG
(``zlib`` inflate + scanline un-filtering for 8-bit gray/RGB/RGBA).
Mimes the container genuinely cannot decode (JPEG/MP3/video codecs)
fall back to the clearly-marked deterministic ``_fake_decode`` so the
plumbing stays exercisable end-to-end; unknown mimes raise
MediaDecodeError.

Schema convention:
  media : binary            (opaque payload)
  mime  : string            ("image/png", "audio/wav", ...)
  meta  : string (JSON)     (width/height/sample_rate/... if known)

Batch sizing: payloads are large, so stages default to SMALL batch_size
(64) so batch x concurrency fits worker heaps (driver brief memory rule).
"""

from __future__ import annotations

import io
import json
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa

from hsearch_ray import hashing as H

FEATURE_DIM = 64


class MediaDecodeError(NotImplementedError):
    """Raised when no codec (real or stub) covers the mime type."""


def decode_wav(payload: bytes) -> np.ndarray:
    """stdlib-wave PCM decode -> float32 in [-1, 1] (channels interleaved)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:  # unsigned 8-bit
        return (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    if width == 2:
        return np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    if width == 4:
        return np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    raise MediaDecodeError(f"unsupported WAV sample width {width}")


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit only)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-python PNG decode (zlib inflate + filter reversal) for 8-bit
    gray/RGB/RGBA, non-interlaced -> float32 (h, w, c) in [0, 1]."""
    if payload[:8] != _PNG_MAGIC:
        raise MediaDecodeError("not a PNG stream")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise MediaDecodeError("malformed PNG")
    w, h, depth, ctype, _, _, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise MediaDecodeError(
            f"unsupported PNG (depth={depth}, color={ctype}, interlace={interlace})"
        )
    c = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise MediaDecodeError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f, cur = int(filters[y]), lines[y].copy()
        up = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = cur
        elif f == 2:  # Up
            out[y] = (cur + up) & 0xFF
        elif f == 1:
            # Sub's serial mod-256 recurrence out[x] = cur[x] + out[x-c]
            # IS a channel-wise cumulative sum (mod distributes over +)
            out[y] = (np.cumsum(cur.reshape(w, c).astype(np.int64), axis=0)
                      .reshape(stride) & 0xFF).astype(np.int32)
        elif f in (3, 4):  # Average / Paeth: left-to-right recurrence;
            # loop over pixels, vectorized across channels
            row2 = out[y].reshape(w, c)
            cur2 = cur.reshape(w, c)
            up2 = up.reshape(w, c)
            prev = np.zeros(c, dtype=np.int32)
            if f == 3:
                for x in range(w):
                    prev = (cur2[x] + ((prev + up2[x]) >> 1)) & 0xFF
                    row2[x] = prev
            else:
                upprev = np.zeros(c, dtype=np.int32)
                for x in range(w):
                    b = up2[x]
                    p = prev + b - upprev
                    pa_ = np.abs(p - prev)
                    pb_ = np.abs(p - b)
                    pc_ = np.abs(p - upprev)
                    pred = np.where(
                        (pa_ <= pb_) & (pa_ <= pc_), prev,
                        np.where(pb_ <= pc_, b, upprev),
                    )
                    prev = (cur2[x] + pred) & 0xFF
                    row2[x] = prev
                    upprev = b
        else:
            raise MediaDecodeError(f"unknown PNG filter {f}")
    return out.astype(np.float32).reshape(h, w, c) / 255.0


def _fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in for codecs absent from this container
    (libjpeg/ffmpeg...): derives a pseudo 'pixel/pcm' array from the
    payload bytes so downstream plumbing is exercised for real."""
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(16, dtype=np.float32)
    return (b[: 4096].astype(np.float32) - 127.5) / 127.5


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Dispatch: REAL decoders for audio/wav (x-wav) and image/png;
    deterministic fake for other media mimes; MediaDecodeError otherwise."""
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(payload)
    if mime == "image/png":
        return decode_png(payload)
    if mime.startswith(("image/", "audio/", "video/")):
        return _fake_decode(payload, mime)
    raise MediaDecodeError(f"unsupported mime {mime!r}")


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
                raw = decode_media(p, m).ravel()
                buf = np.zeros(4096, dtype=np.float32)
                buf[: min(raw.size, 4096)] = raw[:4096]
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


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded (H, W, C) float array —
    pure-numpy index gather (the resize kernel a PIL-backed
    implementation would replace)."""
    H_, W_, _ = img.shape
    rows = np.minimum((np.arange(h) * H_ / h).astype(np.int64), H_ - 1)
    cols = np.minimum((np.arange(w) * W_ / w).astype(np.int64), W_ - 1)
    return img[rows[:, None], cols[None, :], :]


def resize_images(ds, height: int = 32, width: int = 32,
                  concurrency=(1, 4), batch_size: int = 64):
    """Image resize stage: decode (real PNG decoder) -> nearest-neighbor
    resize -> flat float32 pixel column + digest.  Rows whose mime can't
    be really decoded to (H, W, C) pixels pass through with
    resized=False (same honest-stub discipline as the featurizer)."""

    class _Resizer:
        def __call__(self, batch: pa.Table) -> pa.Table:
            payloads = batch["media"].cast(pa.large_binary()).to_pylist()
            mimes = batch["mime"].to_pylist()
            out_digest, out_ok, out_px = [], [], []
            for p, m in zip(payloads, mimes):
                out_digest.append(H.sha256_hex(p))
                try:
                    img = decode_media(p, m)
                    if img.ndim != 3:
                        raise MediaDecodeError("not a pixel grid")
                    small = resize_nearest(img, height, width)
                    out_ok.append(True)
                    out_px.append(small.astype(np.float32).ravel())
                except MediaDecodeError:
                    out_ok.append(False)
                    out_px.append(np.zeros(0, dtype=np.float32))
            return pa.table(
                {
                    "digest": pa.array(out_digest, pa.string()),
                    "resized": pa.array(out_ok, pa.bool_()),
                    "pixels": pa.array([px.tolist() for px in out_px],
                                       pa.list_(pa.float32())),
                }
            )

    return ds.map_batches(_Resizer, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


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


# ------------------------------------------------------------- media encoders
#
# The write-side counterparts of the decoders above (and the generators
# for the deterministic synthetic media table the container needs — no
# real media files ship with the testdata, per the no-external-data
# rule).  Both encode formats the decoders genuinely parse, so the
# query-level pipeline round-trips real codec bytes end to end.


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1, 1] (or int16) mono -> PCM16 WAV bytes (stdlib wave)."""
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def encode_png_gray(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale -> PNG bytes (zlib, filter 0 per scanline)."""
    h, w = img.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.concatenate(
        [np.concatenate(([0], row)) for row in img.astype(np.uint8)]
    ).astype(np.uint8).tobytes()
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def synthetic_media_from_docs(ds, batch_size: int = 256):
    """documents -> deterministic (doc_id, media, mime, meta) table: WAV
    for doc_id%3==0, PNG for %3==1, a fake-codec video/mp4 payload for
    %3==2 (the honest-stub mime — exercises the _fake_decode arm).
    Payload bytes derive ONLY from doc_id (splitmix64 stream), so the
    table is identical across runs, engines and shardings.  Per-row
    encoder loop is fine here: this is the synthetic SOURCE, not a hot
    stage — a real deployment reads media bytes from storage."""

    def synth(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        payloads, mimes, metas = [], [], []
        for did in dids:
            n = 192 + int(did) % 64
            base = (int(did) * 0x9E3779B97F4A7C15) % (1 << 64)  # wrap, warn-free
            stream = H.splitmix64(
                np.uint64(base) + np.arange(n, dtype=np.uint64)
            )
            b = (stream & np.uint64(0xFFFF)).astype(np.int64)
            if did % 3 == 0:
                pcm = ((b - 32768) / 32768.0).astype(np.float32)
                payloads.append(encode_wav(pcm))
                mimes.append("audio/wav")
                metas.append(json.dumps({"sample_rate": 8000, "n": n}))
            elif did % 3 == 1:
                img = (b[:64] & 0xFF).astype(np.uint8).reshape(8, 8)
                payloads.append(encode_png_gray(img))
                mimes.append("image/png")
                metas.append(json.dumps({"width": 8, "height": 8}))
            else:
                payloads.append((stream.astype("<u8")).tobytes())
                mimes.append("video/mp4")
                metas.append(json.dumps({"n_frames": 20 + int(did) % 30}))
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "media": pa.array(payloads, pa.large_binary()),
                "mime": pa.array(mimes, pa.string()),
                "meta": pa.array(metas, pa.string()),
            }
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=batch_size)
