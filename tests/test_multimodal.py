"""Multimodal stages: REAL WAV/PNG decode round-trips, schema, 1->N
sampling, fake-codec fallback and unknown-mime dispatch."""

import io
import json
import struct
import wave
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_wav(n=500, width=2, rate=8000) -> bytes:
    t = np.arange(n, dtype=np.float64)
    sig = np.sin(2 * np.pi * 440 * t / rate)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            w.writeframes((128 + 100 * sig).astype(np.uint8).tobytes())
        else:
            w.writeframes((32000 * sig).astype("<i2").tobytes())
    return buf.getvalue()


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)


def _make_png(img: np.ndarray, filters=(0,)) -> bytes:
    """Encode an 8-bit (h, w, c) array applying the given per-row filter
    cycle — exercises the decoder's un-filtering paths."""
    h, w, c = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[c]
    stride = w * c
    raw = bytearray()
    flat = img.reshape(h, stride).astype(np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, ul))
            enc = line - pred
        raw += bytes([f]) + bytes((enc & 0xFF).astype(np.uint8))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _png_chunk(b"IEND", b""))


def test_wav_decode_roundtrip():
    from hsearch_ray.stages.multimodal import decode_wav

    for width in (1, 2):
        payload = _make_wav(width=width)
        out = decode_wav(payload)
        assert out.dtype == np.float32 and out.size == 500
        assert np.abs(out).max() <= 1.0
        # a 440Hz sine: strongest DFT bin near 440/8000*500 = 27.5
        spec = np.abs(np.fft.rfft(out.astype(np.float64)))
        assert abs(int(np.argmax(spec[1:])) + 1 - 27.5) < 2


@pytest.mark.parametrize("filters", [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_decode_roundtrip(filters, channels):
    from hsearch_ray.stages.multimodal import decode_png

    rng = np.random.Generator(np.random.PCG64(99))
    img = rng.integers(0, 256, size=(7, 5, channels), dtype=np.uint8)
    out = decode_png(_make_png(img.astype(np.int32), filters))
    assert out.shape == (7, 5, channels)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)


def test_png_unsupported_rejected():
    from hsearch_ray.stages.multimodal import MediaDecodeError, decode_png

    with pytest.raises(MediaDecodeError):
        decode_png(b"not a png at all")


def _media_table(n=10):
    rng = np.random.Generator(np.random.PCG64(7))
    payloads, mimes = [], []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            payloads.append(_make_wav(n=200 + 10 * i))
            mimes.append("audio/wav")
        elif kind == 1:
            img = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
            payloads.append(_make_png(img.astype(np.int32), (0, 1, 2, 3, 4)))
            mimes.append("image/png")
        else:  # no JPEG codec in this container -> deterministic fake path
            payloads.append(rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes())
            mimes.append("image/jpeg")
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
    assert all(r["decoded"] for r in out1)  # wav+png real, jpeg via stub
    d1 = {r["digest"]: list(r["feature"]) for r in out1}
    d2 = {r["digest"]: list(r["feature"]) for r in out2}
    assert d1 == d2  # deterministic features per payload


def test_featurize_real_decode_changes_features(ray_session):
    """The featurizer output for a real WAV depends on the DECODED
    samples, not the container bytes: two encodings of the same samples
    (different container metadata) featurize identically."""
    import ray.data

    from hsearch_ray.stages.multimodal import featurize_media

    sig = (32000 * np.sin(np.arange(300) / 7.0)).astype("<i2").tobytes()

    def enc(rate):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(sig)
        return buf.getvalue()

    tbl = pa.table(
        {
            "media": pa.array([enc(8000), enc(16000)], pa.binary()),
            "mime": pa.array(["audio/wav"] * 2, pa.string()),
            "meta": pa.array(["{}"] * 2, pa.string()),
        }
    )
    out = featurize_media(ray.data.from_arrow(tbl)).take_all()
    assert out[0]["digest"] != out[1]["digest"]  # container bytes differ
    assert list(out[0]["feature"]) == list(out[1]["feature"])  # samples equal


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

def test_resize_images(ray_session):
    """Decode -> nearest resize over a real PNG; audio rows pass through
    un-resized."""
    import ray.data

    from hsearch_ray.stages.multimodal import decode_png, resize_images, resize_nearest

    rng = np.random.Generator(np.random.PCG64(5))
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    png = _make_png(img.astype(np.int32), (0, 1, 2, 3, 4))
    tbl = pa.table(
        {
            "media": pa.array([png, _make_wav()], pa.binary()),
            "mime": pa.array(["image/png", "audio/wav"], pa.string()),
            "meta": pa.array(["{}"] * 2, pa.string()),
        }
    )
    out = resize_images(ray.data.from_arrow(tbl), height=4, width=4).take_all()
    by_ok = {bool(r["resized"]): r for r in out}
    assert len(by_ok[True]["pixels"]) == 4 * 4 * 3
    want = resize_nearest(decode_png(png), 4, 4).astype(np.float32).ravel()
    np.testing.assert_allclose(by_ok[True]["pixels"], want, atol=1e-7)
    assert len(by_ok[False]["pixels"]) == 0  # audio is not a pixel grid


def test_media_features_query_contract(ray_session):
    """Driver-visible multimodal query: every doc gets a media row, the
    REAL-codec mimes (wav/png) and the fake-codec arm all decode, the
    digest/feature pipeline is deterministic across runs."""
    from hsearch_ray.pipelines.queries import QUERIES

    df = QUERIES["media_features_docs"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert set(df["mime"]) == {"audio/wav", "image/png", "video/mp4"}
    assert df["decoded"].all()  # all three arms decode (real or stub)
    assert (df.loc[df["mime"] != "video/mp4", "feat_norm_ppm"] > 0).all()
    df2 = QUERIES["media_features_docs"]("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id", ignore_index=True),
        df2.sort_values("doc_id", ignore_index=True),
    )


def test_frame_sample_query_explosion(ray_session):
    """1->N frame explosion matches the synthetic metadata exactly:
    ceil(n_frames/10) rows per video doc."""
    from hsearch_ray.pipelines.queries import QUERIES

    df = QUERIES["frame_sample_docs"]("/root/testdata/sf0.001").to_pandas()
    n_videos = sum(1 for d in range(500) if d % 3 == 2)
    expected = sum(-(-(20 + d % 30) // 10) for d in range(500) if d % 3 == 2)
    assert df["digest"].nunique() == n_videos
    assert len(df) == expected
    assert (df["frame_no"] % 10 == 0).all()
    assert (df["frame_bytes"] > 0).all()
