"""Multimodal column plumbing: schemas, batch shapes, corrupt-byte
guards. Image path is fully real; audio/video decoders are
deterministic stubs (module docstring) with real feature math."""

import numpy as np
import pytest

from onnxocr_spark.datagen.render import render_media
from onnxocr_spark.imagecodec import encode_image, decode_image
from onnxocr_spark.operators.multimodal import (
    image_features,
    audio_features,
    video_frame_samples,
    image_thumbnails,
    _phash_gray,
)


@pytest.fixture(scope="module")
def media_df(spark):
    img1 = encode_image(render_media("doc_000000000001", 0))
    img2 = encode_image(render_media("doc_000000000002", 0))
    rows = [
        ("i1", "image", img1, {"src": "render"}),
        ("i2", "image", img2, {"src": "render"}),
        ("ibad", "image", b"corrupt", {}),
        ("a1", "audio", b"fake-audio-bytes-1", {"codec": "stub"}),
        ("a2", "audio", b"", {}),
        ("v1", "video", b"fake-video-bytes-1", {"codec": "stub"}),
    ]
    return spark.createDataFrame(
        rows, "media_id string, kind string, bytes binary, meta map<string,string>"
    )


def test_image_features(spark, media_df):
    out = {r.media_id: r for r in image_features(media_df).collect()}
    assert set(out) == {"i1", "i2", "ibad"}
    assert out["i1"].ok and out["i1"].width % 32 == 0 and out["i1"].channels == 1
    assert len(out["i1"].phash) == 16  # 64-bit hex
    assert out["i1"].phash != out["i2"].phash
    assert not out["ibad"].ok and out["ibad"].err == "decode failed"


def test_phash_robust_to_resize():
    img = render_media("doc_000000000003", 1)
    gray = img.mean(axis=2).astype(np.float32)
    from onnxocr_spark.kernels.resize import bilinear_resize

    half = bilinear_resize(gray, gray.shape[1] // 2, gray.shape[0] // 2)
    a, b = _phash_gray(gray), _phash_gray(half)
    # near-dup under resize: hamming distance small
    ham = bin(int(a, 16) ^ int(b, 16)).count("1")
    assert ham <= 8, f"phash unstable under 2x resize: {ham}"


def test_audio_features(spark, media_df):
    out = {r.media_id: r for r in audio_features(media_df).collect()}
    assert out["a1"].ok and out["a1"].sample_rate == 16000
    # digest-tiled wave: bytes ~uniform in [-1, 1) → RMS ≈ 1/√3 ≈ 0.58
    assert 0.3 < out["a1"].rms < 0.8
    assert out["a1"].zero_crossings > 0
    assert not out["a2"].ok
    # deterministic: same bytes → same features
    again = {r.media_id: r for r in audio_features(media_df).collect()}
    assert again["a1"].rms == out["a1"].rms


def test_video_frame_samples(spark, media_df):
    rows = video_frame_samples(media_df, every_ms=500).collect()
    v1 = sorted([r for r in rows if r.media_id == "v1"], key=lambda r: r.frame_no)
    assert len(v1) >= 2  # fake duration ≥ 1000 ms at 500 ms sampling
    assert [r.ts_ms for r in v1] == [500 * i for i in range(len(v1))]
    assert all(r.ok and len(r.frame_phash) == 16 for r in v1)


def test_image_thumbnails(spark, media_df):
    out = {r.media_id: r.thumb for r in image_thumbnails(media_df, 64).collect()}
    t = decode_image(out["i1"])
    assert t is not None and max(t.shape[:2]) <= 64
    assert out["ibad"] is None
