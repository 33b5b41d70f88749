"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched UDFs.

The image path is fully real (IMG1/cv2-gated decode, bilinear resize,
perceptual hash). Audio/video decoding libraries are not present in
this container, so those *decoders* are stubbed behind a deterministic
fake keyed on the byte content (clearly marked; swap `_fake_decode_*`
for pyav/soundfile in production) — while everything Spark-side is
real and tested: schemas, the mapInPandas batch shape, partitioning,
null/corrupt-byte guards, and the metadata contract.

Schema convention:

    media: media_id string, kind ('image'|'audio'|'video'),
           bytes binary, meta map<string,string>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, bytes binary, meta map<string,string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, channels int, "
    "mean_intensity double, phash string, ok boolean, err string"
)

AUDIO_FEATURES_SCHEMA = (
    "media_id string, n_samples int, sample_rate int, "
    "rms double, zero_crossings int, ok boolean, err string"
)

VIDEO_FRAMES_SCHEMA = (
    "media_id string, frame_no int, ts_ms int, frame_phash string, "
    "ok boolean, err string"
)


def _phash_gray(gray: np.ndarray, grid: int = 8) -> str:
    """Perceptual hash: mean-threshold bits over a grid×grid *area
    average* (bilinear interpolation point-samples and misses sparse
    content at 50×+ downsampling; block means see every pixel)."""
    h, w = gray.shape[:2]
    hh, ww = (h // grid) * grid, (w // grid) * grid
    small = (
        gray[:hh, :ww]
        .astype(np.float32)
        .reshape(grid, hh // grid, grid, ww // grid)
        .mean(axis=(1, 3))
    )
    bits = (small > small.mean()).astype(np.uint8).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return f"{val:0{grid * grid // 4}x}"


def image_features(media: DataFrame) -> DataFrame:
    """Decode → dims + mean intensity + perceptual hash (all real)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from onnxocr_spark.imagecodec import decode_image

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_image(r.bytes)
                    if img is None:
                        rows.append((r.media_id, 0, 0, 0, 0.0, "", False,
                                     "decode failed"))
                        continue
                    gray = img.mean(axis=2, dtype=np.float32)
                    # float64 accumulate: pixel totals exceed 2^24, so a
                    # float32 mean is order-dependent in its last ~1e-6;
                    # the float64 sum of integer-valued pixels is exact
                    # and bit-identical to the SQL oracle's ratio
                    rows.append(
                        (r.media_id, img.shape[1], img.shape[0], img.shape[2],
                         float(gray.mean(dtype=np.float64)),
                         _phash_gray(gray), True, "")
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((r.media_id, 0, 0, 0, 0.0, "", False,
                                 str(exc)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "channels",
                "mean_intensity", "phash", "ok", "err"])

    return media.filter(F.col("kind") == "image").select(
        "media_id", "bytes"
    ).mapInPandas(fn, IMAGE_FEATURES_SCHEMA)


def _fake_decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """STUB — audio codecs unavailable in this container. Deterministic
    fake: the sha256 digest of the bytes, tiled as a waveform of
    (byte-128)/128 samples. Every sample is a dyadic rational k/2^7, so
    the downstream feature sums are EXACT in float64 and the DuckDB
    oracle (_AUDIO_FEATURES_DUCK in __spark_entry__.py) re-derives
    rms/zero-crossings bit-for-bit from SQL alone — the feature math
    stays real; only the codec is fake. Replace with soundfile/librosa
    decode in production."""
    h = hashlib.sha256(data).digest()
    n = 8000 + int.from_bytes(h[:2], "big") % 8000
    pattern = (np.frombuffer(h, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    return np.tile(pattern, -(-n // 32))[:n], 16000


def audio_features(media: DataFrame) -> DataFrame:
    """Decode (stubbed) → RMS + zero crossings (feature math is real)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.bytes is None or len(r.bytes) == 0:
                        rows.append((r.media_id, 0, 0, 0.0, 0, False, "empty"))
                        continue
                    wave, sr = _fake_decode_audio(r.bytes)
                    rms = float(np.sqrt(np.mean(wave**2)))
                    zc = int(np.sum(np.signbit(wave[1:]) != np.signbit(wave[:-1])))
                    rows.append((r.media_id, len(wave), sr, rms, zc, True, ""))
                except Exception as exc:  # noqa: BLE001
                    rows.append((r.media_id, 0, 0, 0.0, 0, False, str(exc)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_samples", "sample_rate", "rms",
                "zero_crossings", "ok", "err"])

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "bytes"
    ).mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


AUDIO_HAAR_SCHEMA = (
    "media_id string, n_pairs long, approx_energy long, "
    "detail_energy long, approx2_energy long, detail2_energy long, "
    "ok boolean, err string"
)


def audio_haar_features(media: DataFrame) -> DataFrame:
    """2-level Haar filter-bank band energies per audio item (decode
    stubbed; the filter bank is real): level 1 pairs samples into
    approximation a+b and detail a−b, level 2 re-pairs the level-1
    approximations. Energies are emitted INTEGER-scaled — the stub wave
    is k/128 (dyadic), so ×128 recovers exact int64 samples and every
    band energy is an exact BIGINT sum of squared integers, order-free
    across engines (no float anywhere in the output; the unnormalized
    Haar transform differs from the orthonormal one by the constant
    1/√2 per level, which a consumer applies to the RATIO of band
    energies, where it cancels). Trailing unpaired samples are dropped
    at each level, exactly as the SQL oracle's complete-pair filter
    does."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.bytes is None or len(r.bytes) == 0:
                        rows.append((r.media_id, 0, 0, 0, 0, 0, False, "empty"))
                        continue
                    wave, _sr = _fake_decode_audio(r.bytes)
                    q = np.rint(wave * 128.0).astype(np.int64)
                    n2 = len(q) // 2 * 2
                    a, b = q[0:n2:2], q[1:n2:2]
                    s1, d1 = a + b, a - b
                    n4 = len(s1) // 2 * 2
                    a2, b2 = s1[0:n4:2], s1[1:n4:2]
                    s2, d2 = a2 + b2, a2 - b2
                    rows.append((
                        r.media_id, n2 // 2,
                        int((s1 * s1).sum()), int((d1 * d1).sum()),
                        int((s2 * s2).sum()), int((d2 * d2).sum()),
                        True, "",
                    ))
                except Exception as exc:  # noqa: BLE001
                    rows.append((r.media_id, 0, 0, 0, 0, 0, False,
                                 str(exc)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_pairs", "approx_energy", "detail_energy",
                "approx2_energy", "detail2_energy", "ok", "err"])

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "bytes"
    ).mapInPandas(fn, AUDIO_HAAR_SCHEMA)


def _fake_decode_video_frames(data: bytes, every_ms: int) -> list[tuple[int, np.ndarray]]:
    """STUB — video codecs unavailable. Deterministic fake: per-frame
    32×32 INTEGER gradient (i·8 + j·s + o) mod 256 with (s, o) drawn
    from the byte digest per frame, frame count from a fake duration.
    Integer cells make every downstream block mean exact even in
    float32, so the per-frame phash is re-derivable in plain SQL
    (_VIDEO_FRAMES_DUCK in __spark_entry__.py) — the phash math stays
    real; only the codec is fake. Replace with pyav in production."""
    h = hashlib.sha256(data).digest()
    duration_ms = 1000 + int.from_bytes(h[:2], "big") % 4000
    i = np.arange(32, dtype=np.int64)[:, None]
    j = np.arange(32, dtype=np.int64)[None, :]
    frames = []
    for fno, ts in enumerate(range(0, duration_ms, every_ms)):
        seed = int.from_bytes(h[(fno % 16) * 2 : (fno % 16) * 2 + 2], "big")
        s, o = seed % 256, seed // 256
        frames.append((ts, ((i * 8 + j * s + o) % 256).astype(np.float32)))
    return frames


def video_frame_samples(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sample (decode stubbed) → per-frame perceptual hash.
    1 video row → N frame rows (the flatMap shape a real sampler has)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    if r.bytes is None or len(r.bytes) == 0:
                        rows.append((r.media_id, -1, 0, "", False, "empty"))
                        continue
                    for fno, (ts, frame) in enumerate(
                        _fake_decode_video_frames(r.bytes, every_ms)
                    ):
                        rows.append(
                            (r.media_id, fno, ts, _phash_gray(frame), True, "")
                        )
                except Exception as exc:  # noqa: BLE001
                    rows.append((r.media_id, -1, 0, "", False, str(exc)[:200]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_no", "ts_ms", "frame_phash", "ok", "err"])

    return media.filter(F.col("kind") == "video").select(
        "media_id", "bytes"
    ).mapInPandas(fn, VIDEO_FRAMES_SCHEMA)


def image_thumbnails(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Real resize UDF: decode → bound the long side → re-encode IMG1."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from onnxocr_spark.imagecodec import decode_image, encode_image
        from onnxocr_spark.kernels.resize import bilinear_resize

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(r.bytes)
                if img is None:
                    rows.append((r.media_id, None))
                    continue
                h, w = img.shape[:2]
                scale = min(1.0, max_side / float(max(h, w)))
                out = bilinear_resize(img, max(1, int(w * scale)),
                                      max(1, int(h * scale)))
                rows.append((r.media_id, encode_image(out)))
            yield pd.DataFrame(rows, columns=["media_id", "thumb"])

    return media.filter(F.col("kind") == "image").select(
        "media_id", "bytes"
    ).mapInPandas(fn, "media_id string, thumb binary")
