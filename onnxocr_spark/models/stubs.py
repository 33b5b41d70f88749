"""Deterministic numpy stand-in models (det / cls / rec).

Each exposes the same ``run(x) -> np.ndarray`` surface the engine uses
for onnxruntime sessions (predict_base.py analog), so swapping in real
ONNX weights later changes nothing structural. Weights are stripped
from the reference snapshot (/root/reference/.MISSING_LARGE_BLOBS), so
these stubs define sandbox ground truth via the bar-code contract in
``onnxocr_spark.models.barcode``.
"""

from __future__ import annotations

import numpy as np

from onnxocr_spark.kernels.normalize import denormalize_chw
from onnxocr_spark.models import barcode
from onnxocr_spark.models.charset import ASCII_STUB, ASCII_INDEX


class DetStubSession:
    """(N,3,H,W) det-normalized → (N,1,H,W) probability map.

    A hard-threshold 'network': p = 1 where mean channel intensity
    exceeds the bar floor, else 0 — the deterministic analog of DBNet's
    shrink-map output for synthetic bar images.

    ``run_raw`` is a fused fast path (advertised via ``supports_raw``):
    it takes the uint8 HWC image *before* NormalizeImage/ToCHW and
    computes the identical result — mean(img)/255 > t is exactly the
    normalize→denormalize→threshold roundtrip. The OCR stage is
    memory-bandwidth-bound, and a real ONNX session (which has no raw
    path) keeps the full normalized-tensor contract; the normalize/CHW
    kernels stay unit-tested either way.
    """

    supports_raw = True

    def run(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        out = np.empty((n, 1, x.shape[2], x.shape[3]), dtype=np.float32)
        for i in range(n):
            gray = denormalize_chw(x[i])
            out[i, 0] = (gray > barcode._DET_GRAY_THRESH).astype(np.float32)
        return out

    def run_raw(self, img_u8_hwc: np.ndarray) -> np.ndarray:
        gray = img_u8_hwc.mean(axis=2, dtype=np.float32)
        return (gray > barcode._DET_GRAY_THRESH * 255.0).astype(np.float32)


def _content_gray(x_chw: np.ndarray) -> np.ndarray:
    """CHW (/255−0.5)/0.5-normalized crop → gray [0,1] with the right
    zero-pad columns removed.

    The reference pads resized crops with zeros in *normalized* space
    (predict_cls.py:39-41, predict_rec.py:77-79), which denormalizes to
    gray 0.5 — bright enough to fool the bar detector. A real uint8
    pixel can never normalize to exactly 0.0 ((p/255−0.5)/0.5 = 0 ⇒
    p = 127.5), so exactly-zero columns are unambiguous padding.
    """
    nonpad = np.abs(x_chw).max(axis=(0, 1)) > 1e-6
    w = int(np.flatnonzero(nonpad)[-1]) + 1 if nonpad.any() else x_chw.shape[2]
    return x_chw[:, :, :w].mean(axis=0) * 0.5 + 0.5


class ClsStubSession:
    """(N,3,48,192) cls-normalized → (N,2) probs over labels ('0','180').

    ``run_raw`` skips the cls resize/normalize/pad (orientation of the
    bar markers is resize-invariant, so the decision is identical on
    the raw uint8 crop)."""

    supports_raw = True

    def run(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        out = np.empty((n, 2), dtype=np.float32)
        for i in range(n):
            upright = barcode.is_upright_gray(_content_gray(x[i]))
            out[i] = (0.99, 0.01) if upright else (0.01, 0.99)
        return out

    def run_raw(self, crops: list[np.ndarray]) -> np.ndarray:
        out = np.empty((len(crops), 2), dtype=np.float32)
        for i, c in enumerate(crops):
            gray = c.mean(axis=2, dtype=np.float32) / 255.0
            out[i] = (0.99, 0.01) if barcode.is_upright_gray(gray) else (0.01, 0.99)
        return out


class RecStubSession:
    """(N,3,48,W) rec-normalized → (N,T,C) one-hot CTC 'probabilities'.

    Decodes the bar-code payload and re-emits it as an interleaved
    char/blank one-hot sequence so the *real* CTC greedy decoder
    (kernels.ctc) reconstructs the text — repeats included — exactly.
    """

    T = 64  # supports texts up to 31 chars
    C = 1 + len(ASCII_STUB)  # blank + charset

    supports_raw = True

    def run(self, x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        out = np.zeros((n, self.T, self.C), dtype=np.float32)
        out[:, :, 0] = 1.0  # default: all blank
        for i in range(n):
            text = barcode.decode_bar_gray(_content_gray(x[i]))[: (self.T - 1) // 2]
            self._emit(out, i, text)
        return out

    def run_raw(self, crops: list[np.ndarray]) -> np.ndarray:
        """Raw uint8 crops → the same logits (bar decode is scale-
        invariant, so the rec resize/pad roundtrip is skippable); the
        real CTC greedy decoder still runs on the output downstream."""
        out = np.zeros((len(crops), self.T, self.C), dtype=np.float32)
        out[:, :, 0] = 1.0
        for i, c in enumerate(crops):
            gray = c.mean(axis=2, dtype=np.float32) / 255.0
            text = barcode.decode_bar_gray(gray)[: (self.T - 1) // 2]
            self._emit(out, i, text)
        return out

    def _emit(self, out: np.ndarray, i: int, text: str) -> None:
        for k, ch in enumerate(text):
            idx = ASCII_INDEX.get(ch)
            if idx is None:
                continue
            t = 2 * k + 1
            out[i, t, 0] = 0.0
            out[i, t, idx + 1] = 1.0
