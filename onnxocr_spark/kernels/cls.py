"""Angle-classifier decode + rotate rule.

Mirrors ClsPostProcess (/root/reference/onnxocr/cls_postprocess.py:13-30)
— argmax over (N,2) logits → (label, prob) with labels ["0","180"] —
and the conditional 180° rotation rule
(/root/reference/onnxocr/predict_cls.py:83-88): rotate only when the
label contains "180" AND score > cls_thresh (0.9).
"""

from __future__ import annotations

import numpy as np


def cls_decode(
    preds: np.ndarray, label_list: tuple[str, ...] = ("0", "180")
) -> list[tuple[str, float]]:
    idxs = preds.argmax(axis=1)
    return [(label_list[i], float(preds[n, i])) for n, i in enumerate(idxs)]


def should_rotate(label: str, score: float, cls_thresh: float = 0.9) -> bool:
    return "180" in label and score > cls_thresh


def rotate180(img: np.ndarray) -> np.ndarray:
    """cv2.rotate(img, ROTATE_180) analog."""
    return img[::-1, ::-1].copy()
