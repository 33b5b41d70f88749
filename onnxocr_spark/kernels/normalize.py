"""Det-stage normalization.

Mirrors NormalizeImage (/root/reference/onnxocr/operators.py:7-31):
``(img * scale - mean) / std`` with ImageNet stats and scale 1/255,
HWC float32; and ToCHWImage (operators.py:163-176).
"""

from __future__ import annotations

import numpy as np

_SCALE = np.float32(1.0 / 255.0)
_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32).reshape(1, 1, 3)
_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32).reshape(1, 1, 3)


def normalize_image(img: np.ndarray) -> np.ndarray:
    """HWC uint8 → HWC float32 normalized."""
    return (img.astype(np.float32) * _SCALE - _MEAN) / _STD


def to_chw(img: np.ndarray) -> np.ndarray:
    return img.transpose((2, 0, 1))


def denormalize_chw(x: np.ndarray) -> np.ndarray:
    """CHW normalized float32 → mean channel intensity in [0,1].

    Used by the deterministic det stub model to recover pixel intensity
    from the normalized det input (the exact inverse of normalize_image).
    """
    mean = _MEAN.reshape(3, 1, 1)
    std = _STD.reshape(3, 1, 1)
    return (x * std + mean).mean(axis=0)
