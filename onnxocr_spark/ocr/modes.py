"""The reference API's three dispatch modes
(/root/reference/onnxocr/onnx_paddleocr.py:28-61):

- det+rec (default)          → textsystem.ocr_image
- det-only (rec=False)       → detect_only
- cls/rec-only on pre-cropped images (det=False) → recognize_only

Re-expressed as pure per-image functions; the Spark stage wraps them
the same way ocr_media does.
"""

from __future__ import annotations

import numpy as np

from onnxocr_spark.config import PipelineConfig, DEFAULT_CONFIG
from onnxocr_spark.ocr.textsystem import (
    detect_boxes,
    classify_crops,
    recognize_crops,
)
from onnxocr_spark.kernels import sorted_boxes


def detect_only(
    img: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[list[list[float]]]:
    """det=True, rec=False: reading-ordered boxes only
    (onnx_paddleocr.py:40-45)."""
    boxes = detect_boxes(img, cfg)
    if boxes.shape[0] == 0:
        return []
    return [b.tolist() for b in sorted_boxes(boxes)]


def recognize_only(
    imgs: list[np.ndarray],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    cls: bool = True,
) -> list[tuple[str, float]]:
    """det=False: treat each input as a pre-cropped text line; optional
    cls rotation then recognition (onnx_paddleocr.py:46-61)."""
    crops = list(imgs)
    if cfg.use_angle_cls and cls:
        crops, _ = classify_crops(crops, cfg)
    return recognize_crops(crops, cfg)
