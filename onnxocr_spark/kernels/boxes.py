"""Box ordering, clipping, filtering, reading-order sort.

Mirrors TextDetector.order_points_clockwise / clip_det_res /
filter_tag_det_res (/root/reference/onnxocr/predict_det.py:50-81) and
``sorted_boxes`` (/root/reference/onnxocr/predict_system.py:75-97) —
including the single stabilizing bubble pass with its 10-px same-line
tolerance, which is semantics-critical for span equality.
"""

from __future__ import annotations

import numpy as np


def order_points_clockwise(pts: np.ndarray) -> np.ndarray:
    """Order 4 points TL, TR, BR, BL by coordinate sum/diff argmin/argmax."""
    rect = np.zeros((4, 2), dtype=np.float32)
    s = pts.sum(axis=1)
    rect[0] = pts[np.argmin(s)]
    rect[2] = pts[np.argmax(s)]
    tmp = np.delete(pts, (np.argmin(s), np.argmax(s)), axis=0)
    diff = np.diff(tmp, axis=1)
    rect[1] = tmp[np.argmin(diff)]
    rect[3] = tmp[np.argmax(diff)]
    return rect


def clip_det_res(points: np.ndarray, img_h: int, img_w: int) -> np.ndarray:
    """Clamp box coords to [0, w-1] × [0, h-1] (int-truncated)."""
    out = points.copy()
    for i in range(out.shape[0]):
        out[i, 0] = int(min(max(out[i, 0], 0), img_w - 1))
        out[i, 1] = int(min(max(out[i, 1], 0), img_h - 1))
    return out


def filter_tag_det_res(dt_boxes: np.ndarray, img_h: int, img_w: int) -> np.ndarray:
    """Clockwise-order, clip, and drop degenerate (side ≤ 3 px) boxes."""
    keep = []
    for box in dt_boxes:
        box = order_points_clockwise(np.asarray(box, dtype=np.float32))
        box = clip_det_res(box, img_h, img_w)
        rect_w = int(np.linalg.norm(box[0] - box[1]))
        rect_h = int(np.linalg.norm(box[0] - box[3]))
        if rect_w <= 3 or rect_h <= 3:
            continue
        keep.append(box)
    if not keep:
        return np.zeros((0, 4, 2), dtype=np.float32)
    return np.stack(keep)


def sorted_boxes(dt_boxes: np.ndarray) -> list[np.ndarray]:
    """Reading-order sort: (y, x) of top-left, then ONE bubble pass that
    swaps adjacent boxes when Δy < 10 px and the right one sits left of
    the left one. Deliberately not a fixpoint — matches the reference
    exactly (predict_system.py:87-96).
    """
    num = len(dt_boxes)  # works for (N,4,2) arrays and lists of polys alike
    boxes = sorted(dt_boxes, key=lambda x: (x[0][1], x[0][0]))
    boxes = list(boxes)
    for i in range(num - 1):
        for j in range(i, -1, -1):
            if abs(boxes[j + 1][0][1] - boxes[j][0][1]) < 10 and (
                boxes[j + 1][0][0] < boxes[j][0][0]
            ):
                boxes[j], boxes[j + 1] = boxes[j + 1], boxes[j]
            else:
                break
    return boxes
