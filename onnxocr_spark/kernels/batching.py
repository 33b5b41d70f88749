"""Aspect-ratio-sorted micro-batching.

Mirrors the batching discipline shared by cls and rec
(/root/reference/onnxocr/predict_cls.py:47-52 and
predict_rec.py:283-306): argsort crops by w/h, walk them in batches of
``batch_num`` (default 6), compute the per-batch max w/h ratio (rec
floors it at imgW/imgH = 320/48), and write results back by original
index. Batch *membership* affects padded widths, so this ordering is
part of the numeric contract, reproduced inside the Arrow UDF.
"""

from __future__ import annotations

import numpy as np


def aspect_sorted_batches(
    shapes: list[tuple[int, int]],
    batch_num: int = 6,
    min_ratio: float | None = None,
) -> list[tuple[np.ndarray, float]]:
    """shapes: [(h, w), …] per crop.

    Returns [(original_indices, max_wh_ratio), …] per batch, in the
    aspect-sorted batch order the reference uses.
    """
    ratios = np.array([w / float(h) for h, w in shapes])
    indices = np.argsort(ratios, kind="stable")
    batches = []
    for beg in range(0, len(shapes), batch_num):
        chunk = indices[beg : beg + batch_num]
        max_ratio = float(ratios[chunk].max()) if len(chunk) else 0.0
        if min_ratio is not None:
            max_ratio = max(max_ratio, min_ratio)
        batches.append((chunk, max_ratio))
    return batches
