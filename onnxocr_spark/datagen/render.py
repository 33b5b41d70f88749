"""Deterministic synthetic media renderer (FIXTURES.md §3).

``render_media(doc_id, offset)`` is a pure function of its arguments
(sha256-derived parameters — never Python's randomized hash()) that
draws K text bars (the bar-code contract in models/barcode.py) on a
black canvas. ``expected_media_text`` computes the OCR ground truth for
that image analytically — newline-joined lines in reading order — so
E2E span equality can be asserted without running anything.

Properties exercised on purpose:
- canvas dims are multiples of 32 (≤960 → det resize is identity;
  'heavy' images exceed 960 to exercise the det resize + box rescale);
- ~20% of media spans are rendered with every bar 180°-flipped in place
  to exercise the cls stage (reading order unchanged);
- every 97th doc is 'heavy': more/larger bars (skew knob for the salted
  repartition).
"""

from __future__ import annotations

import hashlib

import numpy as np

from onnxocr_spark.models.barcode import encode_bar, BAR_H

MARGIN = 32
GAP = 64


def _h(*parts: object) -> int:
    digest = hashlib.sha256("/".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(digest[:8], "big")


def media_lines(doc_id: str, offset: int, heavy: bool = False) -> list[str]:
    seed = _h(doc_id, offset, "lines")
    k = 2 + seed % (4 if heavy else 3)  # 2-5 lines heavy, 2-4 normal
    return [f"line{j} {str(doc_id)[-4:]}:{offset}" for j in range(k)]


def is_flipped(doc_id: str, offset: int) -> bool:
    return _h(doc_id, offset, "flip") % 5 == 0


def _round32(v: int) -> int:
    return ((v + 31) // 32) * 32


def render_media(
    doc_id: str, offset: int, heavy: bool = False
) -> np.ndarray:
    """→ (H,W,1) uint8 canvas (grayscale). Pure function of
    (doc_id, offset, heavy). The engine accepts C∈{1,3}; synthetic
    documents are gray, which also cuts decode bandwidth 3× — the OCR
    stage is memory-bound, so this directly raises cluster throughput."""
    lines = media_lines(doc_id, offset, heavy)
    scale = 2 if heavy else 1
    flipped = is_flipped(doc_id, offset)
    bars = [encode_bar(t, scale=scale) for t in lines]
    bar_h = BAR_H * scale
    gap = GAP * scale
    margin = MARGIN * scale
    width = _round32(max(b.shape[1] for b in bars) + 2 * margin)
    height = _round32(2 * margin + len(bars) * bar_h + (len(bars) - 1) * gap)
    canvas = np.zeros((height, width), dtype=np.uint8)
    y = margin
    for b in bars:
        patch = b[::-1, ::-1] if flipped else b
        canvas[y : y + bar_h, margin : margin + b.shape[1]] = patch
        y += bar_h + gap
    return canvas[:, :, None]


def expected_media_text(doc_id: str, offset: int, heavy: bool = False) -> str:
    """Analytic OCR ground truth for render_media(doc_id, offset, heavy)."""
    return "\n".join(media_lines(doc_id, offset, heavy))
