"""The deterministic "bar code" contract shared by the synthetic media
renderer (datagen) and the stub rec/cls/det models.

Real ONNX det/rec weights are stripped from the reference snapshot
(/root/reference/.MISSING_LARGE_BLOBS), so integration correctness is
defined against deterministic stand-in models (SURVEY.md §5, FIXTURES.md
§3). The contract:

A *text bar* is a horizontal strip of height BAR_H:
  - rows [0, MARKER_H)            → intensity 255 (orientation marker: top)
  - rows [BAR_H-MARKER_H, BAR_H)  → intensity 128 (orientation marker: bottom)
  - payload band between them     → per-cell constant intensity
Each character = 2 cells of width CELL_W: (hi, lo) base-16 digits of its
index in the ASCII_STUB charset; digit d → intensity LEVEL0 + d·LEVEL_STEP.
Bar width = 2·CELL_W·len(text), so n_cells is recoverable purely from the
bar's aspect ratio (scale-invariant: survives det resize, unclip margins,
perspective crop, and rec resize).

The stub models only ever *read* pixels through this contract; the
renderer only ever *writes* them through it. Everything between —
detection, box geometry, crop, rotation, batching, CTC — is the real
pipeline under test.
"""

from __future__ import annotations

import numpy as np

from onnxocr_spark.models.charset import ASCII_STUB, ASCII_INDEX

BAR_H = 32
MARKER_H = 4
CELL_W = 16
LEVEL0 = 100
LEVEL_STEP = 8
TOP_MARKER = 255
BOTTOM_MARKER = 128
# bar must binarize as one component: every intensity > det threshold
_DET_GRAY_THRESH = 0.35  # in [0,1]; LEVEL0/255 ≈ 0.39 > this > background 0


def encode_bar(text: str, scale: int = 1) -> np.ndarray:
    """Render one text bar as (BAR_H·scale, 2·CELL_W·len·scale) uint8."""
    if not text:
        raise ValueError("empty bar text")
    idxs = [ASCII_INDEX.get(c, ASCII_INDEX["?"]) for c in text]
    digits: list[int] = []
    for i in idxs:
        digits.extend((i // 16, i % 16))
    bar = np.zeros((BAR_H, CELL_W * len(digits)), dtype=np.uint8)
    payload = np.array([LEVEL0 + LEVEL_STEP * d for d in digits], dtype=np.uint8)
    bar[MARKER_H : BAR_H - MARKER_H, :] = np.repeat(payload, CELL_W)[None, :]
    bar[:MARKER_H, :] = TOP_MARKER
    bar[BAR_H - MARKER_H :, :] = BOTTOM_MARKER
    if scale > 1:
        bar = np.repeat(np.repeat(bar, scale, axis=0), scale, axis=1)
    return bar


def _bright_bbox(gray: np.ndarray, thresh: float) -> tuple[int, int, int, int] | None:
    """(r0, r1, c0, c1) inclusive bbox of pixels > thresh, or None."""
    rows = np.flatnonzero((gray > thresh).any(axis=1))
    cols = np.flatnonzero((gray > thresh).any(axis=0))
    if rows.size == 0 or cols.size == 0:
        return None
    return int(rows[0]), int(rows[-1]), int(cols[0]), int(cols[-1])


def decode_bar_gray(gray: np.ndarray) -> str:
    """Decode a cropped gray image (float in [0,1], bar plus dark margin)
    back to its text. Tolerant to margins, mild resampling, and ±few-px
    box error — this is the stub rec model's 'inference'."""
    bb = _bright_bbox(gray, _DET_GRAY_THRESH * 0.7)
    if bb is None:
        return ""
    r0, r1, c0, c1 = bb
    bh = r1 - r0 + 1
    bw = c1 - c0 + 1
    if bh < 4 or bw < 4:
        return ""
    n_cells = int(round(2.0 * bw / bh))
    if n_cells < 2 or n_cells % 2 == 1:
        n_cells = max(2, 2 * int(round(bw / bh)))
    y_c = r0 + bh / 2.0
    chars: list[str] = []
    h, w = gray.shape
    # all cells share the same 3-row band (yi constant per bar); one
    # column cumsum turns the per-cell 3×3 patch means into a vector
    # gather (the per-cell ndarray.mean loop dominated rec-stub time)
    yi = int(round(y_c))
    r0b, r1b = max(0, yi - 1), min(h, yi + 2)
    colsum = gray[r0b:r1b, :].sum(axis=0, dtype=np.float64)
    prefix = np.concatenate(([0.0], np.cumsum(colsum)))
    xs = np.round(c0 + (np.arange(n_cells) + 0.5) * bw / n_cells).astype(int)
    a = np.maximum(0, xs - 1)
    b = np.minimum(w, xs + 2)
    v = (prefix[b] - prefix[a]) / ((r1b - r0b) * (b - a)) * 255.0
    digits = np.clip(np.round((v - LEVEL0) / LEVEL_STEP), 0, 15).astype(
        int
    ).tolist()
    for k in range(0, len(digits) - 1, 2):
        idx = digits[k] * 16 + digits[k + 1]
        if 0 <= idx < len(ASCII_STUB):
            chars.append(ASCII_STUB[idx])
    return "".join(chars)


def is_upright_gray(gray: np.ndarray) -> bool:
    """Orientation test for a cropped bar: the 255 marker sits on top
    when upright, the 128 marker when 180°-flipped."""
    bb = _bright_bbox(gray, _DET_GRAY_THRESH * 0.7)
    if bb is None:
        return True
    r0, r1, c0, c1 = bb
    bh = r1 - r0 + 1
    q = max(1, bh // 4)
    top = float(gray[r0 : r0 + q, c0 : c1 + 1].mean())
    bot = float(gray[r1 - q + 1 : r1 + 1, c0 : c1 + 1].mean())
    return top >= bot
