"""Resize kernels.

Pure-numpy stand-ins for the cv2.resize-based preprocessing in the
reference:

- ``det_resize_for_test``: DetResizeForTest type-0 path
  (/root/reference/onnxocr/operators.py:34-141): pad tiny images to
  ≥32, cap the max side at ``limit_side_len`` (default 960,
  utils.py:273-274), round H/W to multiples of 32, emit
  [src_h, src_w, ratio_h, ratio_w].
- ``cls_resize_norm``: TextClassifier.resize_norm_img
  (/root/reference/onnxocr/predict_cls.py:22-42): resize h→48, width
  by aspect capped at 192, /255 −0.5 /0.5, zero-pad right.
- ``rec_resize_norm``: TextRecognizer.resize_norm_img SVTR_LCNet path
  (/root/reference/onnxocr/predict_rec.py:54-80): like cls but target
  width = int(48 · max_wh_ratio) from the batch aggregate.

``bilinear_resize`` uses the half-pixel sampling convention of
cv2.resize(INTER_LINEAR). The reference defaults to INTER_LINEAR for
all resizes on the hot path (cv2.resize default); INTER_CUBIC appears
only inside warpPerspective (crop.py).
"""

from __future__ import annotations

import math

import numpy as np


def _axis_weights(dst: int, src: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    # half-pixel centers: x_src = (i + 0.5) * src/dst - 0.5
    x = (np.arange(dst, dtype=np.float64) + 0.5) * (src / dst) - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = x - x0
    lo = np.clip(x0, 0, src - 1)
    hi = np.clip(x0 + 1, 0, src - 1)
    return lo, hi, frac


def bilinear_resize(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Resize (H,W[,C]) array to (dst_h, dst_w[,C]); dtype preserved.

    Rows are interpolated before columns (one (dst_h, src_w) intermediate
    instead of four full-width gathers) — the OCR stage is memory-
    bandwidth-bound, so traffic here directly bounds cluster throughput.
    """
    src_h, src_w = img.shape[:2]
    if dst_h == src_h and dst_w == src_w:
        return img.copy()
    y0, y1, fy = _axis_weights(dst_h, src_h)
    x0, x1, fx = _axis_weights(dst_w, src_w)
    a = img.astype(np.float32, copy=False)
    fy32 = fy.astype(np.float32)
    fx32 = fx.astype(np.float32)
    fyc = fy32[:, None, None] if a.ndim == 3 else fy32[:, None]
    rows = a[y0] * (1 - fyc) + a[y1] * fyc  # (dst_h, src_w[, C])
    fxc = fx32[None, :, None] if a.ndim == 3 else fx32[None, :]
    out = rows[:, x0] * (1 - fxc) + rows[:, x1] * fxc
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.rint(out), np.iinfo(img.dtype).min, np.iinfo(img.dtype).max)
    return out.astype(img.dtype)


def det_resize_for_test(
    img: np.ndarray,
    limit_side_len: float = 960.0,
    limit_type: str = "max",
) -> tuple[np.ndarray | None, np.ndarray]:
    """Type-0 det resize. Returns (resized_img, [src_h,src_w,ratio_h,ratio_w])."""
    src_h, src_w = img.shape[:2]
    if src_h + src_w < 64:  # tiny-image padding (operators.py:56-58,72-76)
        pad = np.zeros((max(32, src_h), max(32, src_w), img.shape[2]), img.dtype)
        pad[:src_h, :src_w] = img
        img = pad
    h, w = img.shape[:2]

    if limit_type == "max":
        ratio = float(limit_side_len) / max(h, w) if max(h, w) > limit_side_len else 1.0
    elif limit_type == "min":
        ratio = float(limit_side_len) / min(h, w) if min(h, w) < limit_side_len else 1.0
    elif limit_type == "resize_long":
        ratio = float(limit_side_len) / max(h, w)
    else:
        raise ValueError(f"unsupported limit_type {limit_type!r}")

    resize_h = max(int(round(int(h * ratio) / 32) * 32), 32)
    resize_w = max(int(round(int(w * ratio) / 32) * 32), 32)
    if resize_h <= 0 or resize_w <= 0:
        return None, np.array([src_h, src_w, 1.0, 1.0])
    out = bilinear_resize(img, resize_w, resize_h)
    ratio_h = resize_h / float(h)
    ratio_w = resize_w / float(w)
    return out, np.array([src_h, src_w, ratio_h, ratio_w])


def det_resize_type1(
    img: np.ndarray,
    image_shape: tuple[int, int],
    keep_ratio: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Type-1 det resize: fixed (H,W) target; with keep_ratio the width
    follows the aspect, rounded UP to a multiple of 32
    (resize_image_type1, operators.py:78-91)."""
    import math as _math

    resize_h, resize_w = image_shape
    src_h, src_w = img.shape[:2]
    if keep_ratio:
        resize_w = src_w * resize_h / src_h
        resize_w = int(_math.ceil(resize_w / 32) * 32)
    ratio_h = float(resize_h) / src_h
    ratio_w = float(resize_w) / src_w
    out = bilinear_resize(img, int(resize_w), int(resize_h))
    return out, np.array([src_h, src_w, ratio_h, ratio_w])


def det_resize_type2(
    img: np.ndarray, resize_long: int = 960
) -> tuple[np.ndarray, np.ndarray]:
    """Type-2 det resize: long side → resize_long, both dims rounded UP
    to multiples of 128 (resize_image_type2, operators.py:140-161)."""
    src_h, src_w = img.shape[:2]
    ratio = float(resize_long) / max(src_h, src_w)
    resize_h = int(src_h * ratio)
    resize_w = int(src_w * ratio)
    stride = 128
    resize_h = (resize_h + stride - 1) // stride * stride
    resize_w = (resize_w + stride - 1) // stride * stride
    out = bilinear_resize(img, resize_w, resize_h)
    return out, np.array(
        [src_h, src_w, resize_h / float(src_h), resize_w / float(src_w)]
    )


def _resize_norm_pad(img: np.ndarray, img_c: int, img_h: int, img_w: int) -> np.ndarray:
    """Shared cls/rec normalize: resize h→img_h keep aspect (cap img_w),
    CHW, /255 −0.5 /0.5, zero-pad right to img_w."""
    h, w = img.shape[:2]
    ratio = w / float(h)
    resized_w = img_w if math.ceil(img_h * ratio) > img_w else int(math.ceil(img_h * ratio))
    resized = bilinear_resize(img, resized_w, img_h).astype(np.float32)
    if resized.shape[2] == 1 and img_c == 3:
        # grayscale crop into a 3-channel model: replicate late (the
        # crop is tiny compared to the full image)
        resized = np.repeat(resized, 3, axis=2)
    resized = resized.transpose((2, 0, 1)) / 255.0
    resized -= 0.5
    resized /= 0.5
    out = np.zeros((img_c, img_h, img_w), dtype=np.float32)
    out[:, :, :resized_w] = resized
    return out


def cls_resize_norm(img: np.ndarray, image_shape=(3, 48, 192)) -> np.ndarray:
    c, h, w = image_shape
    return _resize_norm_pad(img, c, h, w)


def rec_resize_norm(
    img: np.ndarray, max_wh_ratio: float, image_shape=(3, 48, 320)
) -> np.ndarray:
    c, img_h, _ = image_shape
    img_w = int(img_h * max_wh_ratio)
    return _resize_norm_pad(img, c, img_h, img_w)
