"""Perspective crop.

Mirrors get_rotate_crop_image (/root/reference/onnxocr/utils.py:12-53):
4-pt quad → perspective warp to an axis-aligned (w,h) rect where
w = max(|p0p1|, |p2p3|), h = max(|p0p3|, |p1p2|); border replicate;
auto-rot90 when h/w ≥ 1.5. The reference uses cv2.getPerspectiveTransform
+ warpPerspective(INTER_CUBIC, BORDER_REPLICATE); here the homography is
solved with numpy.linalg and sampling defaults to Keys bicubic with
a = -0.75 (cv2's cubic kernel) over clamped (replicated) borders.
Remaining documented deviation: float-precision cubic vs cv2's 5-bit
fixed-point interpolation tables (≤1 intensity level; cv2 absent in
sandbox, the stub models are tolerant by construction). Bilinear stays
available via interpolation="bilinear".
"""

from __future__ import annotations

import numpy as np


def get_minarea_rect_crop(img: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Crop via the polygon's min-area rectangle — the poly-path crop
    (get_minarea_rect_crop, /root/reference/onnxocr/utils.py:56-76):
    minAreaRect of the points, corners reordered by the same
    sort-by-x / split-by-y rule, then the perspective crop."""
    from onnxocr_spark.kernels.dbpostprocess import min_area_rect

    rect, _ = min_area_rect(np.asarray(points, dtype=np.float32))
    return get_rotate_crop_image(img, rect.astype(np.float32))


def _perspective_matrix(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Solve the 3×3 homography mapping src quad → dst quad."""
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def _axis_aligned_int_box(pts: np.ndarray) -> tuple[int, int, int, int] | None:
    """(x0, y0, w, h) when the quad is an axis-aligned rectangle with
    integer corners (TL,TR,BR,BL) — the overwhelmingly common case for
    DB boxes on digital documents; warping is then an exact slice."""
    if not np.all(pts == np.rint(pts)):
        return None
    x0, y0 = pts[0]
    x1, y1 = pts[2]
    if (
        pts[1][1] == y0
        and pts[1][0] == x1
        and pts[3][0] == x0
        and pts[3][1] == y1
        and x1 > x0
        and y1 > y0
    ):
        return int(x0), int(y0), int(x1 - x0), int(y1 - y0)
    return None


def _keys_cubic_weights(f: np.ndarray):
    """Keys bicubic weights for the 4 taps around a sample with
    fractional offset f ∈ [0,1): distances (1+f, f, 1-f, 2-f), kernel
    W(x) = (a+2)|x|³-(a+3)|x|²+1 for |x|≤1, a(|x|³-5|x|²+8|x|-4) for
    1<|x|<2, with a = -0.75 (OpenCV's coefficient)."""
    a = -0.75
    d0 = 1.0 + f
    d3 = 2.0 - f
    w0 = a * (d0 * d0 * d0 - 5.0 * d0 * d0 + 8.0 * d0 - 4.0)
    w1 = (a + 2.0) * f * f * f - (a + 3.0) * f * f + 1.0
    d2 = 1.0 - f
    w2 = (a + 2.0) * d2 * d2 * d2 - (a + 3.0) * d2 * d2 + 1.0
    w3 = a * (d3 * d3 * d3 - 5.0 * d3 * d3 + 8.0 * d3 - 4.0)
    return w0, w1, w2, w3


def get_rotate_crop_image(
    img: np.ndarray, points: np.ndarray, interpolation: str = "cubic"
) -> np.ndarray:
    assert len(points) == 4, "shape of points must be 4*2"
    pts = np.asarray(points, dtype=np.float64)
    aa = _axis_aligned_int_box(pts)
    if aa is not None:
        x0, y0, w_box, h_box = aa
        dst_img = img[
            max(0, y0) : max(0, y0) + h_box, max(0, x0) : max(0, x0) + w_box
        ].copy()
        if dst_img.size and dst_img.shape[0] * 1.0 / dst_img.shape[1] >= 1.5:
            dst_img = np.rot90(dst_img)
        if dst_img.size:
            return dst_img
        # degenerate after clamping → fall through to the general path
    crop_w = int(max(np.linalg.norm(pts[0] - pts[1]), np.linalg.norm(pts[2] - pts[3])))
    crop_h = int(max(np.linalg.norm(pts[0] - pts[3]), np.linalg.norm(pts[1] - pts[2])))
    crop_w = max(crop_w, 1)
    crop_h = max(crop_h, 1)
    dst = np.array(
        [[0, 0], [crop_w, 0], [crop_w, crop_h], [0, crop_h]], dtype=np.float64
    )
    # invert: map each destination pixel back into the source image
    m_inv = _perspective_matrix(dst, pts)
    yy, xx = np.mgrid[0:crop_h, 0:crop_w].astype(np.float64)
    ones = np.ones_like(xx)
    denom = m_inv[2, 0] * xx + m_inv[2, 1] * yy + m_inv[2, 2] * ones
    sx = (m_inv[0, 0] * xx + m_inv[0, 1] * yy + m_inv[0, 2]) / denom
    sy = (m_inv[1, 0] * xx + m_inv[1, 1] * yy + m_inv[1, 2]) / denom

    h, w = img.shape[:2]
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0

    a = img.astype(np.float32)
    if interpolation == "cubic":
        # 4×4 Keys bicubic, replicate border via index clamping
        wxs = _keys_cubic_weights(fx)
        wys = _keys_cubic_weights(fy)
        if a.ndim == 3:
            wxs = [wv[..., None] for wv in wxs]
            wys = [wv[..., None] for wv in wys]
        xcs = [np.clip(x0 + j, 0, w - 1) for j in (-1, 0, 1, 2)]
        ycs = [np.clip(y0 + i, 0, h - 1) for i in (-1, 0, 1, 2)]
        out = None
        for wy_i, yc in zip(wys, ycs):
            row = None
            for wx_j, xc in zip(wxs, xcs):
                term = a[yc, xc] * wx_j
                row = term if row is None else row + term
            term = row * wy_i
            out = term if out is None else out + term
    else:
        x0c = np.clip(x0, 0, w - 1)
        x1c = np.clip(x0 + 1, 0, w - 1)
        y0c = np.clip(y0, 0, h - 1)
        y1c = np.clip(y0 + 1, 0, h - 1)
        wx = fx[..., None] if a.ndim == 3 else fx
        wy = fy[..., None] if a.ndim == 3 else fy
        top = a[y0c, x0c] * (1 - wx) + a[y0c, x1c] * wx
        bot = a[y1c, x0c] * (1 - wx) + a[y1c, x1c] * wx
        out = top * (1 - wy) + bot * wy
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.rint(out), 0, 255)
    dst_img = out.astype(img.dtype)

    if dst_img.shape[0] * 1.0 / dst_img.shape[1] >= 1.5:
        dst_img = np.rot90(dst_img)
    return dst_img
