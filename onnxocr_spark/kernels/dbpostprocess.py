"""DB (Differentiable Binarization) postprocess — pure numpy.

Behavioral mirror of DBPostProcess on the default quad path
(/root/reference/onnxocr/db_postprocess.py:104-157,182-197,220-246):

    prob map → binarize (> thresh, 0.3)
             → connected components        (cv2.findContours analog)
             → min-area rect per component (cv2.minAreaRect analog:
               convex hull + rotating calipers)
             → drop if min side < min_size (3)
             → score = mean prob inside box (box_score_fast)
             → drop if score < box_thresh (0.6)
             → unclip: offset outward by d = area·unclip_ratio/perimeter
               (pyclipper JT_ROUND analog — on the quad path the input is
               always a min-area *rectangle*, and minAreaRect(round-offset
               of a rectangle by d) is exactly the rectangle grown by d on
               every side, so the rectangle-grow here is equivalent, not
               an approximation)
             → drop if min side < min_size + 2
             → rescale to source coords: clip(round(x/width·dest_width))
             → int32 boxes, float scores

cv2/shapely/pyclipper are unavailable in this sandbox; everything below
is deterministic numpy + a run-based union-find for labeling.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------- labeling
def connected_components(mask: np.ndarray) -> list[np.ndarray]:
    """8-connected components of a bool mask (endpoint points only)."""
    return [pts for pts, _ in connected_components_with_runs(mask)]


def connected_components_with_runs(
    mask: np.ndarray,
) -> list[tuple[np.ndarray, list[tuple[int, int, int]]]]:
    """8-connected components of a bool mask.

    Returns per component: a (K,2) float32 array of points — the left
    and right endpoint of every horizontal run, which has the same
    convex hull as the full component (all a min-area rect needs) —
    plus the raw (y, x_start, x_end) runs (for exact component-mean
    scoring, the 'slow' score mode). Components are ordered by
    (ymin, xmin) for determinism.
    """
    h, w = mask.shape
    # all runs of every row in two vectorized passes: pad with a zero
    # column on both sides, diff along x — +1 marks a run start, -1 the
    # (exclusive) end. np.nonzero is row-major, so starts[k]/ends[k]
    # pair up per run. (The previous per-row diff/flatnonzero spent ~6
    # numpy-call overheads per foreground row — 39% of per-image time.)
    pad = np.zeros((h, w + 2), dtype=np.int8)
    pad[:, 1:-1] = mask
    d = np.diff(pad, axis=1)
    sy, sx = np.nonzero(d == 1)
    ex = np.nonzero(d == -1)[1]
    n = len(sy)
    if n == 0:
        return []
    sy_l, sx_l, ex_l = sy.tolist(), sx.tolist(), ex.tolist()

    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    # union runs of adjacent rows whose intervals overlap when widened
    # by 1 (8-connectivity); pure-int merge over the row-major run list
    prev_i = prev_j = 0
    prev_y = -2
    i = 0
    while i < n:
        y = sy_l[i]
        j = i + 1
        while j < n and sy_l[j] == y:
            j += 1
        if y == prev_y + 1:
            a, b = prev_i, i
            while a < prev_j and b < j:
                if sx_l[a] - 1 < ex_l[b] and sx_l[b] - 1 < ex_l[a]:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
                if ex_l[a] < ex_l[b]:
                    a += 1
                else:
                    b += 1
        prev_i, prev_j, prev_y = i, j, y
        i = j

    groups: dict[int, list[int]] = {}
    for k in range(n):
        groups.setdefault(find(k), []).append(k)

    comps = []
    for root in sorted(groups, key=lambda r: (sy_l[groups[r][0]], sx_l[groups[r][0]])):
        idxs = groups[root]
        runs = [(sy_l[k], sx_l[k], ex_l[k]) for k in idxs]
        arr = np.array(idxs)
        pts = np.empty((2 * len(idxs), 2), dtype=np.float32)
        pts[0::2, 0] = sx[arr]
        pts[0::2, 1] = sy[arr]
        pts[1::2, 0] = ex[arr] - 1
        pts[1::2, 1] = sy[arr]
        comps.append((pts, runs))
    return comps


# ------------------------------------------------------- min-area rectangle
def _convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull (in image coords y-down)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            # scalar 2D cross product (np.cross has ~30µs call overhead)
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float32)


def min_area_rect(points: np.ndarray) -> tuple[np.ndarray, float]:
    """Rotating-calipers minimum-area rectangle.

    Returns (4 corner points float32, min side length) — the analog of
    cv2.minAreaRect + cv2.boxPoints + the get_mini_boxes corner ordering
    (/root/reference/onnxocr/db_postprocess.py:159-180): corners ordered
    [top-left, top-right, bottom-right, bottom-left] by the reference's
    sort-by-x-then-split-by-y rule.

    Axis-aligned fast path: if the point set contains all four corners
    of its own bounding box, the min-area rect IS that box (the minimal
    enclosing rectangle of a rectangle is itself, and every other point
    lies inside it) — true for every rendered text bar, so the hull +
    calipers are skipped on the hot path with identical results.
    """
    xs, ys = points[:, 0], points[:, 1]
    x0, x1 = float(xs.min()), float(xs.max())
    y0, y1 = float(ys.min()), float(ys.max())
    if x1 > x0 and y1 > y0:
        # exact compare: inputs are run endpoints / hull corners with
        # integer-valued coords; a float miss only falls back to the
        # calipers, which return the identical rect (np.isclose here
        # cost more than the calipers it skipped)
        at_x0 = xs == x0
        at_x1 = xs == x1
        at_y0 = ys == y0
        at_y1 = ys == y1
        if (
            bool((at_x0 & at_y0).any())
            and bool((at_x1 & at_y0).any())
            and bool((at_x1 & at_y1).any())
            and bool((at_x0 & at_y1).any())
        ):
            rect = np.array(
                [[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float32
            )
            return rect, float(min(x1 - x0, y1 - y0))
    hull = _convex_hull(points)
    if len(hull) == 1:
        p = hull[0]
        return np.tile(p, (4, 1)).astype(np.float32), 0.0
    if len(hull) == 2:
        a, b = hull
        return np.array([a, b, b, a], dtype=np.float32), 0.0

    best = None
    n = len(hull)
    for i in range(n):
        edge = hull[(i + 1) % n] - hull[i]
        norm = np.hypot(edge[0], edge[1])
        if norm < 1e-9:
            continue
        u = edge / norm
        v = np.array([-u[1], u[0]], dtype=np.float64)
        pu = hull @ u
        pv = hull @ v
        du, dv = pu.max() - pu.min(), pv.max() - pv.min()
        area = du * dv
        if best is None or area < best[0] - 1e-9:
            best = (area, u, v, pu.min(), pu.max(), pv.min(), pv.max())
    assert best is not None
    _, u, v, u0, u1, v0, v1 = best
    corners = np.array(
        [
            u0 * u + v0 * v,
            u1 * u + v0 * v,
            u1 * u + v1 * v,
            u0 * u + v1 * v,
        ],
        dtype=np.float32,
    )
    sside = float(min(u1 - u0, v1 - v0))
    return _order_mini_box(corners), sside


def _order_mini_box(corners: np.ndarray) -> np.ndarray:
    """get_mini_boxes corner ordering (db_postprocess.py:161-179)."""
    pts = sorted(corners.tolist(), key=lambda p: p[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    return np.array([pts[i1], pts[i2], pts[i3], pts[i4]], dtype=np.float32)


# ------------------------------------------------------------------ scoring
def box_score_fast(bitmap: np.ndarray, box: np.ndarray) -> float:
    """Mean of ``bitmap`` inside the quad (db_postprocess.py:182-197).

    Axis-aligned quads (the output of the rect fast path above) skip
    the polygon raster: the fill mask would cover the whole bbox."""
    h, w = bitmap.shape[:2]
    b = box.copy()
    xmin = int(np.clip(np.floor(b[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(b[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(b[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(b[:, 1].max()), 0, h - 1))
    if (
        b[0, 1] == b[1, 1]
        and b[2, 1] == b[3, 1]
        and b[0, 0] == b[3, 0]
        and b[1, 0] == b[2, 0]
    ):
        return float(bitmap[ymin : ymax + 1, xmin : xmax + 1].mean())
    b[:, 0] -= xmin
    b[:, 1] -= ymin
    mask = _fill_quad(ymax - ymin + 1, xmax - xmin + 1, b.astype(np.int32))
    if not mask.any():
        return 0.0
    return float(bitmap[ymin : ymax + 1, xmin : xmax + 1][mask].mean())


def box_score_component(
    bitmap: np.ndarray, runs: list[tuple[int, int, int]]
) -> float:
    """Mean of ``bitmap`` over the component's own pixels — the 'slow'
    score (box_score_slow fills the contour polygon,
    db_postprocess.py:199-218; the run set IS that region, exactly)."""
    total = 0.0
    count = 0
    for y, s, e in runs:
        seg = bitmap[y, s:e]
        total += float(seg.sum())
        count += e - s
    return total / count if count else 0.0


def _fill_quad(h: int, w: int, quad: np.ndarray) -> np.ndarray:
    """Inclusive point-in-convex-polygon raster (cv2.fillPoly analog)."""
    yy, xx = np.mgrid[0:h, 0:w]
    inside = np.ones((h, w), dtype=bool)
    n = len(quad)
    q = quad.astype(np.float64)
    # signed area (shoelace) decides winding; accept boundary points
    area2 = sum(
        q[i][0] * q[(i + 1) % n][1] - q[(i + 1) % n][0] * q[i][1] for i in range(n)
    )
    sign = 1.0 if area2 >= 0 else -1.0
    for i in range(n):
        x1, y1 = q[i]
        x2, y2 = q[(i + 1) % n]
        cross = (x2 - x1) * (yy - y1) - (y2 - y1) * (xx - x1)
        inside &= sign * cross >= 0
    return inside


# ------------------------------------------------------------------- unclip
def unclip_rect(box: np.ndarray, unclip_ratio: float) -> tuple[np.ndarray, float]:
    """Grow a min-area rectangle outward by d = area·ratio/perimeter.

    Equivalent (exactly, for rectangles — see module docstring) to the
    reference's pyclipper round-joint offset followed by minAreaRect
    (db_postprocess.py:137-157). Returns (expanded 4-pt box, min side).
    """
    p0, p1, p2, p3 = box.astype(np.float64)
    du = p1 - p0
    dv = p3 - p0
    w = float(np.hypot(*du))
    h = float(np.hypot(*dv))
    if w < 1e-9 or h < 1e-9:
        return box.copy(), 0.0
    area = w * h
    perim = 2.0 * (w + h)
    d = area * unclip_ratio / perim
    u = du / w
    v = dv / h
    grown = np.array(
        [
            p0 - d * u - d * v,
            p1 + d * u - d * v,
            p2 + d * u + d * v,
            p3 - d * u + d * v,
        ],
        dtype=np.float32,
    )
    return _order_mini_box(grown), float(min(w, h) + 2 * d)


# -------------------------------------------------------------- entry point
def _binarize(pred: np.ndarray, thresh: float, use_dilation: bool) -> np.ndarray:
    seg = pred > thresh
    if use_dilation:  # 2×2 kernel dilate (db_postprocess.py:54-55,230-233)
        d = seg.copy()
        d[1:, :] |= seg[:-1, :]
        d[:, 1:] |= seg[:, :-1]
        d[1:, 1:] |= seg[:-1, :-1]
        seg = d
    return seg


def db_postprocess(
    pred: np.ndarray,
    shape: np.ndarray,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    max_candidates: int = 1000,
    unclip_ratio: float = 1.5,
    min_size: int = 3,
    use_dilation: bool = False,
    score_mode: str = "fast",
) -> tuple[np.ndarray, list[float]]:
    """One image's prob map (H,W) + shape [src_h,src_w,ratio_h,ratio_w]
    → (boxes int32 (N,4,2) in source coords, scores). score_mode 'fast'
    = mean inside the min-area rect; 'slow' = mean over the component
    region itself (box_score_slow analog).
    """
    src_h, src_w = int(shape[0]), int(shape[1])
    seg = _binarize(pred, thresh, use_dilation)
    height, width = seg.shape
    comps = connected_components_with_runs(seg)[:max_candidates]

    boxes, scores = [], []
    for pts, runs in comps:
        rect, sside = min_area_rect(pts)
        if sside < min_size:
            continue
        if score_mode == "slow":
            score = box_score_component(pred, runs)
        else:
            score = box_score_fast(pred, rect)
        if score < box_thresh:
            continue
        grown, sside2 = unclip_rect(rect, unclip_ratio)
        if sside2 < min_size + 2:
            continue
        out = grown.astype(np.float64)
        out[:, 0] = np.clip(np.round(out[:, 0] / width * src_w), 0, src_w)
        out[:, 1] = np.clip(np.round(out[:, 1] / height * src_h), 0, src_h)
        boxes.append(out.astype(np.int32))
        scores.append(score)
    if not boxes:
        return np.zeros((0, 4, 2), dtype=np.int32), []
    return np.stack(boxes), scores


def _offset_convex_poly(poly: np.ndarray, d: float) -> np.ndarray:
    """Offset a convex polygon outward by d (miter joins).

    The reference uses pyclipper JT_ROUND (arc joins,
    db_postprocess.py:151-157); for the convex polygons this engine
    produces, the miter offset bounds the round offset and the
    downstream min-area-rect size check makes the two equivalent —
    documented deviation.
    """
    n = len(poly)
    p = poly.astype(np.float64)
    # ensure counter-clockwise in y-down coords (positive shoelace)
    area2 = sum(
        p[i][0] * p[(i + 1) % n][1] - p[(i + 1) % n][0] * p[i][1]
        for i in range(n)
    )
    if area2 < 0:
        p = p[::-1]
    out = []
    for i in range(n):
        prev = p[(i - 1) % n]
        cur = p[i]
        nxt = p[(i + 1) % n]
        e1 = cur - prev
        e2 = nxt - cur
        n1 = np.array([e1[1], -e1[0]])
        n2 = np.array([e2[1], -e2[0]])
        n1n = np.linalg.norm(n1)
        n2n = np.linalg.norm(n2)
        if n1n < 1e-9 or n2n < 1e-9:
            out.append(cur)
            continue
        bis = n1 / n1n + n2 / n2n
        bn = np.linalg.norm(bis)
        if bn < 1e-9:
            out.append(cur + d * n1 / n1n)
            continue
        bis /= bn
        cos_half = float(np.clip(bis @ (n1 / n1n), 0.2, 1.0))
        out.append(cur + d * bis / cos_half)
    res = np.array(out, dtype=np.float32)
    return res if area2 >= 0 else res[::-1]


def db_postprocess_poly(
    pred: np.ndarray,
    shape: np.ndarray,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    max_candidates: int = 1000,
    unclip_ratio: float = 1.5,
    min_size: int = 3,
    use_dilation: bool = False,
) -> tuple[list[np.ndarray], list[float]]:
    """Polygon variant (polygons_from_bitmap, db_postprocess.py:57-102):
    per component a convex polygon (the approxPolyDP analog: convex
    hull of the region), scored over the polygon, offset outward by
    d = area·ratio/perimeter, size-checked via min-area rect, rescaled.
    Returns variable-length (K,2) int32 polygons.
    """
    src_h, src_w = int(shape[0]), int(shape[1])
    seg = _binarize(pred, thresh, use_dilation)
    height, width = seg.shape
    comps = connected_components_with_runs(seg)[:max_candidates]

    polys, scores = [], []
    for pts, runs in comps:
        hull = _convex_hull(pts)
        if hull.shape[0] < 4:
            continue
        # reference's polygons_from_bitmap scores with box_score_fast
        # (db_postprocess.py:79): mean of pred over the FILLED polygon,
        # not the component's own pixels — the two differ for
        # non-rectangular components and can flip box_thresh decisions.
        # _fill_quad rasterizes any convex polygon, so the hull is a
        # faithful fillPoly(approx) analog here.
        score = box_score_fast(pred, hull.astype(np.float32))
        if score < box_thresh:
            continue
        p = hull.astype(np.float64)
        n = len(p)
        area = abs(
            sum(
                p[i][0] * p[(i + 1) % n][1] - p[(i + 1) % n][0] * p[i][1]
                for i in range(n)
            )
        ) / 2.0
        perim = sum(np.linalg.norm(p[(i + 1) % n] - p[i]) for i in range(n))
        if perim < 1e-9:
            continue
        grown = _offset_convex_poly(hull, area * unclip_ratio / perim)
        _, sside = min_area_rect(grown)
        if sside < min_size + 2:
            continue
        out = grown.astype(np.float64)
        out[:, 0] = np.clip(np.round(out[:, 0] / width * src_w), 0, src_w)
        out[:, 1] = np.clip(np.round(out[:, 1] / height * src_h), 0, src_h)
        polys.append(out.astype(np.int32))
        scores.append(score)
    return polys, scores
