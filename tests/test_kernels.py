"""Golden kernel fixtures (FIXTURES.md §2) — no Spark, no models."""

import numpy as np
import pytest

from onnxocr_spark.kernels import (
    bilinear_resize,
    det_resize_for_test,
    normalize_image,
    to_chw,
    db_postprocess,
    order_points_clockwise,
    clip_det_res,
    filter_tag_det_res,
    sorted_boxes,
    get_rotate_crop_image,
    ctc_greedy_decode,
    cls_decode,
    should_rotate,
    aspect_sorted_batches,
)
from onnxocr_spark.kernels.dbpostprocess import (
    connected_components,
    min_area_rect,
    box_score_fast,
    unclip_rect,
)


# ---------------------------------------------------------------- det resize
@pytest.mark.parametrize(
    "shape,expected",
    [
        # tiny: h+w < 64 → padded to ≥32 first (operators.py:56-58)
        ((31, 17, 3), (32, 32, 3)),
        # ≤960: round to multiples of 32 only
        ((100, 200, 3), (96, 192, 3)),
        # max side 1200 > 960 → scale 0.8 → (960, 720) → round(720/32)=22.5
        # → 22 (banker's rounding, as in the reference's int(round(...)))
        ((1200, 900, 3), (960, 704, 3)),
        ((960, 960, 3), (960, 960, 3)),
    ],
)
def test_det_resize_shapes(shape, expected):
    img = np.zeros(shape, dtype=np.uint8)
    out, meta = det_resize_for_test(img)
    assert out.shape == expected
    src_h, src_w = shape[:2]
    assert meta[0] == src_h and meta[1] == src_w


def test_det_resize_identity_for_multiple_of_32():
    img = (np.arange(64 * 96 * 3) % 255).astype(np.uint8).reshape(64, 96, 3)
    out, meta = det_resize_for_test(img)
    np.testing.assert_array_equal(out, img)
    assert meta[2] == 1.0 and meta[3] == 1.0


# ----------------------------------------------------------------- normalize
def test_normalize_imagenet():
    img = np.full((2, 2, 3), 255, dtype=np.uint8)
    out = normalize_image(img)
    exp = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], exp.astype(np.float32), rtol=1e-5)
    assert out.dtype == np.float32
    assert to_chw(out).shape == (3, 2, 2)


# ----------------------------------------------------------- db postprocess
def _rect_map(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), dtype=np.float32)
    m[y0:y1, x0:x1] = 1.0
    return m


def test_db_postprocess_clean_rectangle():
    pred = _rect_map(96, 96, 20, 40, 10, 70)
    shape = np.array([96, 96, 1.0, 1.0])
    boxes, scores = db_postprocess(pred, shape)
    assert boxes.shape[0] == 1
    assert scores[0] == pytest.approx(1.0)
    # unclip d = area*1.5/perimeter = (60*19... component is pixel-extent
    b = boxes[0]
    # grown box must strictly contain the rect and stay in bounds
    assert b[:, 0].min() < 10 and b[:, 0].max() > 69
    assert b[:, 1].min() < 20 and b[:, 1].max() > 39
    assert b.min() >= 0 and b.max() <= 96


def test_db_postprocess_two_blobs_and_speck():
    pred = _rect_map(128, 128, 10, 30, 10, 60)
    pred += _rect_map(128, 128, 60, 80, 20, 100)
    pred[100, 100] = 1.0  # 1-px speck: min side < 3 → dropped
    shape = np.array([128, 128, 1.0, 1.0])
    boxes, scores = db_postprocess(pred, shape)
    assert boxes.shape[0] == 2


def test_db_postprocess_box_thresh_filters_weak():
    pred = _rect_map(96, 96, 20, 40, 10, 70) * 0.5  # above 0.3, below 0.6
    boxes, _ = db_postprocess(pred, np.array([96, 96, 1.0, 1.0]))
    assert boxes.shape[0] == 0


def test_db_postprocess_max_candidates():
    pred = np.zeros((200, 200), dtype=np.float32)
    for y in range(0, 200, 10):
        for x in range(0, 200, 10):
            pred[y : y + 5, x : x + 5] = 1.0
    boxes, _ = db_postprocess(pred, np.array([200, 200, 1.0, 1.0]), max_candidates=7)
    assert boxes.shape[0] <= 7


def test_db_postprocess_rescale_to_source():
    # bitmap at half resolution of source
    pred = _rect_map(64, 64, 16, 32, 8, 40)
    shape = np.array([128, 128, 0.5, 0.5])
    boxes, _ = db_postprocess(pred, shape)
    b = boxes[0]
    # coords are mapped back: centers roughly doubled
    assert 60 <= b[:, 1].max() <= 80
    assert b[:, 0].max() >= 78


def test_connected_components_eight_connectivity():
    m = np.zeros((6, 6), dtype=bool)
    m[0, 0] = True
    m[1, 1] = True  # diagonal touch → one component
    m[4, 4] = True  # far away → second
    comps = connected_components(m)
    assert len(comps) == 2


def test_min_area_rect_rotated():
    # a 45°-rotated line of points: rect should align to it
    t = np.arange(0, 20, dtype=np.float32)
    pts = np.stack([10 + t, 10 + t], axis=1)
    pts = np.concatenate([pts, pts + [3, -3]])  # thickness along anti-diagonal
    rect, sside = min_area_rect(pts)
    assert sside == pytest.approx(np.hypot(3, 3), rel=0.05)


def test_box_score_fast_partial():
    bitmap = _rect_map(50, 50, 0, 50, 0, 25)  # left half ones
    box = np.array([[0, 0], [49, 0], [49, 49], [0, 49]], dtype=np.float32)
    s = box_score_fast(bitmap, box)
    assert 0.4 < s < 0.6


def test_unclip_rect_exact_growth():
    box = np.array([[0, 0], [60, 0], [60, 20], [0, 20]], dtype=np.float32)
    grown, sside = unclip_rect(box, 1.5)
    d = (60 * 20) * 1.5 / (2 * (60 + 20))
    assert sside == pytest.approx(20 + 2 * d)
    assert grown[:, 0].min() == pytest.approx(-d, abs=1e-4)
    assert grown[:, 0].max() == pytest.approx(60 + d, abs=1e-4)


# -------------------------------------------------------------- box filters
def test_order_points_clockwise():
    pts = np.array([[10, 10], [0, 10], [0, 0], [10, 0]], dtype=np.float32)
    out = order_points_clockwise(pts)
    np.testing.assert_array_equal(out, [[0, 0], [10, 0], [10, 10], [0, 10]])


def test_clip_and_filter_degenerate():
    boxes = np.array(
        [
            [[0, 0], [100, 0], [100, 30], [0, 30]],  # fine
            [[5, 5], [8, 5], [8, 8], [5, 8]],  # ≤3px → dropped
            [[-10, -10], [200, -10], [200, 20], [-10, 20]],  # clipped, kept
        ],
        dtype=np.float32,
    )
    out = filter_tag_det_res(boxes, 64, 128)
    assert out.shape[0] == 2
    assert out[1].min() >= 0 and out[1][:, 0].max() <= 127


def test_clip_det_res_bounds():
    pts = np.array([[-5, 3], [999, 999], [10, -1], [50, 50]], dtype=np.float32)
    out = clip_det_res(pts, 100, 200)
    assert out[:, 0].max() <= 199 and out[:, 1].max() <= 99 and out.min() >= 0


# --------------------------------------------------------------- sorted_boxes
def _box(x, y):
    return np.array([[x, y], [x + 20, y], [x + 20, y + 10], [x, y + 10]], np.float32)


def test_sorted_boxes_same_line_tolerance():
    # Δy = 9 < 10 → swap when right box is left of left box
    boxes = np.stack([_box(50, 0), _box(0, 9)])
    out = sorted_boxes(boxes)
    assert out[0][0][0] == 0 and out[1][0][0] == 50


def test_sorted_boxes_distinct_lines():
    # Δy = 11 ≥ 10 → keep y-order even though x is reversed
    boxes = np.stack([_box(50, 0), _box(0, 11)])
    out = sorted_boxes(boxes)
    assert out[0][0][0] == 50 and out[1][0][0] == 0


def test_sorted_boxes_single_bubble_pass_not_fixpoint():
    # three boxes same line, fully reversed: the single pass (as written
    # in the reference) does sort [c, b, a] -> [a, b, c]
    boxes = np.stack([_box(100, 0), _box(50, 4), _box(0, 8)])
    out = sorted_boxes(boxes)
    assert [b[0][0] for b in out] == [0, 50, 100]


# ---------------------------------------------------------------------- crop
def test_rotate_crop_axis_aligned_identity():
    img = (np.arange(40 * 60 * 3) % 251).astype(np.uint8).reshape(40, 60, 3)
    box = np.array([[10, 5], [50, 5], [50, 25], [10, 25]], dtype=np.float32)
    crop = get_rotate_crop_image(img, box)
    assert crop.shape == (20, 40, 3)
    np.testing.assert_array_equal(crop, img[5:25, 10:50])


def test_rotate_crop_tall_rot90():
    img = np.zeros((100, 100, 3), dtype=np.uint8)
    box = np.array([[10, 10], [20, 10], [20, 60], [10, 60]], dtype=np.float32)
    crop = get_rotate_crop_image(img, box)
    assert crop.shape[0] < crop.shape[1]  # h/w was 5 ≥ 1.5 → rotated


# ----------------------------------------------------------------------- ctc
def _logits(seq, c=8):
    out = np.zeros((1, len(seq), c), dtype=np.float32)
    for t, (i, p) in enumerate(seq):
        out[0, t, i] = p
    return out


def test_ctc_dedupe_and_blank():
    charset = list("abcdefg")
    # a a blank b b → "ab"
    preds = _logits([(1, 0.9), (1, 0.8), (0, 0.99), (2, 0.7), (2, 0.6)])
    [(text, conf)] = ctc_greedy_decode(preds, charset)
    assert text == "ab"
    assert conf == pytest.approx(np.mean([0.9, 0.7]))


def test_ctc_repeat_across_blank_survives():
    charset = list("abcdefg")
    preds = _logits([(1, 1.0), (0, 1.0), (1, 1.0)])
    [(text, _)] = ctc_greedy_decode(preds, charset)
    assert text == "aa"


def test_ctc_all_blank_zero_conf():
    charset = list("abcdefg")
    preds = _logits([(0, 1.0), (0, 1.0)])
    [(text, conf)] = ctc_greedy_decode(preds, charset)
    assert text == "" and conf == 0.0


# ----------------------------------------------------------------------- cls
def test_cls_decode_and_rotate_rule():
    preds = np.array([[0.95, 0.05], [0.2, 0.8], [0.45, 0.55]], dtype=np.float32)
    out = cls_decode(preds)
    assert out[0] == ("0", pytest.approx(0.95))
    assert out[1] == ("180", pytest.approx(0.8))
    assert not should_rotate(*out[0])
    assert not should_rotate(*out[1])  # 0.8 ≤ 0.9
    assert should_rotate("180", 0.95)


# ------------------------------------------------------------------ batching
def test_aspect_sorted_batches():
    shapes = [(10, int(10 * r)) for r in [0.5, 1, 2, 3, 4, 6, 6.7, 8]]
    batches = aspect_sorted_batches(shapes, batch_num=6, min_ratio=320 / 48.0)
    assert len(batches) == 2
    idx0, r0 = batches[0]
    idx1, r1 = batches[1]
    assert list(idx0) == [0, 1, 2, 3, 4, 5]
    assert list(idx1) == [6, 7]
    assert r0 == pytest.approx(320 / 48.0)  # floored at imgW/imgH
    assert r1 == pytest.approx(8.0)


def test_bilinear_resize_constant_preserved():
    img = np.full((32, 64, 3), 150, dtype=np.uint8)
    out = bilinear_resize(img, 48, 21)
    assert out.shape == (21, 48, 3)
    assert np.all(out == 150)


# -------------------------------------------------- poly path / slow score
def test_db_postprocess_slow_score_component_mean():
    from onnxocr_spark.kernels.dbpostprocess import db_postprocess

    # half-intensity rectangle: component mean 0.65 passes box_thresh,
    # but the rect-fill fast score equals it here; use an L-shape where
    # the rect mean < component mean
    pred = np.zeros((64, 64), dtype=np.float32)
    pred[10:20, 10:50] = 0.9   # horizontal arm
    pred[10:40, 10:20] = 0.9   # vertical arm (L-shape)
    boxes_fast, s_fast = db_postprocess(pred, np.array([64, 64, 1, 1]),
                                        score_mode="fast")
    boxes_slow, s_slow = db_postprocess(pred, np.array([64, 64, 1, 1]),
                                        score_mode="slow")
    # the rect over the L includes the empty corner → fast score falls
    # below box_thresh and the box is dropped; slow scores the region
    # itself and keeps it — the exact semantic split of the two modes
    assert len(boxes_fast) == 0
    assert len(boxes_slow) == 1
    assert s_slow[0] == pytest.approx(0.9, abs=1e-5)


def test_db_postprocess_poly_variant():
    from onnxocr_spark.kernels.dbpostprocess import db_postprocess_poly

    pred = np.zeros((96, 96), dtype=np.float32)
    pred[20:40, 10:70] = 1.0
    polys, scores = db_postprocess_poly(pred, np.array([96, 96, 1, 1]))
    assert len(polys) == 1
    p = polys[0]
    assert p.shape[1] == 2 and p.shape[0] >= 4
    # offset outward: polygon must strictly contain the source rect
    assert p[:, 0].min() < 10 and p[:, 0].max() > 69
    assert p[:, 1].min() < 20 and p[:, 1].max() > 39
    assert scores[0] == pytest.approx(1.0)


def test_min_area_rect_crop():
    from onnxocr_spark.kernels.crop import get_minarea_rect_crop

    img = (np.arange(64 * 64 * 3) % 251).astype(np.uint8).reshape(64, 64, 3)
    poly = np.array([[10, 10], [40, 10], [45, 20], [40, 30], [10, 30]],
                    dtype=np.float32)
    crop = get_minarea_rect_crop(img, poly)
    assert crop.shape[0] >= 19 and crop.shape[1] >= 34


def test_pred_reverse_arabic_rule():
    from onnxocr_spark.kernels.ctc import pred_reverse

    # LTR runs stay intact, other chars are single reversed segments
    assert pred_reverse("abc") == "abc"
    assert pred_reverse("اب") == "با"
    assert pred_reverse("abاcd") == "cdاab"


def test_ctc_decode_reverse_flag():
    charset = ["a", "b", "ا"]
    preds = _logits([(1, 1.0), (3, 1.0), (2, 1.0)], c=4)
    [(text, _)] = ctc_greedy_decode(preds, charset, reverse=True)
    assert text == "bاa"


def test_det_resize_type1_fixed_and_keep_ratio():
    from onnxocr_spark.kernels.resize import det_resize_type1

    img = np.zeros((100, 300, 3), dtype=np.uint8)
    out, meta = det_resize_type1(img, (64, 128))
    assert out.shape == (64, 128, 3)
    # keep_ratio: w = 300*64/100 = 192 → ceil(192/32)*32 = 192
    out2, meta2 = det_resize_type1(img, (64, 128), keep_ratio=True)
    assert out2.shape == (64, 192, 3)
    assert meta2[2] == pytest.approx(0.64)


def test_det_resize_type2_long_side_128_multiple():
    from onnxocr_spark.kernels.resize import det_resize_type2

    img = np.zeros((200, 500, 3), dtype=np.uint8)
    out, meta = det_resize_type2(img, resize_long=960)
    # ratio 960/500=1.92 → (384, 960) → ceil to /128 → (384, 1024)
    assert out.shape == (384, 1024, 3)
    assert out.shape[0] % 128 == 0 and out.shape[1] % 128 == 0
