"""E2E per-image pipeline vs analytic ground truth (no Spark).

The stub models + bar-code contract make every rendered image's OCR
output computable analytically (FIXTURES.md §3), so this asserts exact
text equality through detect → sort → crop → cls → rec → filter.
"""

import numpy as np
import pytest

from onnxocr_spark.datagen.render import render_media, expected_media_text, is_flipped
from onnxocr_spark.models.barcode import encode_bar, decode_bar_gray, is_upright_gray
from onnxocr_spark.ocr.textsystem import (
    ocr_image,
    ocr_image_text,
    detect_boxes,
    classify_crops,
    recognize_crops,
)


def test_barcode_roundtrip():
    for text in ["a", "line3 4242:11", "spaces  and:punct!?", "x" * 31]:
        bar = encode_bar(text)
        assert decode_bar_gray(bar.astype(np.float64) / 255.0) == text


def test_barcode_orientation():
    bar = encode_bar("hello").astype(np.float64) / 255.0
    assert is_upright_gray(bar)
    assert not is_upright_gray(bar[::-1, ::-1])


def test_detect_finds_every_line():
    img = render_media("doc_000000000002", 0)
    n_lines = len(expected_media_text("doc_000000000002", 0).split("\n"))
    assert detect_boxes(img).shape[0] == n_lines


def test_ocr_reading_order_and_text():
    cases = [(f"doc_{i:012d}", off, heavy)
             for i in range(8) for off in (0, 2) for heavy in (False, True)]
    flipped_seen = upright_seen = 0
    for doc_id, off, heavy in cases:
        img = render_media(doc_id, off, heavy)
        got = ocr_image_text(img)
        assert got == expected_media_text(doc_id, off, heavy), (doc_id, off, heavy)
        if is_flipped(doc_id, off):
            flipped_seen += 1
        else:
            upright_seen += 1
    # make sure the fixture set exercised both cls branches
    assert flipped_seen > 0 and upright_seen > 0


def test_ocr_empty_image_no_boxes():
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    assert ocr_image(img) == []


def test_classify_rotates_flipped_crop():
    bar = encode_bar("orient me")
    rgb = np.repeat(bar[:, :, None], 3, axis=2)
    flipped = rgb[::-1, ::-1].copy()
    crops, res = classify_crops([rgb, flipped])
    assert res[0][0] == "0" and res[1][0] == "180"
    np.testing.assert_array_equal(crops[1], rgb)


def test_recognize_batch_order_restored():
    # crops with very different aspect ratios land in different batches;
    # results must come back in the original list order
    texts = ["aa", "bb" * 8, "c", "dddd", "ee" * 10, "ff", "g" * 25]
    crops = [np.repeat(encode_bar(t)[:, :, None], 3, axis=2) for t in texts]
    res = recognize_crops(crops)
    assert [t for t, _ in res] == texts
    assert all(s == pytest.approx(1.0) for _, s in res)


def test_raw_and_full_tensor_paths_agree():
    """The stubs' fused run_raw paths must equal the full
    normalize→CHW→run contract a real ONNX session would use."""
    from onnxocr_spark.models import sessions

    cases = [("doc_%012d" % i, o) for i in range(4) for o in (0, 1)]
    for doc_id, off in cases:
        img = render_media(doc_id, off)
        raw_out = ocr_image_text(img)
        stubs = [sessions.get_session(n) for n in ("det_stub", "cls_stub", "rec_stub")]
        try:
            for s in stubs:
                s.__class__.supports_raw = False
            full_out = ocr_image_text(img)
        finally:
            for s in stubs:
                s.__class__.supports_raw = True
        assert raw_out == full_out == expected_media_text(doc_id, off)


def test_poly_box_type_end_to_end():
    """det_box_type='poly' (polygon det + min-area-rect crop) must read
    the synthetic bars identically — they are convex rectangles."""
    from onnxocr_spark.config import PipelineConfig

    cfg = PipelineConfig(det_box_type="poly")
    for i in (0, 5):
        doc = f"doc_{i:012d}"
        img = render_media(doc, 0)
        assert ocr_image_text(img, cfg) == expected_media_text(doc, 0)


def test_slow_score_mode_end_to_end():
    from onnxocr_spark.config import PipelineConfig

    cfg = PipelineConfig(det_db_score_mode="slow")
    img = render_media("doc_000000000004", 1)
    assert ocr_image_text(img, cfg) == expected_media_text("doc_000000000004", 1)
