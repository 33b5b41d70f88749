"""Per-image OCR pipeline — pure Python/numpy, no Spark.

Behavioral mirror of TextSystem.__call__
(/root/reference/onnxocr/predict_system.py:35-72): detect → reading-order
sort → perspective-crop each box → angle-classify (conditionally rotate
180°) → batch-recognize (CTC) → drop-score filter. This module is the
unit-testable core; the Spark stage (operators/ocr_media.py) simply maps
it over Arrow batches with per-executor model sessions.
"""

from __future__ import annotations

import numpy as np

from onnxocr_spark.config import PipelineConfig, DEFAULT_CONFIG
from onnxocr_spark.kernels import (
    det_resize_for_test,
    normalize_image,
    to_chw,
    db_postprocess,
    filter_tag_det_res,
    sorted_boxes,
    get_rotate_crop_image,
    cls_resize_norm,
    rec_resize_norm,
    cls_decode,
    should_rotate,
    ctc_greedy_decode,
    aspect_sorted_batches,
)
from onnxocr_spark.kernels.cls import rotate180
from onnxocr_spark.models.sessions import get_session, get_charset


def detect_boxes(img: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG) -> np.ndarray:
    """image → (N,4,2) float32 boxes in source coords (det + postprocess
    + degenerate filter; mirrors TextDetector.__call__,
    predict_det.py:94-120)."""
    resized, shape = det_resize_for_test(
        img, cfg.det_limit_side_len, cfg.det_limit_type
    )
    if resized is None:
        return np.zeros((0, 4, 2), dtype=np.float32)
    det = get_session(cfg.det_model)
    if getattr(det, "supports_raw", False):
        # fused preprocessing (stub models only; identical output —
        # see DetStubSession.run_raw)
        pred = det.run_raw(resized)
    else:
        if resized.shape[2] == 1:  # gray input into a 3-channel model
            resized = np.repeat(resized, 3, axis=2)
        x = to_chw(normalize_image(resized))[None, ...]
        pred = det.run(x)[0, 0]
    common = dict(
        thresh=cfg.det_db_thresh,
        box_thresh=cfg.det_db_box_thresh,
        max_candidates=cfg.max_candidates,
        unclip_ratio=cfg.det_db_unclip_ratio,
        min_size=cfg.min_size,
        use_dilation=cfg.use_dilation,
    )
    if cfg.det_box_type == "poly":
        from onnxocr_spark.kernels.dbpostprocess import db_postprocess_poly
        from onnxocr_spark.kernels.boxes import clip_det_res

        polys, _scores = db_postprocess_poly(pred, shape, **common)
        # poly path clips only (filter_tag_det_res_only_clip,
        # predict_det.py:83-92)
        return [
            clip_det_res(p.astype(np.float32), img.shape[0], img.shape[1])
            for p in polys
        ]
    boxes, _scores = db_postprocess(
        pred, shape, score_mode=cfg.det_db_score_mode, **common
    )
    return filter_tag_det_res(boxes, img.shape[0], img.shape[1])


def classify_crops(
    crops: list[np.ndarray], cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[list[np.ndarray], list[tuple[str, float]]]:
    """Angle classification with conditional 180° rotation
    (predict_cls.py:44-94)."""
    cls = get_session(cfg.cls_model)
    raw = getattr(cls, "supports_raw", False)
    out_crops = list(crops)
    results: list[tuple[str, float]] = [("", 0.0)] * len(crops)
    shapes = [(c.shape[0], c.shape[1]) for c in crops]
    for indices, _ in aspect_sorted_batches(shapes, cfg.cls_batch_num):
        if raw:
            preds = cls.run_raw([out_crops[i] for i in indices])
        else:
            batch = np.stack(
                [cls_resize_norm(out_crops[i], cfg.cls_image_shape) for i in indices]
            )
            preds = cls.run(batch)
        for rno, (label, score) in enumerate(cls_decode(preds, cfg.label_list)):
            i = indices[rno]
            results[i] = (label, score)
            if should_rotate(label, score, cfg.cls_thresh):
                out_crops[i] = rotate180(out_crops[i])
    return out_crops, results


def recognize_crops(
    crops: list[np.ndarray], cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[tuple[str, float]]:
    """Batched CTC recognition (predict_rec.py:280-326): aspect-sorted
    batches of rec_batch_num, per-batch max w/h ratio floored at
    imgW/imgH, results restored to original order."""
    rec = get_session(cfg.rec_model)
    raw = getattr(rec, "supports_raw", False)
    charset = get_charset(cfg.rec_charset)
    # RTL reordering when the dict is an arabic one (rec_postprocess.py:30-31)
    reverse = "arabic" in cfg.rec_charset
    _, img_h, img_w = cfg.rec_image_shape
    results: list[tuple[str, float]] = [("", 0.0)] * len(crops)
    shapes = [(c.shape[0], c.shape[1]) for c in crops]
    for indices, max_ratio in aspect_sorted_batches(
        shapes, cfg.rec_batch_num, min_ratio=img_w / float(img_h)
    ):
        if raw:
            preds = rec.run_raw([crops[i] for i in indices])
        else:
            batch = np.stack(
                [
                    rec_resize_norm(crops[i], max_ratio, cfg.rec_image_shape)
                    for i in indices
                ]
            )
            preds = rec.run(batch)
        for rno, res in enumerate(ctc_greedy_decode(preds, charset, reverse)):
            results[indices[rno]] = res
    return results


def ocr_image(
    img: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> list[tuple[np.ndarray, str, float]]:
    """Full per-image pipeline → [(box, text, score)] in reading order,
    drop-score filtered (predict_system.py:35-72)."""
    dt_boxes = detect_boxes(img, cfg)
    if len(dt_boxes) == 0:
        return []
    boxes = sorted_boxes(dt_boxes)
    if cfg.det_box_type == "poly":
        from onnxocr_spark.kernels.crop import get_minarea_rect_crop

        crops = [get_minarea_rect_crop(img, b) for b in boxes]
    else:
        crops = [
            get_rotate_crop_image(img, b.astype(np.float32).copy()) for b in boxes
        ]
    if cfg.use_angle_cls:
        crops, _ = classify_crops(crops, cfg)
    rec_res = recognize_crops(crops, cfg)
    out = []
    for box, (text, score) in zip(boxes, rec_res):
        if score >= cfg.drop_score:
            out.append((box, text, score))
    return out


def ocr_image_text(img: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Newline-joined recognized lines — the per-media-span output text
    (mirrors _result_to_text, ocr_images_pdfs.py:184-201)."""
    return "\n".join(text for _, text, _ in ocr_image(img, cfg))
