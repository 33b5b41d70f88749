"""The OCR stage: ``mapInPandas`` over media-span rows.

Spark analog of TextSystem.__call__ batching
(/root/reference/onnxocr/predict_system.py:35-72) with the reference's
per-process model cache (app/engine.py:85-96) realized as per-executor
lazy session singletons (models/sessions.py): the iterator form of
``mapInPandas`` touches the registry once per Python worker, amortized
over all Arrow batches.

Input rows:  doc_id, offset, media_ref [, media_bytes]
Output rows: doc_id, offset, media_ref, text, n_boxes, ok, err

Decode/OCR failures never kill the job (P7 guards, SURVEY.md §2.2):
they yield ok=false rows with an error message, text=''.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from onnxocr_spark.config import PipelineConfig

OCR_OUTPUT_SCHEMA = (
    "doc_id string, offset int, media_ref string, "
    "text string, n_boxes int, ok boolean, err string"
)


def make_ocr_media_fn(cfg: PipelineConfig):
    """Build the mapInPandas function. The returned closure carries only
    the (small, picklable) config; models/charsets resolve lazily on the
    executor via the per-process registry."""

    def ocr_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # imports here run on the executor worker, once per process
        from onnxocr_spark.ocr.textsystem import ocr_image_text
        from onnxocr_spark.operators.media import resolve_media

        for pdf in batches:
            has_bytes = "media_bytes" in pdf.columns
            texts, n_boxes, oks, errs = [], [], [], []
            for row in pdf.itertuples(index=False):
                ref = row.media_ref
                blob = getattr(row, "media_bytes", None) if has_bytes else None
                try:
                    img = resolve_media(ref, blob)
                    if img is None:
                        texts.append("")
                        n_boxes.append(0)
                        oks.append(False)
                        errs.append("media decode failed")
                        continue
                    txt = ocr_image_text(img, cfg)
                    texts.append(txt)
                    n_boxes.append(txt.count("\n") + 1 if txt else 0)
                    oks.append(True)
                    errs.append("")
                except Exception as exc:  # noqa: BLE001 - per-row guard
                    texts.append("")
                    n_boxes.append(0)
                    oks.append(False)
                    errs.append(f"{type(exc).__name__}: {exc}"[:500])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "offset": pdf["offset"].astype("int32"),
                    "media_ref": pdf["media_ref"],
                    "text": pd.Series(texts, dtype="string"),
                    "n_boxes": pd.Series(n_boxes, dtype="int32"),
                    "ok": pd.Series(oks, dtype="bool"),
                    "err": pd.Series(errs, dtype="string"),
                }
            )

    return ocr_media
