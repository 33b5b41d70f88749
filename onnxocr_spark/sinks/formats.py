"""Output-format sinks (SURVEY.md §2.1 K1-K5), as DataFrame→DataFrame
transformations so any of them can feed `df.write`:

- K1 text: per-doc plain text (media OCR + text spans joined) and the
  merged corpus file (ordered concat — reference merged_ocr_*.txt,
  ocr_images_pdfs.py:112-120).
- K3 JSON: `{doc_id, results:[{text, confidence?, offset}]}` via
  to_json(struct(...)) (app-service.py:44-63 shape, batch-level).
- K4 TSV: tab-separated span rows (app/routers/v2.py:107-113).
- K5 hOCR: minimal XHTML with ocrx_word spans (v2.py:116-135) — pure
  string ops, fully SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_text(extracted: DataFrame) -> DataFrame:
    """Output documents → (doc_id, text): spans joined by newline in
    offset order (text sink K1; mirrors _result_to_text '\\n'.join)."""
    return extracted.select(
        "doc_id",
        F.concat_ws(
            "\n", F.transform("spans", lambda s: s["text"])
        ).alias("text"),
    )


def merged_corpus(extracted: DataFrame) -> DataFrame:
    """All docs merged in doc_id order, separated by blank lines
    (merged txt sink; single row)."""
    per_doc = doc_text(extracted)
    return per_doc.agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s["text"],
            ),
        ).alias("merged")
    )


def spans_json(extracted: DataFrame) -> DataFrame:
    """(doc_id, json) — K3 JSON sink."""
    return extracted.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "spans")).alias("json"),
    )


def spans_tsv_rows(extracted: DataFrame) -> DataFrame:
    """Flat rows ready for df.write.option('sep','\\t').csv — K4."""
    return extracted.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.offset").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
    )


def hocr_words(results: list, width: int, height: int) -> str:
    """Per-image hOCR with real word bboxes — the exact K5 shape
    (app/routers/v2.py:116-135): each (box, text, score) from
    ocr_image becomes an ocrx_word span whose title carries
    'bbox x0 y0 x1 y1' from corners 0 and 2 of the quad."""
    words = []
    for i, (box, text, _score) in enumerate(results):
        (x0, y0), (x1, y1) = box[0], box[2]
        words.append(
            f"<span class='ocrx_word' id='word_{i + 1}' "
            f"title='bbox {int(x0)} {int(y0)} {int(x1)} {int(y1)}'>"
            f"{text}</span>"
        )
    return (
        "<html><body>"
        f"<div class='ocr_page' id='page_1' title='bbox 0 0 {width} {height}'>"
        + "".join(words)
        + "</div></body></html>"
    )


def hocr(extracted: DataFrame) -> DataFrame:
    """(doc_id, hocr) — minimal hOCR XHTML per document (K5). Word
    boxes are not tracked at the span level, so each span becomes one
    ocr_line; the per-word bbox variant lives at the ocr_image level."""
    line = lambda s: F.concat(  # noqa: E731
        F.lit("<span class='ocr_line' id='line_"),
        s["offset"].cast("string"),
        F.lit("'>"),
        s["text"],
        F.lit("</span>"),
    )
    return extracted.select(
        "doc_id",
        F.concat(
            F.lit(
                "<html><body><div class='ocr_page' id='page_1'>"
            ),
            F.concat_ws("", F.transform("spans", line)),
            F.lit("</div></body></html>"),
        ).alias("hocr"),
    )


def _draw_line(img: "np.ndarray", p0, p1, value: int = 255) -> None:
    """1-px line rasterization (the cv2/PIL line analog) on an HWC
    uint8 image, all channels set to `value`."""
    import numpy as np

    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.clip(np.rint(np.linspace(x0, x1, n)), 0, img.shape[1] - 1).astype(int)
    ys = np.clip(np.rint(np.linspace(y0, y1, n)), 0, img.shape[0] - 1).astype(int)
    img[ys, xs, :] = value


def annotate_boxes(img: "np.ndarray", boxes) -> "np.ndarray":
    """Copy of `img` with every detection quad outlined — the K6/K7
    annotated-image debug sink (reference sav2Img/draw_ocr,
    onnx_paddleocr.py:64-77 / utils.py:195-244, box overlay only: the
    text-label half needs the simfang.ttf font, which is stripped from
    the snapshot)."""
    out = img.copy()
    for box in boxes:
        for i in range(4):
            _draw_line(out, box[i], box[(i + 1) % 4])
    return out


def annotated_images(media: "DataFrame") -> "DataFrame":
    """(doc_id, offset, media_ref[, media_bytes]) media rows →
    (doc_id, offset, media_ref, annotated IMG1 bytes, n_boxes): run
    detection, burn the boxes in, re-encode. Debug/QA sink — pixels are
    produced *and consumed* inside the one UDF, nothing widens a
    shuffle."""
    from collections.abc import Iterator

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from onnxocr_spark.imagecodec import encode_image
        from onnxocr_spark.kernels import sorted_boxes
        from onnxocr_spark.ocr.textsystem import detect_boxes
        from onnxocr_spark.operators.media import resolve_media

        for pdf in batches:
            has_bytes = "media_bytes" in pdf.columns
            rows = []
            for r in pdf.itertuples(index=False):
                blob = getattr(r, "media_bytes", None) if has_bytes else None
                img = resolve_media(r.media_ref, blob)
                if img is None:
                    rows.append((r.doc_id, r.offset, r.media_ref, None, -1))
                    continue
                boxes = [np.asarray(b, dtype=np.float64)
                         for b in sorted_boxes(detect_boxes(img))]
                rows.append((
                    r.doc_id, r.offset, r.media_ref,
                    encode_image(annotate_boxes(img, boxes)),
                    len(boxes),
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "offset", "media_ref", "annotated", "n_boxes"])

    cols = ["doc_id", "offset", "media_ref"] + (
        ["media_bytes"] if "media_bytes" in media.columns else []
    )
    return media.select(*cols).mapInPandas(
        fn,
        "doc_id string, offset int, media_ref string, annotated binary, "
        "n_boxes int",
    )


def write_doc_text_zip(extracted: "DataFrame", out_dir: str) -> int:
    """K2 zip sink: per-document .txt files packaged into zip archives,
    one shard per partition (`shard-NNNNN.zip`) — the distributed analog
    of the reference's single download zip (app/routers/v2.py zip
    response): a single zip has a single writer, so a cluster job ships
    shards and the serving layer concatenates entries on demand.
    Returns the number of documents written.

    r6 (VERDICT r5 item 3, guide §4.1): Arrow-batched mapInPandas
    writer instead of the last `.rdd` path in the repo — rows reach the
    writer as Arrow batches rather than pickled Row objects, and the
    shard index comes from TaskContext.partitionId(), which is exactly
    what mapPartitionsWithIndex supplied."""
    import os
    import zipfile

    per_doc = doc_text(extracted)

    def write_shard(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        z = None
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if z is None:
                    os.makedirs(out_dir, exist_ok=True)
                    path = os.path.join(out_dir, f"shard-{pid:05d}.zip")
                    z = zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED)
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    z.writestr(f"{doc_id}.txt", text or "")
                n += len(pdf)
        finally:
            if z is not None:
                z.close()
        yield pd.DataFrame({"n": [n]})

    counts = per_doc.mapInPandas(write_shard, "n long").collect()
    return int(sum(r.n for r in counts))
