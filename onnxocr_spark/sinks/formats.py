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
