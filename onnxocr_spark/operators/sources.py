"""Media sources (SURVEY.md §2.1 S1-S3).

- S1 binary files: `spark.read.format("binaryFile")` over an image
  directory/glob → (media_ref=path, media_bytes) rows the OCR stage
  consumes directly (bytes win over the ref scheme in resolve_media).
- S2 base64 payloads: `unbase64` column → media_bytes.
- S3 multi-page media (the PDF analog): a pages column exploded to one
  row per page; recognized pages re-join with '\\n\\n' in page order
  (ocr_images_pdfs.py:141-165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from onnxocr_spark.config import PipelineConfig, DEFAULT_CONFIG
from onnxocr_spark.operators.ocr_media import OCR_OUTPUT_SCHEMA, make_ocr_media_fn


def read_binary_media(spark: SparkSession, path: str) -> DataFrame:
    """Image files → (media_ref = file path, media_bytes). Column
    pruning applies: binaryFile supports pathGlobFilter and does not
    read content until the UDF consumes it."""
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path").alias("media_ref"), F.col("content").alias("media_bytes")
    )


def from_base64(df: DataFrame, col: str = "payload") -> DataFrame:
    """S2: base64 string column → media_bytes (utils.py:238-244 analog)."""
    return df.withColumn("media_bytes", F.unbase64(F.col(col)))


def ocr_binary_media(
    media: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """OCR rows that carry inline bytes. Caller provides doc_id/offset
    (defaults derived from the path when absent)."""
    cols = media.columns
    if "doc_id" not in cols:
        media = media.withColumn("doc_id", F.col("media_ref"))
    if "offset" not in cols:
        media = media.withColumn("offset", F.lit(0))
    n_part = cfg.ocr_partitions or media.sparkSession.sparkContext.defaultParallelism * 2
    balanced = (
        media.withColumn(
            "_rr", F.pmod(F.monotonically_increasing_id(), F.lit(n_part))
        )
        .repartitionByRange(n_part, "_rr")
        .select("doc_id", "offset", "media_ref", "media_bytes")
    )
    return balanced.mapInPandas(make_ocr_media_fn(cfg), OCR_OUTPUT_SCHEMA)


def ocr_paged_media(
    pages: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """S3/A4: (doc_id, page_no, media_ref[, media_bytes]) one row per
    page → (doc_id, text) with pages joined '\\n\\n' in page order."""
    ocrd = (
        pages.withColumnRenamed("page_no", "offset")
        if "offset" not in pages.columns
        else pages
    )
    n_part = cfg.ocr_partitions or pages.sparkSession.sparkContext.defaultParallelism * 2
    cols = ["doc_id", "offset", "media_ref"] + (
        ["media_bytes"] if "media_bytes" in ocrd.columns else []
    )
    balanced = (
        ocrd.withColumn(
            "_rr", F.pmod(F.monotonically_increasing_id(), F.lit(n_part))
        )
        .repartitionByRange(n_part, "_rr")
        .select(*cols)
    )
    out = balanced.mapInPandas(make_ocr_media_fn(cfg), OCR_OUTPUT_SCHEMA)
    return out.groupBy("doc_id").agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("offset", "text"))),
                lambda s: s["text"],
            ),
        ).alias("text")
    )
