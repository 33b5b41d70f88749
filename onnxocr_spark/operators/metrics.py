"""Executor-side OCR metrics via Spark accumulators (SURVEY.md §2.6
A7/A8: the reference's processing_time / running-average counters,
re-expressed as cluster-wide accumulators attached to the job).

Accumulators are updated inside the mapInPandas closure and read on the
driver after an action; attach_metrics wraps an existing OCR stage
function. The per-run ledger metrics (sinks/ledger.py) cover committed
totals; these cover live-job telemetry (wall seconds inside the UDF,
images, failures) without a second pass over the output.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import SparkSession


@dataclass
class OcrAccumulators:
    images: object
    failures: object
    udf_seconds: object

    def snapshot(self) -> dict:
        imgs = self.images.value
        secs = self.udf_seconds.value
        return {
            "images": imgs,
            "failures": self.failures.value,
            "udf_seconds": round(secs, 3),
            "imgs_per_udf_second": round(imgs / secs, 2) if secs else None,
        }


def make_accumulators(spark: SparkSession) -> OcrAccumulators:
    sc = spark.sparkContext
    return OcrAccumulators(
        images=sc.accumulator(0),
        failures=sc.accumulator(0),
        udf_seconds=sc.accumulator(0.0),
    )


def with_metrics(ocr_fn, acc: OcrAccumulators):
    """Wrap a mapInPandas OCR function so every batch updates the
    accumulators (closure capture ships the accumulator handles)."""

    def wrapped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inner = ocr_fn(batches)
        while True:
            t0 = time.time()
            try:
                out = next(inner)  # timing covers this batch's OCR work
            except StopIteration:
                return
            acc.udf_seconds.add(time.time() - t0)
            acc.images.add(int(len(out)))
            if "ok" in out.columns:
                acc.failures.add(int((~out["ok"]).sum()))
            yield out

    return wrapped
