"""Structured Streaming variants (SURVEY.md §2.9).

The reference is strictly batch/request-response; the natural streaming
cut it notes is `readStream` on the input table + `foreachBatch`
running the identical extraction — nothing in the operator set is
order- or time-sensitive across documents, so the batch pipeline IS the
micro-batch body and correctness carries over verbatim.

`windowed_event_counts` demonstrates the watermark + tumbling-window
stateful path over the events table (late data dropped past the
watermark) — the building block a streaming OCR-metrics feed would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from onnxocr_spark.config import PipelineConfig, DEFAULT_CONFIG

DOCUMENTS_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def run_extract_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream documents parquet dir → extraction → parquet sink.

    foreachBatch reuses run_extract unchanged; the checkpoint gives
    exactly-once per micro-batch (the streaming counterpart of the
    ledger-based batch resume in sinks/ledger.py).
    """
    from onnxocr_spark.pipeline import run_extract

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_path)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        run_extract(batch_df, cfg).write.mode("append").parquet(output_path)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


DEDUP_OUT_SCHEMA = "fp string, doc_id long, is_first boolean"
DEDUP_STATE_SCHEMA = "n long"


def streaming_exact_dedup(stream_docs: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): cross-batch
    exact dedup over the streaming documents table.

    Each document is fingerprinted like the batch `dedup_exact` query
    (md5 of the first-4-token prefix); per-fingerprint state carries the
    number of occurrences seen across ALL previous micro-batches, so a
    duplicate arriving hours after its original is still flagged.
    Emits (fp, doc_id, is_first) — is_first marks the keeper. Within a
    micro-batch, ties resolve by ascending doc_id (deterministic under
    any partitioning; the shuffle is the groupBy(fp) hash exchange, the
    state store is the checkpointed RocksDB/HDFS-backed Spark state).

    At 10^12 docs: state is one counter per distinct fingerprint,
    hash-partitioned — the same layout a batch groupBy would shuffle,
    but amortized incrementally per micro-batch.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    fps = stream_docs.select(
        F.md5(
            F.concat_ws(" ", F.slice(F.split("text", " "), 1, 4))
        ).alias("fp"),
        "doc_id",
    )

    def fn(key, pdfs, state):
        import pandas as pd

        (seen,) = state.get if state.exists else (0,)
        # materialize every chunk of the group before sorting: a group
        # spanning multiple pandas chunks in one micro-batch must still
        # resolve ties by the GLOBAL ascending doc_id, not per-chunk
        ids = sorted(int(d) for pdf in pdfs for d in pdf["doc_id"])
        rows = []
        for did in ids:
            rows.append((key[0], did, seen == 0))
            seen += 1
        state.update((seen,))
        yield pd.DataFrame(rows, columns=["fp", "doc_id", "is_first"])

    return fps.groupBy("fp").applyInPandasWithState(
        fn,
        DEDUP_OUT_SCHEMA,
        DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Streaming tumbling-window counts with a watermark (late rows past
    the watermark are dropped). Returns the streaming DataFrame; caller
    attaches a sink (tests use the memory sink + availableNow)."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one file per micro-batch so
        .parquet(events_path)               # watermarks advance between them
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "total",
        )
    )
