from onnxocr_spark.streaming.extract import (  # noqa: F401
    run_extract_stream,
    streaming_exact_dedup,
    streaming_near_dedup,
    windowed_event_counts,
)
