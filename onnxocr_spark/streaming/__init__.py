from onnxocr_spark.streaming.extract import (  # noqa: F401
    run_extract_stream,
    windowed_event_counts,
)
