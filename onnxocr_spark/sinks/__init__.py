from onnxocr_spark.sinks.ledger import (  # noqa: F401
    compact_runs,
    write_with_ledger,
    committed_doc_ids,
    pending_documents,
)
