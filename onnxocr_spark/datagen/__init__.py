from onnxocr_spark.datagen.render import render_media, expected_media_text  # noqa: F401
from onnxocr_spark.datagen.documents import (  # noqa: F401
    generate_documents,
    expected_output_rows,
    write_documents_parquet,
)
