from onnxocr_spark.models.sessions import get_session, get_charset  # noqa: F401
