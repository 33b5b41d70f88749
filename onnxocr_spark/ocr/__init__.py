from onnxocr_spark.ocr.textsystem import ocr_image, ocr_image_text  # noqa: F401
