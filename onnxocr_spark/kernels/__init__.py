"""Pure-numpy OCR kernels (no Spark, no cv2, no ONNX).

Each kernel mirrors one reference function's *behavior* (file:line cited
in its docstring) so it can be golden-tested in isolation and composed
inside Arrow-batched Spark UDFs.
"""

from onnxocr_spark.kernels.resize import (  # noqa: F401
    bilinear_resize,
    det_resize_for_test,
    cls_resize_norm,
    rec_resize_norm,
)
from onnxocr_spark.kernels.normalize import normalize_image, to_chw  # noqa: F401
from onnxocr_spark.kernels.dbpostprocess import db_postprocess  # noqa: F401
from onnxocr_spark.kernels.boxes import (  # noqa: F401
    order_points_clockwise,
    clip_det_res,
    filter_tag_det_res,
    sorted_boxes,
)
from onnxocr_spark.kernels.crop import get_rotate_crop_image  # noqa: F401
from onnxocr_spark.kernels.ctc import ctc_greedy_decode  # noqa: F401
from onnxocr_spark.kernels.cls import cls_decode, should_rotate  # noqa: F401
from onnxocr_spark.kernels.batching import aspect_sorted_batches  # noqa: F401
