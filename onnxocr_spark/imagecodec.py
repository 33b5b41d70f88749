"""Image byte codec.

The reference decodes media bytes with ``cv2.imdecode``
(/root/reference/onnxocr/ocr_images_pdfs.py:80-85, utils.py:238-244).
OpenCV is not available in this sandbox, so the engine defines a trivial
lossless raw format ("IMG1": magic + uint32 h,w,c + row-major uint8
pixels) used by the deterministic renderer, and falls back to
``cv2.imdecode`` for real-world payloads when cv2 is importable.

All functions are pure numpy and safe to call inside Arrow-batched UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

try:  # pragma: no cover - absent in sandbox
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

MAGIC = b"IMG1"
_HEADER = struct.Struct("<4sIII")


def encode_image(img: np.ndarray) -> bytes:
    """ndarray (H,W,C) uint8 → IMG1 bytes."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError(f"expected uint8 image, got {img.dtype}")
    h, w, c = img.shape
    return _HEADER.pack(MAGIC, h, w, c) + np.ascontiguousarray(img).tobytes()


def decode_image(data: bytes) -> np.ndarray | None:
    """Bytes → ndarray (H,W,3) uint8, or None on failure.

    Mirrors the reference's decode-failure tolerance
    (/root/reference/onnxocr/ocr_images_pdfs.py:86-95): bad media yields
    None and is skipped upstream rather than killing the job.
    """
    if data is None or len(data) < _HEADER.size:
        return None
    if data[:4] == MAGIC:
        magic, h, w, c = _HEADER.unpack_from(data, 0)
        if h * w * c == 0 or len(data) < _HEADER.size + h * w * c:
            return None  # truncated/corrupt blob: skip, don't kill the task
        body = np.frombuffer(data, np.uint8, count=h * w * c, offset=_HEADER.size)
        # C=1 stays single-channel: the engine accepts gray end-to-end
        # (channel replication happens late, at the crop level, only if
        # a 3-channel model requires it)
        return body.reshape(h, w, c)
    if _HAS_CV2:  # pragma: no cover - real-world path
        arr = np.frombuffer(data, np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        return img
    return None
