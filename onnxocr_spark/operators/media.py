"""Media reference resolution.

At production scale ``media_ref`` points into an object store / Iceberg
blob table and stays a *reference* until the last moment ("decode late,
never shuffle pixels" — SURVEY.md §4). The resolver turns a ref (plus
optional inline bytes) into an ndarray inside the OCR UDF.

The sandbox resolver understands the deterministic synthetic scheme
``img://{doc_id}/{offset}`` (FIXTURES.md §1) and renders the image on
the fly — a pure function, so retries/speculative tasks are stable. A
real deployment registers a fetching resolver instead (same signature).
"""

from __future__ import annotations

import numpy as np

from onnxocr_spark.imagecodec import decode_image


def resolve_synthetic(media_ref: str) -> np.ndarray | None:
    """img://{doc_id}/{offset} → rendered ndarray (or None if unparsable)."""
    from onnxocr_spark.datagen.render import render_media
    from onnxocr_spark.datagen.documents import is_heavy

    if not media_ref or not media_ref.startswith("img://"):
        return None
    try:
        doc_id, off_s = media_ref[len("img://") :].rsplit("/", 1)
        offset = int(off_s)
        idx = int(doc_id.split("_")[-1])
    except (ValueError, IndexError):
        return None
    return render_media(doc_id, offset, heavy=is_heavy(idx))


def resolve_media(media_ref: str, media_bytes: bytes | None = None) -> np.ndarray | None:
    """Inline bytes win (binary-source path); else the ref scheme."""
    if media_bytes is not None and len(media_bytes) > 0:
        return decode_image(media_bytes)
    return resolve_synthetic(media_ref)
