"""Deterministic interleaved `documents` table generator (FIXTURES.md §1).

Schema fixed by BASELINE.json input_hint:

    doc_id : string                      -- "doc_{i:012d}"
    spans  : array<struct<kind:string, text:string,
                          media_ref:string, offset:int>>

Every value is a pure function of (doc index) via sha256 — no RNG state,
no wall clock — so pytest, the Spark job, the DuckDB oracle, and the
bench all see identical data, and the expected OCR output of every
media span is computable analytically (render.expected_media_text).

Skew knob: every 97th doc is 'heavy' (more media spans, 2× images) to
exercise the salted repartition (SURVEY.md §4.1).
"""

from __future__ import annotations

import hashlib
import os

MULTILINGUAL = [
    "the quick brown fox",
    "pack my box with five dozen jugs",
    "lorem ipsum dolor sit amet",
    "etaoin shrdlu",
    "sphinx of black quartz",
    "judge my vow",
]


def _h(*parts: object) -> int:
    digest = hashlib.sha256("/".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(digest[:8], "big")


def doc_id_for(i: int) -> str:
    return f"doc_{i:012d}"


def is_heavy(i: int) -> bool:
    return i % 97 == 96


def spans_for(i: int) -> list[dict]:
    """Deterministic interleaved span list for doc i (~30% media)."""
    doc_id = doc_id_for(i)
    heavy = is_heavy(i)
    n = 8 + _h(i, "n") % 5 if heavy else 1 + _h(i, "n") % 12
    spans = []
    for off in range(n):
        media = (_h(i, off, "kind") % 10) < (7 if heavy else 3)
        if media:
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"img://{doc_id}/{off}",
                    "offset": off,
                }
            )
        else:
            samp = MULTILINGUAL[_h(i, off, "txt") % len(MULTILINGUAL)]
            spans.append(
                {
                    "kind": "text",
                    "text": f"para {doc_id}/{off} {samp}",
                    "media_ref": "",
                    "offset": off,
                }
            )
    return spans


def generate_documents(n_docs: int) -> list[dict]:
    return [{"doc_id": doc_id_for(i), "spans": spans_for(i)} for i in range(n_docs)]


def expected_output_rows(n_docs: int) -> list[dict]:
    """The analytically-known output of the extraction job: media spans'
    text replaced by the rendered image's OCR ground truth."""
    from onnxocr_spark.datagen.render import expected_media_text

    out = []
    for i in range(n_docs):
        heavy = is_heavy(i)
        doc_id = doc_id_for(i)
        spans = []
        for s in spans_for(i):
            if s["kind"] == "media":
                s = dict(s, text=expected_media_text(doc_id, s["offset"], heavy))
            spans.append(s)
        out.append({"doc_id": doc_id, "spans": spans})
    return out


def write_documents_parquet(path: str, n_docs: int) -> str:
    """Materialize the documents table as parquet (driver-side, small
    scales only; at real scale this table IS the Iceberg input)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    schema = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(span_t))])
    rows = generate_documents(n_docs)
    table = pa.Table.from_pylist(rows, schema=schema)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(table, path)
    return path
