"""Per-executor model session registry.

The reference loads each ONNX model once per process and caches it
(predict_base.py:7-17; the service layer's lazy per-process model cache
at app/engine.py:85-96). The Spark analog: a module-global registry in
the Python worker process — ``mapInPandas`` partitions call
``get_session`` lazily, so each executor Python worker instantiates a
model exactly once and amortizes it over all Arrow batches / tasks that
reuse the worker (spark.python.worker.reuse is on by default).

Real ONNX files (shipped via ``spark.files`` / ``--py-files`` sidecar
and resolved with SparkFiles.get) are loaded through onnxruntime when
available; the sandbox falls back to the deterministic numpy stubs.
"""

from __future__ import annotations

import os
import threading

from onnxocr_spark.models.charset import ASCII_STUB, load_dict_file

try:  # pragma: no cover - absent in sandbox
    import onnxruntime as ort  # type: ignore

    _HAS_ORT = True
except Exception:  # pragma: no cover
    ort = None
    _HAS_ORT = False

_LOCK = threading.Lock()
_SESSIONS: dict[str, object] = {}
_CHARSETS: dict[str, list[str]] = {}


class _OrtSession:  # pragma: no cover - needs onnxruntime
    """Thin adapter: single-input single-output ONNX model."""

    def __init__(self, path: str):
        if path.startswith("spark:"):  # resolve a --files sidecar
            from pyspark import SparkFiles

            path = SparkFiles.get(path[len("spark:") :])
        so = ort.SessionOptions()
        # 1 Spark task ≈ 1 core: don't oversubscribe ORT's intra-op pool
        so.intra_op_num_threads = int(os.environ.get("ORT_INTRA_OP_THREADS", "1"))
        self._sess = ort.InferenceSession(
            path, sess_options=so, providers=["CPUExecutionProvider"]
        )
        self._in = self._sess.get_inputs()[0].name
        self._out = [o.name for o in self._sess.get_outputs()]

    def run(self, x):
        return self._sess.run(self._out, {self._in: x})[0]


_STUB_NAMES = ("det_stub", "cls_stub", "rec_stub")


def _resolution(name: str) -> str:
    """'stub' | 'ort': the ONE place a model name maps to a session
    kind — ``get_session`` and ``is_real_model`` both key on it, so the
    batching contract can never disagree with what actually loads
    (ADVICE r3). Unknown names raise here, eagerly, not just at load."""
    if name in _STUB_NAMES:
        return "stub"
    if name.endswith(".onnx") or name.startswith("spark:"):
        return "ort"
    raise KeyError(f"unknown model {name!r}")


def is_real_model(name: str) -> bool:
    """True when `name` resolves to a real ONNX session (vs a stub) —
    the signal batching contracts key on
    (two_stage.resolve_rec_batch_by_image). A session already sitting
    in the registry (tests / custom injection under an arbitrary name)
    is classified by its ACTUAL type, not its name, so a real session
    registered under any name still gets the bit-faithful per-image
    batching default (ADVICE r3)."""
    sess = _SESSIONS.get(name)
    if sess is not None:
        from onnxocr_spark.models import stubs

        return not isinstance(
            sess,
            (stubs.DetStubSession, stubs.ClsStubSession, stubs.RecStubSession),
        )
    return _resolution(name) == "ort"


def get_session(name: str):
    """Executor-process-wide lazy singleton."""
    sess = _SESSIONS.get(name)
    if sess is not None:
        return sess
    with _LOCK:
        sess = _SESSIONS.get(name)
        if sess is not None:
            return sess
        if _resolution(name) == "ort":
            if not _HAS_ORT:  # pragma: no cover
                raise RuntimeError(
                    f"onnxruntime unavailable; cannot load {name!r}. "
                    "Use the *_stub models in this sandbox."
                )
            sess = _OrtSession(name)  # pragma: no cover
        else:
            from onnxocr_spark.models import stubs

            factory = {
                "det_stub": stubs.DetStubSession,
                "cls_stub": stubs.ClsStubSession,
                "rec_stub": stubs.RecStubSession,
            }[name]
            sess = factory()
        _SESSIONS[name] = sess
        return sess


def get_charset(name: str) -> list[str]:
    cs = _CHARSETS.get(name)
    if cs is not None:
        return cs
    with _LOCK:
        cs = _CHARSETS.get(name)
        if cs is None:
            cs = list(ASCII_STUB) if name == "ascii_stub" else load_dict_file(name)
            _CHARSETS[name] = cs
        return cs
