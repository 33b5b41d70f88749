"""CTC greedy decode.

Mirrors CTCLabelDecode/BaseRecLabelDecode.decode
(/root/reference/onnxocr/rec_postprocess.py:58-113): per sequence,
argmax indices + max probs per timestep; drop adjacent duplicate
indices; drop blank (token 0 — the dict is prepended with "blank");
text = joined surviving chars; confidence = mean of surviving probs,
0.0 when nothing survives.
"""

from __future__ import annotations

import numpy as np


import re

_LTR_RE = re.compile(r"[a-zA-Z0-9 :*./%+-]")


def pred_reverse(pred: str) -> str:
    """Arabic (RTL) reordering (rec_postprocess.py:39-53): runs of
    Latin/digit/punct chars stay LTR as segments, everything else is a
    single-char segment; the segment list is reversed and re-joined."""
    segments: list[str] = []
    current = ""
    for c in pred:
        if not _LTR_RE.search(c):
            if current:
                segments.append(current)
            segments.append(c)
            current = ""
        else:
            current += c
    if current:
        segments.append(current)
    return "".join(segments[::-1])


def ctc_greedy_decode(
    preds: np.ndarray, charset: list[str], reverse: bool = False
) -> list[tuple[str, float]]:
    """preds: (N, T, C) logits/probs. charset EXCLUDES blank (blank=idx 0
    after prepending, exactly like CTCLabelDecode.add_special_char).
    ``reverse`` applies the Arabic RTL reordering (enabled when the
    charset file path contains 'arabic', rec_postprocess.py:30-31)."""
    characters = ["blank"] + list(charset)
    idx = preds.argmax(axis=2)
    prob = preds.max(axis=2)
    out: list[tuple[str, float]] = []
    for bi in range(preds.shape[0]):
        sel = np.ones(idx.shape[1], dtype=bool)
        sel[1:] = idx[bi][1:] != idx[bi][:-1]
        sel &= idx[bi] != 0
        chars = [characters[t] for t in idx[bi][sel]]
        confs = prob[bi][sel]
        if confs.size == 0:
            confs = np.array([0.0])
        text = "".join(chars)
        if reverse:
            text = pred_reverse(text)
        out.append((text, float(np.mean(confs))))
    return out
