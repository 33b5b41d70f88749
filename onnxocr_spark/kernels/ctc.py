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


def ctc_greedy_decode(
    preds: np.ndarray, charset: list[str]
) -> list[tuple[str, float]]:
    """preds: (N, T, C) logits/probs. charset EXCLUDES blank (blank=idx 0
    after prepending, exactly like CTCLabelDecode.add_special_char)."""
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
        out.append(("".join(chars), float(np.mean(confs))))
    return out
