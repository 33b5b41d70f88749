"""Character dictionaries.

The reference loads a line-per-char dict file and appends a space char
(/root/reference/onnxocr/rec_postprocess.py:18-37; v5 dict =
models/ppocrv5/ppocrv5_dict.txt, 18,383 entries). Real det/rec weights
are stripped from the snapshot, so the sandbox charset is a compact
deterministic stand-in: the 95 printable ASCII chars (0x20..0x7E).
A dict-file loader is kept for real-model deployments.

The charset is tiny; in Spark it is captured in the UDF closure (an
O(1) positional lookup, not a join — SURVEY.md §1.1).
"""

from __future__ import annotations

ASCII_STUB: list[str] = [chr(c) for c in range(0x20, 0x7F)]
ASCII_INDEX: dict[str, int] = {c: i for i, c in enumerate(ASCII_STUB)}


def load_dict_file(path: str, use_space_char: bool = True) -> list[str]:
    chars: list[str] = []
    with open(path, "rb") as fin:
        for line in fin:
            chars.append(line.decode("utf-8").strip("\n").strip("\r\n"))
    if use_space_char:
        chars.append(" ")
    return chars
