"""HTML main-content extraction (boilerplate strip + DOM heuristics).

The north-rule extraction tier covers web-shaped inputs: strip chrome
(nav / header / footer / aside / script / style), then keep the content
blocks a readability-style heuristic scores as "main": enough text and
low link density. The heuristics are GENERIC (nothing here knows the
test template):

1. drop non-content elements by tag (DOM heuristic);
2. segment the remainder at block-level tag boundaries;
3. per block: visible text length and link density
   (chars inside <a>…</a> / total chars);
4. keep blocks with ≥ `min_chars` visible chars and link density
   ≤ `max_link_density`; join with newlines.

Entities &amp; &lt; &gt; &quot; &#39; &nbsp; are unescaped. Spark-side
the operator is one Arrow-batched pandas UDF over the html column —
embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

_DROP_ELEMENTS = re.compile(
    r"<(nav|header|footer|aside|script|style|noscript|form)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_HEAD = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_BOUNDARY = re.compile(
    r"</?(?:p|div|section|article|main|h[1-6]|li|ul|ol|table|tr|td|br|blockquote)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")
_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">",
    "&quot;": '"', "&#39;": "'", "&nbsp;": " ",
}


def _unescape(text: str) -> str:
    for k, v in _ENTITIES.items():
        text = text.replace(k, v)
    return text


def strip_tags(fragment: str) -> str:
    """Visible text of an HTML fragment (tags removed, entities
    unescaped, whitespace collapsed)."""
    return _unescape(_WS.sub(" ", _TAG.sub(" ", fragment))).strip()


def extract_main_content(
    html: str, min_chars: int = 25, max_link_density: float = 0.33
) -> str:
    """Main text of one HTML document per the module heuristics."""
    if not html:
        return ""
    body = _COMMENT.sub(" ", html)
    body = _HEAD.sub(" ", body)
    # iterate: dropped elements may nest (aside inside div etc.)
    prev = None
    while prev != body:
        prev = body
        body = _DROP_ELEMENTS.sub(" ", body)
    kept: list[str] = []
    for block in _BLOCK_BOUNDARY.split(body):
        text = strip_tags(block)
        if len(text) < min_chars:
            continue
        link_chars = sum(len(strip_tags(m)) for m in _ANCHOR.findall(block))
        if link_chars / max(len(text), 1) > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept)


def html_main_content(
    df: DataFrame,
    html_col: str = "html",
    min_chars: int = 25,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Adds `main_text` extracted from `html_col` (Arrow-batched UDF,
    no shuffle)."""

    @pandas_udf("string")
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda h: extract_main_content(h or "", min_chars, max_link_density)
        )

    return df.withColumn("main_text", _udf(F.col(html_col)))
