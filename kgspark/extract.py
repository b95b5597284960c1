"""Stage 1 — boilerplate-stripped HTML -> text extraction.

Reference analogue: the XML/TEI token extraction + whitespace reconstruction
in ``to_annotation`` (``R/dbpedia.R:159-317``) — the reference rebuilds the
exact document string from markup; our contract is the input_hint's
*byte-identical extracted text per url*.

Deterministic, dependency-free spec (mirrored by the synthetic corpus
generator in ``kgspark.synth`` and by the SQL html builder used in the
DuckDB oracle):

1. decode UTF-8;
2. drop HTML comments;
3. drop non-content elements with their subtrees: head, script, style,
   noscript, nav, header, footer, aside, form, iframe, svg, template;
4. turn block-level tags, opening and closing (p/div/li/ul/ol/h1-h6/tr/
   table/article/section/blockquote/pre), and <br> into newlines;
5. strip remaining tags;
6. unescape HTML entities;
7. per line: collapse horizontal whitespace, strip; drop empty lines;
   join with "\n".

Runs as an Arrow-batched pandas UDF (series of binary -> series of string):
one narrow map stage, no shuffle, whole rows stay columnar.
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DROP_TAGS = (
    "script",
    "style",
    "noscript",
    "nav",
    "header",
    "footer",
    "aside",
    "form",
    "iframe",
    "svg",
    "template",
    "head",
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DROP_RE = re.compile(
    "|".join(rf"<{t}\b[^>]*>.*?</{t}\s*>" for t in _DROP_TAGS), re.I | re.S
)
_BLOCK_RE = re.compile(
    r"</?(?:p|div|li|ul|ol|h[1-6]|tr|table|article|section|blockquote|pre)\b[^>]*>"
    r"|<br\s*/?\s*>",
    re.I,
)
_TAG_RE = re.compile(r"<[^>]*>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text_from_html(raw: bytes | str | None) -> str | None:
    """Pure extraction kernel; the unit of byte-identity testing."""
    if raw is None:
        return None
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _COMMENT_RE.sub(" ", s)
    s = _DROP_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    lines = (_HSPACE_RE.sub(" ", ln).strip() for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


@pandas_udf(StringType())
def _extract_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text_from_html)


def extract_text(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """documents(html) -> documents(text). Narrow, shuffle-free."""
    return df.withColumn(out_col, _extract_udf(F.col(html_col)))
