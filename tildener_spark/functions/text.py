"""Deterministic HTML -> plaintext extraction.

The reference pipeline starts from plaintext (its input is already
extracted); the byte-identity contract comes from the driver's
input_hint: *extracted text must be byte-identical per url*.  We
therefore implement extraction as a pure function of the html bytes —
no heuristics that could reorder — and expose it both as a plain
Python function (used by the corpus generator and the byte-identity
unit test) and as a vectorized pandas UDF (the production path).

Extraction rules (fixed, versioned — changing any rule is a breaking
change to the byte-identity contract):
  1. decode UTF-8 (errors=replace), strip a leading BOM
     (reference strips BOM on every read, NEPreprocess.pm:38,
     NERefinements.pm:174);
  2. drop <script>/<style>/<head> subtrees and comments;
  3. block-level elements (p, div, br, h1-h6, li, tr, table, ul, ol,
     blockquote, section, article) contribute newlines; </p> and
     </div> a blank line (paragraph structure is semantic downstream:
     blank lines drive RemoveEmptyLines + refinement A,
     NEPreprocess.pm:23-72, NEUtilities.pm:136-260);
  4. all other tags are removed; entities &amp; &lt; &gt; &quot;
     &#39; &nbsp; are decoded;
  5. horizontal whitespace runs collapse to one space inside a line;
     leading/trailing spaces per line trimmed; CR removed; >=2
     consecutive blank lines collapse to exactly one blank line;
     leading/trailing blank lines trimmed.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_BOM = "﻿"
_DROP_SUBTREE = re.compile(
    r"<(script|style|head)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_PARA_CLOSE = re.compile(r"</(p|div|blockquote|section|article|h[1-6])\s*>", re.IGNORECASE)
_BLOCK_TAG = re.compile(
    r"<(?:/?(?:p|div|br|h[1-6]|li|tr|table|ul|ol|blockquote|section|article)\b)[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG = re.compile(r"<[^>]*>")
_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),  # must come last
]
_HSPACE = re.compile(r"[ \t\f\v]+")


def extract_text_py(html: bytes | str | None) -> str:
    """Pure-Python extraction core (one document). Deterministic."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    if s.startswith(_BOM):
        s = s[len(_BOM):]
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _COMMENT.sub("", s)
    s = _DROP_SUBTREE.sub("", s)
    # paragraph-closing tags -> blank line; other block tags -> newline
    s = _PARA_CLOSE.sub("\n\n", s)
    s = _BLOCK_TAG.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    for ent, rep in _ENTITIES:
        s = s.replace(ent, rep)
    lines = [
        _HSPACE.sub(" ", ln).strip() for ln in s.split("\n")
    ]
    # collapse blank runs to a single blank line
    out: list[str] = []
    blank_run = 0
    for ln in lines:
        if ln == "":
            blank_run += 1
            if blank_run == 1 and out:
                out.append("")
        else:
            blank_run = 0
            out.append(ln)
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Vectorized extraction: binary html column -> text column."""
    return html.map(extract_text_py)
