"""MUC-7 inline markup: detag (parse) and retag (emit).

Reference semantics:
  * detagger — NEPreprocess.pm:81-161: strip ``<ENAMEX TYPE="…">…
    </ENAMEX>`` / ``<TIMEX …>`` / ``<NUMEX …>`` from plaintext,
    emitting standoff tags ``type \\t startLine \\t startCol \\t
    endLine \\t endCol`` whose offsets are positions in the *cleaned*
    text (each removal shifts subsequent columns — sequential per
    line, which is why this is a per-document function, not a regex
    projection);
  * markup sink — AddMarkupToPlaintext, NEPreprocess.pm:422-506:
    splice the inline elements back around stored offsets, advancing
    an accumulated inserted-length cursor per line
    (NEPreprocess.pm:491-496).

Type mapping (GetMucTagName / GetNEtagType, NEUtilities.pm:82-127):
PERS->ENAMEX PERSON, LOC->ENAMEX LOCATION, ORG->ENAMEX ORGANIZATION,
PROD->ENAMEX PRODUCT, DATE/TIME->TIMEX, MON->NUMEX MONEY.

Both directions are pandas UDFs over whole documents (offsets are
document-local state); the round trip is exact:
``detag(retag(text, spans)) == (text, spans)`` for non-nested,
non-overlapping spans — tests/test_muc7.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tildener_spark.config import MUC_TO_SHORT, SHORT_TO_MUC

SPAN_STRUCT = T.StructType([
    T.StructField("ne_type", T.StringType()),
    T.StructField("line_from", T.IntegerType()),
    T.StructField("col_from", T.IntegerType()),
    T.StructField("line_to", T.IntegerType()),
    T.StructField("col_to", T.IntegerType()),
])

DETAG_STRUCT = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
])

_OPEN_RE = re.compile(r'<(ENAMEX|TIMEX|NUMEX)\s+TYPE="([A-Z]+)"\s*>')
_CLOSE_RE = re.compile(r"</(ENAMEX|TIMEX|NUMEX)\s*>")


def detag_muc7_py(tagged_text: str | None) -> dict:
    """Inline-tagged document -> (clean text, standoff spans).

    Offsets are character positions in the cleaned text, 0-based,
    col_to inclusive (the writer format of NEPreprocess.pm:122,156).
    Nested tags are handled with a stack (the reference processes one
    level; we accept nesting and emit inner spans too)."""
    if not tagged_text:
        return {"text": "", "spans": []}
    out_lines: list[str] = []
    spans: list[dict] = []
    stack: list[tuple[str, int, int]] = []  # (short_type, line, col)
    for line_no, line in enumerate(tagged_text.split("\n")):
        clean = []
        col = 0  # column in cleaned line
        i = 0
        while i < len(line):
            m = _OPEN_RE.match(line, i)
            if m:
                muc = m.group(2)
                stack.append((MUC_TO_SHORT.get(muc, muc), line_no, col))
                i = m.end()
                continue
            m = _CLOSE_RE.match(line, i)
            if m and stack:
                short, l0, c0 = stack.pop()
                spans.append({
                    "ne_type": short, "line_from": l0, "col_from": c0,
                    "line_to": line_no, "col_to": col - 1,
                })
                i = m.end()
                continue
            clean.append(line[i])
            col += 1
            i += 1
        out_lines.append("".join(clean))
    spans.sort(key=lambda s: (s["line_from"], s["col_from"], s["col_to"]))
    return {"text": "\n".join(out_lines), "spans": spans}


def add_markup_py(text: str | None, spans: list | None) -> str:
    """Clean text + standoff spans -> MUC-7 inline-tagged text.

    Mirrors AddMarkupToPlaintext: spans applied in document order,
    each insertion advancing the accumulated offset of its line
    (NEPreprocess.pm:489-496).  Spans must not overlap (the span
    assembler guarantees that)."""
    if not text:
        return ""
    lines = text.split("\n")
    # inserted-characters-so-far per line
    shift = [0] * len(lines)

    def _get(s, k):
        return s[k] if isinstance(s, dict) else getattr(s, k)

    if spans is None:
        spans = []
    ordered = sorted(
        list(spans),  # may arrive as a numpy array from Arrow
        key=lambda s: (_get(s, "line_from"), _get(s, "col_from")))
    for s in ordered:
        short = _get(s, "ne_type")
        muc, elem = SHORT_TO_MUC.get(short, (short, "ENAMEX"))
        open_tag = f'<{elem} TYPE="{muc}">'
        close_tag = f"</{elem}>"
        lf, cf = _get(s, "line_from"), _get(s, "col_from")
        lt, ct = _get(s, "line_to"), _get(s, "col_to")
        if lf >= len(lines) or lt >= len(lines):
            continue  # boundary mismatch => tag dropped (NEPreprocess.pm:335-343)
        p0 = cf + shift[lf]
        lines[lf] = lines[lf][:p0] + open_tag + lines[lf][p0:]
        shift[lf] += len(open_tag)
        p1 = ct + 1 + shift[lt]
        lines[lt] = lines[lt][:p1] + close_tag + lines[lt][p1:]
        shift[lt] += len(close_tag)
    return "\n".join(lines)


@F.pandas_udf(DETAG_STRUCT)
def detag_muc7(tagged: pd.Series) -> pd.DataFrame:
    docs = [detag_muc7_py(t) for t in tagged]
    return pd.DataFrame(
        {"text": [d["text"] for d in docs],
         "spans": [d["spans"] for d in docs]},
        index=tagged.index)


@F.pandas_udf(T.StringType())
def add_markup(text: pd.Series, spans: pd.Series) -> pd.Series:
    return pd.Series(
        [add_markup_py(t, s) for t, s in zip(text, spans)],
        index=text.index)


def with_muc7_markup(docs, text_col: str = "text",
                     mentions_col: str = "doc.mentions",
                     out_col: str = "muc7") -> "F.DataFrame":
    """Narrow projection over the fused docs table: re-emit each page
    as MUC-7 inline-tagged plaintext (the reference's flagship output,
    NEMuc7TagPlaintext.pl)."""
    return docs.withColumn(out_col, add_markup(
        F.col(text_col), F.col(mentions_col)))
