"""Tokenization + POS + lemma + character offsets, document-local.

Re-expresses the reference's POS stage (Tag.pm:21-298) and
NEPreprocess::FindTokenPos (NEPreprocess.pm:356-413):

  * tokens are located in their source line with a first-match,
    advancing-cursor search — character (not byte) offsets, 0-based,
    ``col_to`` inclusive (writer format at NEPreprocess.pm:400-404);
  * blank lines carry paragraph structure and produce no tokens
    (RemoveEmptyLines, NEPreprocess.pm:23-72 — we keep original line
    numbers, so a line_from gap > 1 between consecutive tokens marks a
    paragraph break, which is what refinement A consumes,
    NEUtilities.pm:136-260);
  * sentence id increments after a SENT-tagged token or on a source
    line change (BootstrapTools.pm:199,293,507);
  * the 10-column token record becomes a struct kept NESTED per page
    row — one document never spans partitions, so every doc-local
    operator downstream is shuffle-free (SURVEY.md §4.3.1).

The tokenizer itself (the part TreeTagger did) is deterministic:
whitespace split, then leading/trailing punctuation split off as
separate tokens; tokens containing ``://`` (URLs) are kept whole —
they matter to refinement S (NERefinements.pm:951-1012).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

from tildener_spark.functions.lexicon import SENTENCE_END, VERB_LEMMAS

TOKEN_STRUCT = T.StructType([
    T.StructField("tok_id", T.IntegerType()),
    T.StructField("sent_id", T.IntegerType()),
    T.StructField("token", T.StringType()),
    T.StructField("pos", T.StringType()),
    T.StructField("lemma", T.StringType()),
    T.StructField("morpho", T.StringType()),
    T.StructField("line_from", T.IntegerType()),
    T.StructField("col_from", T.IntegerType()),
    T.StructField("line_to", T.IntegerType()),
    T.StructField("col_to", T.IntegerType()),
])
TOKENS_TYPE = T.ArrayType(TOKEN_STRUCT)

# tagged-token struct = token struct + BIO tag + probability
TAGGED_STRUCT = T.StructType(
    TOKEN_STRUCT.fields
    + [T.StructField("ne_tag", T.StringType()),
       T.StructField("ne_prob", T.DoubleType())]
)
TAGGED_TYPE = T.ArrayType(TAGGED_STRUCT)

_PUNCT_EDGE = "\"'«»„“”‚‘’()[]{}<>,;:.!?…"
_WS = re.compile(r"\s+")


def _split_token(raw: str) -> list[str]:
    """Split edge punctuation off a whitespace token; URLs stay whole."""
    if "://" in raw:
        return [raw]
    lead: list[str] = []
    trail: list[str] = []
    core = raw
    while core and core[0] in _PUNCT_EDGE:
        lead.append(core[0])
        core = core[1:]
    while core and core[-1] in _PUNCT_EDGE:
        # keep a terminal '.' attached to single-letter abbreviations
        # like initials ("J.") — TreeTagger behaviour for initials
        if core[-1] == "." and len(core) == 2 and core[0].isupper():
            break
        trail.append(core[-1])
        core = core[:-1]
    parts = lead + ([core] if core else []) + list(reversed(trail))
    return [p for p in parts if p]


def _shape(token: str) -> str:
    """Morpho stand-in: per-char class fingerprint (X/x/d/p), capped."""
    out = []
    for ch in token[:12]:
        if ch.isupper():
            out.append("X")
        elif ch.islower():
            out.append("x")
        elif ch.isdigit():
            out.append("d")
        else:
            out.append("p")
    return "".join(out)


def _pos_lemma(token: str) -> tuple[str, str]:
    if token in SENTENCE_END:
        return "SENT", token
    if all(not ch.isalnum() for ch in token):
        return "PUNCT", token
    if token.isdigit():
        return "CD", token
    low = token.lower()
    if low in VERB_LEMMAS:
        return "VB", VERB_LEMMAS[low]
    if token[0].isupper():
        return "NP", low
    return "NN", low


def remove_empty_lines_py(text: str | None, mode: int = 1) -> str:
    """RemoveEmptyLines (NEPreprocess.pm:23-72), text -> text.

    mode 1: keep all empty lines; mode 2: keep only empty lines in
    runs of >= 2 consecutive empties; any other mode: drop all empty
    lines.  "Empty" means exactly '' after CR strip — whitespace-only
    lines are NOT empty, matching the reference's ``$line eq ""``
    test (NEPreprocess.pm:44).  Trailing blank runs follow the same
    rule (the reference's post-loop flush, NEPreprocess.pm:63-70)."""
    if text is None:
        return ""
    out: list[str] = []
    empty_run = 0
    for line in text.split("\n"):
        line = line.lstrip("﻿").rstrip("\r")
        if line == "":
            empty_run += 1
            continue
        if mode == 1 or (mode == 2 and empty_run > 1):
            out.extend([""] * empty_run)
        empty_run = 0
        out.append(line)
    if mode == 1 or (mode == 2 and empty_run > 1):
        out.extend([""] * empty_run)
    return "\n".join(out)


def make_remove_empty_lines_udf(mode: int = 1):
    """Vectorized text-level form of RemoveEmptyLines."""
    @F.pandas_udf(T.StringType())
    def remove_empty_lines(text: pd.Series) -> pd.Series:
        return text.map(lambda t: remove_empty_lines_py(t, mode))
    return remove_empty_lines


class TokenTable:
    """Columnar per-document token store (parallel lists, tok_id = row
    index).  The fused hot path (operators/document.py) runs on this
    representation to avoid a Python dict per token — web text is
    Zipfian, so the per-token analysis is also memoized by raw
    whitespace token (``_analyze_raw``).  The dict-based functions
    below remain the public API for the modular/oracle path and are
    thin converters over the same cores, so semantics live in ONE
    place (VERDICT r02 next-round item 4)."""

    __slots__ = ("sent_id", "token", "pos", "lemma", "morpho",
                 "line_from", "col_from", "line_to", "col_to",
                 "ne_tag", "ne_prob")

    def __init__(self):
        self.sent_id: list[int] = []
        self.token: list[str] = []
        self.pos: list[str] = []
        self.lemma: list[str] = []
        self.morpho: list[str] = []
        self.line_from: list[int] = []
        self.col_from: list[int] = []
        self.line_to: list[int] = []
        self.col_to: list[int] = []
        self.ne_tag: list[str] = []
        self.ne_prob: list[float] = []

    def __len__(self) -> int:
        return len(self.token)

    def token_tuples(self) -> list[tuple]:
        """Rows as tuples in TAGGED_STRUCT field order (Arrow accepts
        tuples for struct elements — no dict per token)."""
        return list(zip(
            range(len(self.token)), self.sent_id, self.token, self.pos,
            self.lemma, self.morpho, self.line_from, self.col_from,
            self.line_to, self.col_to, self.ne_tag, self.ne_prob,
        ))

    def token_dicts(self, tagged: bool = True) -> list[dict]:
        cols = [range(len(self.token)), self.sent_id, self.token,
                self.pos, self.lemma, self.morpho, self.line_from,
                self.col_from, self.line_to, self.col_to]
        names = ["tok_id", "sent_id", "token", "pos", "lemma", "morpho",
                 "line_from", "col_from", "line_to", "col_to"]
        if tagged:
            cols += [self.ne_tag, self.ne_prob]
            names += ["ne_tag", "ne_prob"]
        return [dict(zip(names, row)) for row in zip(*cols)]


# memoized per-raw-token analysis: raw whitespace token ->
# ((tok, pos, lemma, morpho, rel_start), ...) where rel_start is the
# sub-token's character offset INSIDE the raw token — _split_token
# partitions the raw exactly (lead + core + reversed trail == raw), so
# sub-token offsets are arithmetic, not searched.  Everything cached
# depends only on the raw string; web text is Zipfian, so the hit rate
# dominates.  Bounded: cleared wholesale past ~260k distinct raws per
# worker.
_RAW_CACHE: dict[str, tuple] = {}
_RAW_CACHE_MAX = 1 << 18


def _analyze_raw(raw: str) -> tuple:
    hit = _RAW_CACHE.get(raw)
    if hit is None:
        if len(_RAW_CACHE) >= _RAW_CACHE_MAX:
            _RAW_CACHE.clear()
        out = []
        off = 0
        for tok in _split_token(raw):
            out.append((tok, *_pos_lemma(tok), _shape(tok), off))
            off += len(tok)
        hit = tuple(out)
        _RAW_CACHE[raw] = hit
    return hit


# whitespace lookup table over codepoints, grown on demand to the
# largest codepoint seen; mirrors Python's str semantics (str.isspace
# == the \s class of the re module for str patterns on every
# codepoint the corpus can contain), so the numpy path below tokenizes
# byte-identically to the _WS.split reference path
import numpy as _np

_SPACE_LUT = _np.array([chr(c).isspace() for c in range(128)],
                       dtype=bool)


def _space_lut(upto: int) -> "_np.ndarray":
    global _SPACE_LUT
    if upto >= _SPACE_LUT.size:
        _SPACE_LUT = _np.array(
            [chr(c).isspace() for c in range(upto + 1)], dtype=bool)
    return _SPACE_LUT


def batch_token_spans(texts: list) -> list:
    """Vectorized raw-token location for a BATCH of documents (the
    _codepoint_matrix idea from linking.py applied to the tokenizer).

    One UTF-32 decode of the newline-joined batch gives whitespace
    runs (= raw tokens), newline positions (= line numbers) and
    line-relative columns entirely in C; per-document numpy overhead
    (encode, mask allocation, searchsorted) amortizes across the
    Arrow batch, which is what makes this faster than both the
    per-document numpy form (measured slower on ~1 KB docs — fixed
    overhead dominates) and the pure-Python per-line scan.

    Returns, per document, ``(starts, ends, lines, cols)`` lists with
    starts/ends character offsets into that document, ends inclusive.
    None/empty texts yield empty lists.  The \\n separator is
    whitespace, so no token run and no line can span documents.
    """
    doc_texts = [t if t else "" for t in texts]
    joined = "\n".join(doc_texts)
    out: list = []
    if not joined:
        return [([], [], [], []) for _ in doc_texts]
    arr = _np.frombuffer(joined.encode("utf-32-le"), dtype=_np.uint32)
    space = _space_lut(int(arr.max()))[arr]
    nonsp = ~space
    prev = _np.empty_like(nonsp)
    prev[0] = False
    prev[1:] = nonsp[:-1]
    starts = _np.flatnonzero(nonsp & ~prev)
    nxt = _np.empty_like(nonsp)
    nxt[-1] = False
    nxt[:-1] = nonsp[1:]
    ends = _np.flatnonzero(nonsp & ~nxt)
    nl = _np.flatnonzero(arr == 10)
    line_no = _np.searchsorted(nl, starts)
    if nl.size:
        line_begin = _np.where(
            line_no > 0, nl[_np.maximum(line_no - 1, 0)] + 1, 0)
    else:
        line_begin = _np.zeros_like(starts)
    cols_g = starts - line_begin
    # document boundaries in the joined string -> slice per doc
    doc_off = []
    off = 0
    for t in doc_texts:
        doc_off.append(off)
        off += len(t) + 1  # the joining \n
    doc_off_a = _np.asarray(doc_off, dtype=_np.int64)
    first_tok = _np.searchsorted(starts, doc_off_a)
    first_line = _np.searchsorted(nl, doc_off_a)
    for d in range(len(doc_texts)):
        i0 = first_tok[d]
        i1 = first_tok[d + 1] if d + 1 < len(doc_texts) else starts.size
        if i0 == i1:
            out.append(([], [], [], []))
            continue
        base = doc_off_a[d]
        out.append((
            (starts[i0:i1] - base).tolist(),
            (ends[i0:i1] - base).tolist(),
            (line_no[i0:i1] - first_line[d]).tolist(),
            cols_g[i0:i1].tolist(),
        ))
    return out


def _single_doc_spans(text: str):
    return batch_token_spans([text])[0]


def tokenize_table(text: str | None, spans=None) -> TokenTable:
    """Single-document tokenizer (FindTokenPos semantics), columnar
    output.

    ``spans`` is the document's entry from :func:`batch_token_spans`
    (computed here when absent): raw-token offsets/lines/columns come
    from the vectorized batch pass, so the Python loop runs once per
    RAW token with memoized analysis (``_analyze_raw``) and
    arithmetic sub-token offsets — no per-character Python work and
    no per-token ``str.find``.  ``tokenize_table_reference`` keeps
    the original pure-Python loop; a differential test pins
    byte-identical output."""
    tt = TokenTable()
    if not text:
        return tt
    starts_l, ends_l, lines, cols = (
        spans if spans is not None else _single_doc_spans(text))
    if not starts_l:
        return tt

    sent_ids = tt.sent_id.append
    toks_out = tt.token.append
    pos_out = tt.pos.append
    lemma_out = tt.lemma.append
    morpho_out = tt.morpho.append
    lf_out = tt.line_from.append
    cf_out = tt.col_from.append
    lt_out = tt.line_to.append
    ct_out = tt.col_to.append
    analyze = _analyze_raw
    sent_id = 0
    sent_open = False  # tokens emitted in current sentence?
    cur_line = lines[0]
    for i in range(len(starts_l)):
        ln = lines[i]
        if ln != cur_line:
            # line change closes a sentence (BootstrapTools.pm:199)
            if sent_open:
                sent_id += 1
                sent_open = False
            cur_line = ln
        raw = text[starts_l[i]:ends_l[i] + 1]
        base = cols[i]
        for tok, pos, lemma, morpho, rel in analyze(raw):
            start = base + rel
            sent_ids(sent_id)
            toks_out(tok)
            pos_out(pos)
            lemma_out(lemma)
            morpho_out(morpho)
            lf_out(ln)
            cf_out(start)
            lt_out(ln)
            ct_out(start + len(tok) - 1)
            sent_open = True
            if pos == "SENT":
                sent_id += 1
                sent_open = False
    return tt


def tokenize_table_reference(text: str | None) -> TokenTable:
    """Original pure-Python per-line loop (first-match advancing
    cursor, NEPreprocess.pm:391-399) — kept as the differential
    reference for the numpy fast path above."""
    tt = TokenTable()
    if not text:
        return tt
    sent_ids = tt.sent_id.append
    toks_out = tt.token.append
    pos_out = tt.pos.append
    lemma_out = tt.lemma.append
    morpho_out = tt.morpho.append
    lf_out = tt.line_from.append
    cf_out = tt.col_from.append
    lt_out = tt.line_to.append
    ct_out = tt.col_to.append
    ws_split = _WS.split
    sent_id = 0
    sent_open = False  # tokens emitted in current sentence?
    prev_line = None
    for line_no, line in enumerate(text.split("\n")):
        if line.strip() == "":
            continue
        if prev_line is not None and sent_open:
            # line change closes a sentence (BootstrapTools.pm:199)
            sent_id += 1
            sent_open = False
        prev_line = line_no
        cursor = 0
        find = line.find
        for raw in ws_split(line):
            if not raw:
                continue
            for tok, pos, lemma, morpho, _rel in _analyze_raw(raw):
                # first-match cursor advance (NEPreprocess.pm:391-399)
                start = find(tok, cursor)
                if start < 0:  # defensive; cannot happen for our splitter
                    start = cursor
                end = start + len(tok) - 1
                cursor = end + 1
                sent_ids(sent_id)
                toks_out(tok)
                pos_out(pos)
                lemma_out(lemma)
                morpho_out(morpho)
                lf_out(line_no)
                cf_out(start)
                lt_out(line_no)
                ct_out(end)
                sent_open = True
                if pos == "SENT":
                    sent_id += 1
                    sent_open = False
    return tt


def tokenize_text_py(text: str | None) -> list[dict]:
    """Pure-Python single-document tokenizer (FindTokenPos semantics),
    dict rows — the modular/oracle-path form of :func:`tokenize_table`."""
    return tokenize_table(text).token_dicts(tagged=False)


@F.pandas_udf(TOKENS_TYPE)
def tokenize_pos(text: pd.Series) -> pd.Series:
    """Vectorized: text column -> nested array<struct> token column."""
    return text.map(tokenize_text_py)


def with_tokens(df, text_col: str = "text", out_col: str = "tokens"):
    return df.withColumn(out_col, tokenize_pos(F.col(text_col)))


def explode_tokens(df, tokens_col: str = "tokens", keys: tuple = ("url",)) -> "Column":
    """Nested tokens -> flat tokens DataFrame (url, token columns...)."""
    return (
        df.select(*keys, F.explode(tokens_col).alias("t"))
        .select(*keys, "t.*")
    )
