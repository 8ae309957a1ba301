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
# ((tok, pos, lemma, morpho), ...).  Offsets are NOT cached (they
# depend on the line); everything else depends only on the raw string.
# Bounded: cleared wholesale past ~260k distinct raws per worker.
_RAW_CACHE: dict[str, tuple] = {}
_RAW_CACHE_MAX = 1 << 18


def _analyze_raw(raw: str) -> tuple:
    hit = _RAW_CACHE.get(raw)
    if hit is None:
        if len(_RAW_CACHE) >= _RAW_CACHE_MAX:
            _RAW_CACHE.clear()
        hit = tuple(
            (tok, *_pos_lemma(tok), _shape(tok))
            for tok in _split_token(raw)
        )
        _RAW_CACHE[raw] = hit
    return hit


def tokenize_table(text: str | None) -> TokenTable:
    """Pure-Python single-document tokenizer (FindTokenPos semantics),
    columnar output."""
    tt = TokenTable()
    if not text:
        return tt
    # bound-method appends: the loop body runs once per token of the
    # corpus, and attribute lookups per append are measurable there
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
            for tok, pos, lemma, morpho in _analyze_raw(raw):
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
