"""Property-based tests (hypothesis) for the pure-Python hot paths.

Extends the reference's golden-corpus-only test strategy (SURVEY.md
§5) with generative coverage: the vectorized numpy implementations
must agree with their scalar reference forms on arbitrary inputs, and
the text transforms must satisfy their algebraic invariants.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from tildener_spark.operators.linking import (
    jaro_winkler_np, jaro_winkler_py)
from tildener_spark.operators.tokenize import (
    remove_empty_lines_py, tokenize_text_py)

# mixed-script text including Latvian diacritics, ASCII, punctuation
_CHARS = st.characters(
    whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
    whitelist_characters="āčēģīķļņšūžĀČĒĢĪĶĻŅŠŪŽ\n")
_TEXT = st.text(alphabet=_CHARS, max_size=200)
_WORD = st.text(alphabet=_CHARS.filter(lambda c: c != "\n"), max_size=24)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_WORD, _WORD), min_size=1, max_size=40))
def test_jaro_winkler_np_equals_scalar(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    out = jaro_winkler_np(a, b)
    for (x, y), v in zip(pairs, out):
        assert abs(jaro_winkler_py(x, y) - v) < 1e-12, (x, y)


@settings(max_examples=200, deadline=None)
@given(_TEXT, st.integers(min_value=0, max_value=3))
def test_remove_empty_lines_invariants(text, mode):
    out = remove_empty_lines_py(text, mode)
    # idempotent for every mode (a second application is a no-op)
    assert remove_empty_lines_py(out, mode) == out
    # mode 1 keeps all lines (modulo CR/BOM normalization)
    norm = "\n".join(ln.lstrip("﻿").rstrip("\r")
                     for ln in text.split("\n"))
    assert remove_empty_lines_py(text, 1) == norm
    # non-1/2 modes leave no empty line
    if mode not in (1, 2):
        assert all(ln != "" for ln in out.split("\n")) or out == ""
    # non-blank content is preserved in order for every mode
    content = [ln for ln in norm.split("\n") if ln != ""]
    assert [ln for ln in out.split("\n") if ln != ""] == content


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_tokenizer_offsets_are_exact(text):
    """FindTokenPos invariant (NEPreprocess.pm:391-399): every token's
    recorded (line, col_from..col_to) slice reproduces the token."""
    lines = text.split("\n")
    for t in tokenize_text_py(text):
        assert t["line_from"] == t["line_to"]
        line = lines[t["line_from"]]
        assert line[t["col_from"]: t["col_to"] + 1] == t["token"]


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_tokenizer_ids_monotone(text):
    toks = tokenize_text_py(text)
    assert [t["tok_id"] for t in toks] == list(range(len(toks)))
    sents = [t["sent_id"] for t in toks]
    assert all(b - a in (0, 1) for a, b in zip(sents, sents[1:]))
    # offsets advance within a line
    by_line: dict[int, list] = {}
    for t in toks:
        by_line.setdefault(t["line_from"], []).append(t)
    for ts in by_line.values():
        for a, b in zip(ts, ts[1:]):
            assert b["col_from"] > a["col_to"]
