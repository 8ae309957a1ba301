"""FindTokenPos semantics (NEPreprocess.pm:356-413) + sentence rules
(BootstrapTools.pm:199,293)."""

from tildener_spark.operators.tokenize import tokenize_text_py


def toks(text):
    return tokenize_text_py(text)


def test_offsets_inclusive_and_cursor_advance():
    t = toks("aa aa bb")
    # repeated token must advance the cursor (first-match semantics)
    assert [(x["col_from"], x["col_to"]) for x in t] == [(0, 1), (3, 4), (6, 7)]
    for x in t:
        assert x["col_to"] == x["col_from"] + len(x["token"]) - 1


def test_line_numbering_skips_blanks_but_keeps_original_numbers():
    t = toks("a\n\nb")
    assert t[0]["line_from"] == 0
    assert t[1]["line_from"] == 2  # original line number preserved


def test_sentence_ends_at_sent_pos_and_line_change():
    t = toks("A b . C d\nE f")
    sids = {x["token"]: x["sent_id"] for x in t}
    assert sids["A"] == sids["b"] == sids["."] == 0
    assert sids["C"] == sids["d"] == 1
    assert sids["E"] == sids["f"] == 2


def test_edge_punct_split_and_urls_whole():
    t = toks('"Rīga" (test) http://x.lv/a.')
    words = [x["token"] for x in t]
    assert words == ['"', "Rīga", '"', "(", "test", ")", "http://x.lv/a."]


def test_initials_keep_dot():
    words = [x["token"] for x in toks("J. Bērziņš brauc .")]
    assert words[0] == "J."


def test_unicode_char_offsets():
    # offsets are characters, not bytes (NEPreprocess.pm:392-399)
    t = toks("Jānis Bērziņš")
    assert (t[0]["col_from"], t[0]["col_to"]) == (0, 4)
    assert (t[1]["col_from"], t[1]["col_to"]) == (6, 12)


def test_pos_and_lemma_rules():
    t = {x["token"]: x for x in toks("Jānis vadīja banku 12 .")}
    assert t["Jānis"]["pos"] == "NP" and t["Jānis"]["lemma"] == "jānis"
    assert t["vadīja"]["pos"] == "VB" and t["vadīja"]["lemma"] == "vadīt"
    assert t["banku"]["pos"] == "NN"
    assert t["12"]["pos"] == "CD"
    assert t["."]["pos"] == "SENT"


def test_morpho_shape():
    t = toks("Ab1-")
    assert t[0]["morpho"].startswith("Xxd")


def test_empty_and_blank():
    assert toks("") == []
    assert toks(None) == []
    assert toks("\n\n") == []


# -------------------------------------------- RemoveEmptyLines modes

def test_remove_empty_lines_modes():
    from tildener_spark.operators.tokenize import remove_empty_lines_py
    text = "a\n\nb\n\n\nc\n\nd"
    # mode 1: keep everything (NEPreprocess.pm option "1")
    assert remove_empty_lines_py(text, 1) == text
    # mode 2: only runs >= 2 consecutive empties survive
    assert remove_empty_lines_py(text, 2) == "a\nb\n\n\nc\nd"
    # any other mode: all empty lines dropped
    assert remove_empty_lines_py(text, 0) == "a\nb\nc\nd"


def test_remove_empty_lines_trailing_run_and_edge_cases():
    from tildener_spark.operators.tokenize import remove_empty_lines_py
    # trailing blank run follows the same rule (post-loop flush,
    # NEPreprocess.pm:63-70)
    assert remove_empty_lines_py("a\n\n\n", 2) == "a\n\n\n"
    assert remove_empty_lines_py("a\n\n", 2) == "a\n\n"  # run of 2
    assert remove_empty_lines_py("a\n", 2) == "a"        # single: dropped
    assert remove_empty_lines_py("a\n", 1) == "a\n"
    # whitespace-only lines are NOT empty ($line eq "" test)
    assert remove_empty_lines_py("a\n \nb", 0) == "a\n \nb"
    assert remove_empty_lines_py(None, 2) == ""
    # BOM stripped per line like every reference read
    assert remove_empty_lines_py("﻿a\nb", 0) == "a\nb"


def test_numpy_tokenizer_matches_reference_loop():
    """The batched numpy span path must be byte-identical to the
    original pure-Python advancing-cursor loop on every document —
    offsets, line numbers, sentence ids, analysis columns."""
    from tildener_spark.datagen import gen_doc
    from tildener_spark.operators.tokenize import (
        batch_token_spans, tokenize_table, tokenize_table_reference)

    texts = [gen_doc(i)["text"] for i in range(120)]
    texts += ["", None, "   ", "\n\n\n", "a", " a ", "a\nb", "a\n\nb",
              "  lead ws\nand  double  space ", "tab\tsep\ttokens",
              "«Quoted» (brackets) J. Dr. end.", "http://x.y/z?a=1 t",
              "vert\x0btab", "nbsp\xa0word", "multi. Sent! here? ok",
              "\nleading newline", "trailing\n", "\r\nwindows\r\n",
              "ALL. CAPS. A.B. x.", "...", "a..b", "ā Čē ž-ū"]
    spans = batch_token_spans(texts)
    cols = ("sent_id", "token", "pos", "lemma", "morpho",
            "line_from", "col_from", "line_to", "col_to")
    for t, sp in zip(texts, spans):
        a = tokenize_table(t, sp)
        b = tokenize_table_reference(t)
        for c in cols:
            assert getattr(a, c) == getattr(b, c), (c, repr(t)[:60])


def test_numpy_tokenizer_hypothesis_parity():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tildener_spark.operators.tokenize import (
        tokenize_table, tokenize_table_reference)

    @settings(max_examples=200, deadline=None)
    @given(st.text(
        alphabet=st.characters(
            codec="utf-8", categories=(
                "Lu", "Ll", "Nd", "Po", "Ps", "Pe", "Zs", "Cc")),
        max_size=300))
    def check(text):
        a, b = tokenize_table(text), tokenize_table_reference(text)
        assert a.token == b.token
        assert a.col_from == b.col_from
        assert a.col_to == b.col_to
        assert a.line_from == b.line_from
        assert a.sent_id == b.sent_id

    check()
