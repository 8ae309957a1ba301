"""Byte-identity contract for extract_text (BASELINE.md, input_hint)."""

import glob
import os

from tildener_spark.functions.text import extract_text_py

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                           "extract_text")


def test_byte_identity_against_committed_fixtures():
    htmls = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.html")))
    assert htmls, "fixtures missing"
    for html_path in htmls:
        txt_path = html_path[:-5] + ".txt"
        with open(html_path, "rb") as f:
            html = f.read()
        with open(txt_path, "rb") as f:
            expected = f.read()
        got = extract_text_py(html).encode("utf-8")
        assert got == expected, f"byte mismatch for {html_path}"


def test_deterministic():
    html = b"<html><body><p>abc &amp; def</p></body></html>"
    assert extract_text_py(html) == extract_text_py(html)


def test_bom_stripped_and_crlf_normalized():
    assert extract_text_py("﻿a\r\nb".encode()) == "a\nb"


def test_script_style_comment_dropped():
    html = b"<body><script>x</script><style>y</style><!--z--><p>keep</p></body>"
    assert extract_text_py(html) == "keep"


def test_blank_collapse_and_trim():
    html = b"<body><p>a</p><p></p><p></p><p>b</p></body>"
    assert extract_text_py(html) == "a\n\nb"


def test_none_and_empty():
    assert extract_text_py(None) == ""
    assert extract_text_py(b"") == ""
