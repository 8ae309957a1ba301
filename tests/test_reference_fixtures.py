"""Differential tests against the reference's OWN golden corpora.

Round 1 validated parity only on the synthetic corpus; these tests
read /root/reference/TEST/ directly (read-only):

  * gold_muc7_plaintext_in/ — 66 MUC-7 inline-tagged plaintexts
    (the input format of PreprocessMuc7DataDirectory.pl);
  * gold_tab_sep_in/ — 51 token-level gold docs: 9-column TSV
    (word, POS, lemma, morpho, lineFrom, colFrom, lineTo, colTo,
    BIO answer — the property-file `map`,
    Sample_Data/LV_Training_prop_template.prop:56), blank lines as
    sentence separators (LoadTabSepFile skips them,
    NERefinements.pm:161-183).

What they assert:
  1. detag -> add_markup round trip reproduces every inline file
     byte-for-byte (NEPreprocess.pm:81-161 + :422-506);
  2. the detagged standoff spans match the gold token files' BIO
     spans exactly, modulo the reference's own boundary-mismatch
     drops (AddNewTags discards spans whose start/end do not align
     with token boundaries, NEPreprocess.pm:335-343) — so
     gold ⊆ detag always, equality on the 49/51 files with no
     tokenization-boundary conflicts;
  3. add_new_tags over (gold tokens, detagged spans) reproduces the
     gold BIO column exactly — the boundary-drop semantics
     themselves;
  4. assemble_spans over the gold BIO columns matches an independent
     pure-Python reading of the runs;
  5. token_eval / span_eval on a gold-vs-gold pair returns 100/100.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from tildener_spark.functions.muc7 import add_markup_py, detag_muc7_py
from tildener_spark.operators.evaluate import span_eval, token_eval
from tildener_spark.operators.retag import add_new_tags
from tildener_spark.operators.spans import assemble_spans

GOLD_DIR = "/root/reference/TEST/gold_tab_sep_in"
MUC_DIR = "/root/reference/TEST/gold_muc7_plaintext_in"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLD_DIR), reason="reference TEST corpus absent")


def _muc_files():
    return sorted(glob.glob(MUC_DIR + "/*.txt"))


def _gold_files():
    return sorted(glob.glob(GOLD_DIR + "/*.gold"))


def _read(path: str) -> str:
    # BOM stripped on every read, as the reference does
    # (NEPreprocess.pm:38)
    return open(path, encoding="utf-8").read().lstrip("﻿")


def _parse_gold(path: str) -> list[list[str]]:
    """Gold 9-col rows, blank/format lines skipped, BOM/CR stripped
    (LoadTabSepFile, NERefinements.pm:161-183)."""
    toks = []
    for ln in open(path, encoding="utf-8"):
        ln = ln.lstrip("﻿").rstrip("\n").rstrip("\r")
        if ln.strip() == "" or "\t" not in ln:
            continue
        toks.append(ln.split("\t"))
    return toks


def _gold_span_set(toks) -> set[tuple]:
    """Independent pure-Python reading of the gold BIO runs."""
    spans, i = set(), 0
    while i < len(toks):
        tag = toks[i][8] if len(toks[i]) > 8 else "O"
        if tag.startswith("B-"):
            t = tag[2:]
            j = i
            while (j + 1 < len(toks) and len(toks[j + 1]) > 8
                   and toks[j + 1][8] == "I-" + t):
                j += 1
            spans.add((t, int(toks[i][4]), int(toks[i][5]),
                       int(toks[j][6]), int(toks[j][7])))
            i = j + 1
        else:
            i += 1
    return spans


def _pairs():
    out = []
    for g in _gold_files():
        base = os.path.basename(g)[:-5]
        m = os.path.join(MUC_DIR, base + ".txt")
        if os.path.exists(m):
            out.append((base, g, m))
    return out


def _gold_tokens_df(spark, files):
    rows = []
    for path in files:
        url = os.path.basename(path)[:-5]
        for tok_id, c in enumerate(_parse_gold(path)):
            rows.append((
                url, tok_id, 0, c[0], c[1], c[2], c[3],
                int(c[4]), int(c[5]), int(c[6]), int(c[7]),
                c[8] if len(c) > 8 else "O", 1.0))
    return spark.createDataFrame(rows, (
        "url string, tok_id int, sent_id int, token string, pos string,"
        "lemma string, morpho string, line_from int, col_from int,"
        "line_to int, col_to int, ne_tag string, ne_prob double"))


# ------------------------------------------------------------- 1. round trip

def test_muc7_roundtrip_byte_exact():
    files = _muc_files()
    assert len(files) == 66
    for f in files:
        text = _read(f)
        d = detag_muc7_py(text)
        assert add_markup_py(d["text"], d["spans"]) == text, f


# ----------------------------------------------- 2. detag vs gold offsets

def test_detag_offsets_match_gold_tokens():
    pairs = _pairs()
    assert len(pairs) == 51
    exact = 0
    for base, g, m in pairs:
        det = {(s["ne_type"], s["line_from"], s["col_from"],
                s["line_to"], s["col_to"])
               for s in detag_muc7_py(_read(m))["spans"]}
        gld = _gold_span_set(_parse_gold(g))
        # every gold span is found at the exact character offsets
        assert gld <= det, base
        if det == gld:
            exact += 1
    # the only differences are the reference's own boundary-mismatch
    # drops ("ES"-"Kanādas" etc.) — 49 of 51 files align exactly
    assert exact >= 49


# ------------------------------------- 3. AddNewTags boundary semantics

def test_add_new_tags_reproduces_gold_bio(spark):
    pairs = _pairs()[:12]  # spark-side check on a dozen docs
    toks = _gold_tokens_df(spark, [g for _b, g, _m in pairs])
    span_rows = []
    for base, _g, m in pairs:
        for s in detag_muc7_py(_read(m))["spans"]:
            span_rows.append((base, s["ne_type"], s["line_from"],
                              s["col_from"], s["line_to"], s["col_to"]))
    standoff = spark.createDataFrame(span_rows, (
        "url string, ne_type string, line_from int, col_from int,"
        "line_to int, col_to int"))
    got = add_new_tags(toks.drop("ne_tag", "ne_prob"), standoff)
    mismatch = (
        got.select("url", "tok_id", F.col("ne_tag").alias("got"))
        .join(toks.select("url", "tok_id", F.col("ne_tag").alias("want")),
              ["url", "tok_id"])
        .filter(F.col("got") != F.col("want"))
    )
    assert mismatch.count() == 0, mismatch.limit(5).collect()


# --------------------------------------------- 4. span assembly on gold

def test_assemble_spans_matches_gold_runs(spark):
    files = _gold_files()
    toks = _gold_tokens_df(spark, files)
    got = {
        (r["url"], r["ne_type"], r["line_from"], r["col_from"],
         r["line_to"], r["col_to"])
        for r in assemble_spans(toks).collect()
    }
    want = set()
    for path in files:
        url = os.path.basename(path)[:-5]
        for t, lf, cf, lt, ct in _gold_span_set(_parse_gold(path)):
            want.add((url, t, lf, cf, lt, ct))
    assert got == want


# --------------------------------------------- 5. evaluator sanity: 100s

def test_eval_gold_vs_gold_is_perfect(spark):
    files = _gold_files()
    toks = _gold_tokens_df(spark, files).cache()
    tok_metrics = token_eval(toks, toks).collect()
    assert len(tok_metrics) > 1
    for r in tok_metrics:
        assert r["precision"] == 100.0 and r["recall"] == 100.0, r
        assert r["accuracy"] == 100.0
    spans = assemble_spans(toks)
    for r in span_eval(spans, spans).collect():
        assert r["precision"] == 100.0 and r["recall"] == 100.0, r
    toks.unpersist()
