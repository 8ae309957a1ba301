"""Per-letter refinement ablation over the reference's 51 gold docs.

Runs the tagger over the MUC-7 plaintexts of the reference's own
token-level gold corpus (/root/reference/TEST/gold_tab_sep_in +
gold_muc7_plaintext_in) once per refinement-chain PREFIX
(∅, L, LN, LNS, LNSR, LNSRC, LNSRCT, full LNSRCTA — the default
``EngineConfig.refinements`` order), and evaluates exact-span
P/R/F1 (NEEvaluation_v2.pl semantics, operators/evaluate.span_eval)
against the gold spans.  The per-prefix deltas are the contribution
each refinement letter makes — the breadth evidence behind the
triple-parity P/R >= 0.95 gate (VERDICT r3 item 8).

The classifier's learned state is its gazetteer (classify.py decision
list).  To create genuine pre-refinement errors, the gazetteer is
harvested from the gold spans of the ODD-indexed documents only, so
on even documents the tagger must generalize — exactly the regime the
refinement letters (bracket trimming, corrupt-tag drops, low-prob
cuts, equal-lemma tagging, paragraph repair) exist for.

Writes BENCH/REFINEMENT_ABLATION.md; the full-chain row is pinned by
tests/test_refinement_ablation.py.
"""

from __future__ import annotations

import glob
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLD_DIR = "/root/reference/TEST/gold_tab_sep_in"
MUC_DIR = "/root/reference/TEST/gold_muc7_plaintext_in"

PREFIXES = [
    ("none", ""),
    ("L", "L"),
    ("LN", "L N"),
    ("LNS", "L N S"),
    ("LNSR", "L N S R_0.7"),
    ("LNSRC", "L N S R_0.7 C"),
    ("LNSRCT", "L N S R_0.7 C T_0.90"),
    ("full", "L N S R_0.7 C T_0.90 A"),
]


def _parse_gold(path: str) -> list[list[str]]:
    toks = []
    for ln in open(path, encoding="utf-8"):
        ln = ln.lstrip("﻿").rstrip("\n").rstrip("\r")
        if ln.strip() == "" or "\t" not in ln:
            continue
        toks.append(ln.split("\t"))
    return toks


def _gold_spans(path: str, url: str) -> list[tuple]:
    toks = _parse_gold(path)
    spans, i = [], 0
    while i < len(toks):
        tag = toks[i][8] if len(toks[i]) > 8 else "O"
        if tag.startswith("B-"):
            t = tag[2:]
            j = i
            while (j + 1 < len(toks) and len(toks[j + 1]) > 8
                   and toks[j + 1][8] == "I-" + t):
                j += 1
            spans.append((url, int(toks[i][4]), int(toks[i][5]),
                          int(toks[j][6]), int(toks[j][7]), t))
            i = j + 1
        else:
            i += 1
    return spans


def load_pairs():
    """(url, gold_path, plaintext) for every paired gold doc."""
    from tildener_spark.functions.muc7 import detag_muc7_py
    out = []
    for g in sorted(glob.glob(GOLD_DIR + "/*.gold")):
        base = os.path.basename(g)[:-5]
        m = os.path.join(MUC_DIR, base + ".txt")
        if not os.path.exists(m):
            continue
        raw = open(m, encoding="utf-8").read().lstrip("﻿")
        out.append((base, g, detag_muc7_py(raw)["text"]))
    return out


def ablation_rows(spark):
    """One dict per chain prefix: label, chain, P, R, F1, n_pred."""
    from pyspark.sql import functions as F

    from tildener_spark.config import EngineConfig
    from tildener_spark.operators.classify import make_tag_pages_udf
    from tildener_spark.operators.evaluate import span_eval
    from tildener_spark.operators.spans import assemble_spans
    from tildener_spark.operators.tokenize import explode_tokens

    pairs = load_pairs()
    gold_rows = [s for url, g, _t in pairs for s in _gold_spans(g, url)]
    gold_df = spark.createDataFrame(
        gold_rows, ("url string, line_from int, col_from int, "
                    "line_to int, col_to int, ne_type string")).cache()
    # gazetteer harvested from ODD docs' gold spans only: on even
    # docs the tagger generalizes (or fails to) — genuine errors
    texts = {url: t for url, _g, t in pairs}
    gaz_rows = sorted({
        (s[5], _surface(texts[s[0]], s))
        for i, (url, g, _t) in enumerate(pairs) if i % 2 == 1
        for s in _gold_spans(g, url)
    })
    pages = spark.createDataFrame(
        [(url, t) for url, _g, t in pairs], "url string, text string"
    ).cache()
    out = []
    for label, chain in PREFIXES:
        cfg = EngineConfig(refinements=chain)
        udf = make_tag_pages_udf(gaz_rows, cfg)
        toks = explode_tokens(
            pages.select("url", udf(F.col("text")).alias("tokens")))
        pred = assemble_spans(toks).select(
            "url", "line_from", "col_from", "line_to", "col_to",
            "ne_type")
        row = {r["label"]: r for r in
               span_eval(gold_df, pred).collect()}["TOTAL_NE"]
        out.append({
            "label": label, "chain": chain or "(no refinement)",
            "precision": row["precision"], "recall": row["recall"],
            "f1": row["f1"], "retrieved": row["retrieved"],
            "relevant": row["relevant"], "rr": row["rr"],
        })
    return out


def _surface(text: str, span: tuple) -> str:
    """Reconstruct a span's surface from (line/col) gold offsets."""
    _url, lf, cf, lt, ct, _t = span
    lines = text.split("\n")
    if lf == lt:
        return lines[lf][cf:ct + 1]
    parts = [lines[lf][cf:]]
    parts += lines[lf + 1:lt]
    parts.append(lines[lt][:ct + 1])
    return " ".join(p.strip() for p in parts)


def main() -> None:
    from tildener_spark import get_spark
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    rows = ablation_rows(spark)
    lines = [
        "# Per-letter refinement ablation (51 reference gold docs)",
        "",
        "Tagger: gazetteer decision list harvested from the ODD gold",
        "docs' spans; evaluated on ALL docs with exact-span",
        "NEEvaluation_v2.pl semantics (span_eval TOTAL_NE row).",
        "Each row adds ONE letter of the default refinement chain;",
        "delta_f1 is against the previous row.",
        "",
        "| chain | precision | recall | f1 | delta_f1 | pred spans |",
        "|---|---|---|---|---|---|",
    ]
    prev = None
    for r in rows:
        d = "" if prev is None else f"{(r['f1'] or 0) - (prev or 0):+.2f}"
        lines.append(
            f"| {r['chain']} | {r['precision']} | {r['recall']} "
            f"| {r['f1']} | {d} | {r['retrieved']} |")
        prev = r["f1"] or 0
        print(r, flush=True)
    out = os.path.join(REPO, "BENCH", "REFINEMENT_ABLATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
