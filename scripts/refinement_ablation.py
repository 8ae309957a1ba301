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


def ablation_rows(spark, prefixes=None):
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
    for label, chain in (prefixes or PREFIXES):
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


# --------------------------------------------------------------------
# Noise-model ablation: the refinement letters repair CLASSIFIER
# pathologies (CRF boundary slop, corruption artifacts, low-confidence
# spam, type flips, coverage gaps, glued paragraphs — the error classes
# NERefinements.pm was written against).  A gazetteer decision list
# produces almost none of them, so the gold-corpus table above shows
# R doing the work and the other letters idle.  This second experiment
# PLANTS each pathology deterministically in synthetic classifier
# output — one instance per class per document — so each letter's
# repair is a measurable P/R step, and the full chain provably returns
# to P = R = 100 (every planted error is exactly the one its letter
# was built to fix).

_FILLER = ("šodien valdība paziņoja ka jaunais projekts tiks uzsākts "
           "nākamajā gadā pēc ilgām sarunām ministrija apstiprināja "
           "plānu").split()
_PERS_POOL = [("Jānis", "Bērziņš"), ("Anna", "Liepa"), ("Māris", "Ozols"),
              ("Ilze", "Kalniņa"), ("Pēteris", "Vītols")]
_ORG_POOL = [("Aldaris", "AS"), ("Citadele", "banka"),
             ("Latvenergo", "AS"), ("airBaltic", "SIA"),
             ("Grindeks", "AS")]
_LOC_POOL = ["Rīga", "Liepāja", "Ventspils", "Daugavpils", "Jelgava"]


def _noise_doc(doc: int):
    """(token dicts, gold spans) for one synthetic noise-model doc.

    Eight sentences: one clean + one per pathology class, each gold
    span recorded at construction.  Seeded per doc index — fully
    deterministic, so the per-prefix metrics are exact fractions."""
    import random
    rng = random.Random(doc)
    url = f"noise://doc/{doc}"
    toks: list[dict] = []
    gold: list[tuple] = []
    st = {"tok": 0, "sent": 0, "line": 0, "col": 0}

    def emit(word, tag="O", prob=0.0):
        t = {"tok_id": st["tok"], "sent_id": st["sent"], "token": word,
             "pos": "n", "lemma": word.lower(), "morpho": "",
             "line_from": st["line"], "col_from": st["col"],
             "line_to": st["line"],
             "col_to": st["col"] + len(word) - 1,
             "ne_tag": tag, "ne_prob": prob}
        toks.append(t)
        st["tok"] += 1
        st["col"] += len(word) + 1
        return t

    def end_sentence():
        emit(".")
        st["sent"] += 1
        st["line"] += 1
        st["col"] = 0

    def fill(k):
        for w in rng.sample(_FILLER, k):
            emit(w)

    def entity(words, typ, prob=0.95, tag_type=None, tagged=True,
               is_gold=True, all_inner=False):
        tt = tag_type or typ
        first = last = None
        for i, w in enumerate(words):
            tag = "O"
            if tagged:
                tag = f"I-{tt}" if (i or all_inner) else f"B-{tt}"
            t = emit(w, tag, prob if tagged else 0.0)
            first = first or t
            last = t
        if is_gold:
            gold.append((url, first["line_from"], first["col_from"],
                         last["line_to"], last["col_to"], typ))

    pers = rng.sample(_PERS_POOL, 3)   # clean / L-slop / T-gap
    orgs = rng.sample(_ORG_POOL, 3)    # C-flip / A-merge pair
    loc = rng.choice(_LOC_POOL)        # S-slop

    # clean control: correctly tagged PERS
    fill(2); entity(pers[0], "PERS"); fill(1); end_sentence()
    # L: CRF boundary slop over an unbalanced opening bracket
    fill(1); emit("(", "B-PERS", 0.95)
    entity(pers[1], "PERS", all_inner=True); fill(2); end_sentence()
    # N: corruption artifact falsely tagged ORG (>= 2 '/')
    fill(2); entity(["24/7/365"], "ORG", is_gold=False)
    fill(1); end_sentence()
    # S: span slopped over a trailing URL token (LOC: N must not fire)
    fill(1); entity([loc], "LOC")
    emit("http://ex.lv/a", "I-LOC", 0.95); fill(1); end_sentence()
    # R: low-confidence false span over plain filler
    fill(1); entity(rng.sample(_FILLER, 2), "LOC", prob=0.4,
                    is_gold=False)
    fill(1); end_sentence()
    # C: entity tagged 3x, one occurrence type-flipped to PERS
    entity(orgs[0], "ORG"); fill(1); entity(orgs[0], "ORG"); fill(1)
    entity(orgs[0], "ORG", tag_type="PERS"); end_sentence()
    # T: entity tagged 2x at high prob, third occurrence missed
    entity(pers[2], "PERS"); fill(1); entity(pers[2], "PERS"); fill(1)
    entity(pers[2], "PERS", tagged=False); end_sentence()
    # A: paragraph glue — span falsely continues across a 2-blank-line
    # gap onto the next paragraph's leading entity (no tokens between)
    fill(2); entity(orgs[1], "ORG")
    st["sent"] += 1
    st["line"] += 3   # two blank lines survive RemoveEmptyLines
    st["col"] = 0
    entity(orgs[2], "ORG", all_inner=True)  # I-ORG continuation
    fill(2); end_sentence()
    return toks, gold


def noise_ablation_rows(spark, n_docs: int = 200, prefixes=None):
    """One dict per chain prefix on the planted-pathology corpus."""
    from pyspark.sql import functions as F, types as T

    from tildener_spark.config import EngineConfig
    from tildener_spark.operators.evaluate import span_eval
    from tildener_spark.operators.refine import with_refinements
    from tildener_spark.operators.spans import assemble_spans
    from tildener_spark.operators.tokenize import (
        TAGGED_TYPE, explode_tokens)

    docs, gold_rows = [], []
    for d in range(n_docs):
        toks, gold = _noise_doc(d)
        docs.append((f"noise://doc/{d}", toks))
        gold_rows.extend(gold)
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("tokens", TAGGED_TYPE)])
    tok_df = spark.createDataFrame(docs, schema).cache()
    gold_df = spark.createDataFrame(
        gold_rows, ("url string, line_from int, col_from int, "
                    "line_to int, col_to int, ne_type string")).cache()
    out = []
    for label, chain in (prefixes or PREFIXES):
        cfg = EngineConfig(refinements=chain)
        pred = assemble_spans(
            explode_tokens(with_refinements(tok_df, cfg))).select(
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


def _table(rows) -> list[str]:
    lines = ["| chain | precision | recall | f1 | delta_f1 "
             "| pred spans |", "|---|---|---|---|---|---|"]
    prev = None
    for r in rows:
        d = "" if prev is None else f"{(r['f1'] or 0) - (prev or 0):+.2f}"
        lines.append(
            f"| {r['chain']} | {r['precision']} | {r['recall']} "
            f"| {r['f1']} | {d} | {r['retrieved']} |")
        prev = r["f1"] or 0
        print(r, flush=True)
    return lines


def main() -> None:
    from tildener_spark import get_spark
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "# Per-letter refinement ablation",
        "",
        "## 1. Reference gold corpus (51 docs)",
        "",
        "Tagger: gazetteer decision list harvested from the ODD gold",
        "docs' spans; evaluated on ALL docs with exact-span",
        "NEEvaluation_v2.pl semantics (span_eval TOTAL_NE row).",
        "Each row adds ONE letter of the default refinement chain;",
        "delta_f1 is against the previous row.",
        "",
    ]
    lines += _table(ablation_rows(spark))
    lines += [
        "",
        "Reading: on gazetteer-decision-list output only R_0.7 fires",
        "at scale (+11.25 F1 — cutting sub-threshold spans trades 1.9",
        "recall for 27.8 precision) and L trims one bracket span; the",
        "other letters are no-ops because their trigger pathologies",
        "(CRF corruption artifacts '://'+'//', type flips, lemma",
        "coverage gaps, glued paragraphs) do not occur in clean",
        "dictionary-match output.  Their semantics are covered by the",
        "per-letter differential tests (tests/test_refine.py); their",
        "corpus-level effect is measured in experiment 2.",
        "",
        "## 2. Planted-pathology noise model (200 synthetic docs)",
        "",
        "Each doc plants exactly one instance per pathology class the",
        "letters were built against (scripts/refinement_ablation.py::",
        "_noise_doc): bracket boundary slop (L), '/'-corrupt false ORG",
        "(N), URL edge slop (S), low-confidence false span (R), type",
        "flip on 1 of 3 occurrences (C), missed 3rd occurrence of a",
        "high-prob entity (T), span glued across a 2-blank-line",
        "paragraph break (A).  Deterministic, so each letter's step is",
        "an exact fraction; the full chain provably restores",
        "P = R = 100.",
        "",
    ]
    lines += _table(noise_ablation_rows(spark))
    lines += [
        "",
        "Every letter contributes one visible step of exactly the",
        "planted error mass: L +9.1 F1 (span repair: P and R move",
        "together), N +2.6 (precision only: a false span is dropped),",
        "S +9.5, R +3.3 (precision only), C +10.0 (a type flip is",
        "both a FP and a FN, so both move), T +5.7 (recall only),",
        "A +14.3 (the merged span is 1 FP + 2 FN).  Pinned by",
        "tests/test_refinement_ablation.py.",
    ]
    out = os.path.join(REPO, "BENCH", "REFINEMENT_ABLATION.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
