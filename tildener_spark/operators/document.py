"""Fused per-document processing: ONE Arrow pass per page emitting
tagged tokens + assembled mentions + sentence-window triples +
within-document alias links.

Why this exists (the 100 TB argument): every stage between raw text
and the cross-document graph is *document-local* — span assembly
(NERefinements.pm:219-286), triple extraction (sentence windows), and
alias linking (same-url blocking only).  Expressing them as DataFrame
window/join/groupBy ops (operators/spans.py, triples.py, linking.py —
kept as the DuckDB-oracle parity path) shuffles the full token table
three times; at 10^12 documents those shuffles dominate the job.  The
fused pass computes all four outputs while the document is already in
Python-worker memory, so the pipeline's only shuffles are over the
small cross-document tables (hub edges, components, canonical-triple
aggregation).

Semantics are the *same by construction* as the DataFrame operators;
tests/test_document.py asserts row-level equality of both paths on the
synthetic corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from tildener_spark.config import EngineConfig
from tildener_spark.operators.classify import (
    build_gazetteer_index, classify_doc_py,
)
from tildener_spark.operators.linking import jaro_winkler_py
from tildener_spark.operators.refine import refine_doc_py
from tildener_spark.operators.tokenize import (
    TAGGED_TYPE, tokenize_text_py,
)

# Field types match the DataFrame operators' output exactly (span_id
# and n_tokens are longs because window-sum / count() return longs).
MENTION_STRUCT = T.StructType([
    T.StructField("span_id", T.LongType()),
    T.StructField("sent_id", T.IntegerType()),
    T.StructField("begin_tok", T.IntegerType()),
    T.StructField("end_tok", T.IntegerType()),
    T.StructField("line_from", T.IntegerType()),
    T.StructField("col_from", T.IntegerType()),
    T.StructField("line_to", T.IntegerType()),
    T.StructField("col_to", T.IntegerType()),
    T.StructField("surface", T.StringType()),
    T.StructField("lemmas", T.StringType()),
    T.StructField("ne_type", T.StringType()),
    T.StructField("avg_prob", T.DoubleType()),
    T.StructField("n_tokens", T.LongType()),
])

TRIPLE_STRUCT = T.StructType([
    T.StructField("sent_id", T.IntegerType()),
    T.StructField("subj", T.StringType()),
    T.StructField("subj_type", T.StringType()),
    T.StructField("pred", T.StringType()),
    T.StructField("obj", T.StringType()),
    T.StructField("obj_type", T.StringType()),
    T.StructField("prob", T.DoubleType()),
    T.StructField("kind", T.StringType()),
    # within-doc canonical of subj/obj (alias-resolved doc-locally);
    # the global canonicalization is then a broadcast join against the
    # tiny alias-chain correction table instead of a mention-table
    # shuffle (operators/graph.canonicalize_triples_fused)
    T.StructField("subj_dc", T.StringType()),
    T.StructField("obj_dc", T.StringType()),
])

LINK_STRUCT = T.StructType([
    T.StructField("ne_type", T.StringType()),
    T.StructField("alias", T.StringType()),
    T.StructField("canonical", T.StringType()),
    T.StructField("score", T.DoubleType()),
])

# distinct surfaces of the document with their within-doc canonical
# form — precomputes the graph stage's ``resolved`` join doc-locally
SURFACE_STRUCT = T.StructType([
    T.StructField("ne_type", T.StringType()),
    T.StructField("surface", T.StringType()),
    T.StructField("doc_canonical", T.StringType()),
])

# hub-hub edges induced by alias chains (alias -> canonical where the
# canonical is itself an alias) — the ONLY input the global
# connected-components stage needs
HUB_PAIR_STRUCT = T.StructType([
    T.StructField("src", T.StringType()),
    T.StructField("dst", T.StringType()),
])

DOC_STRUCT = T.StructType([
    T.StructField("tokens", TAGGED_TYPE),
    T.StructField("mentions", T.ArrayType(MENTION_STRUCT)),
    T.StructField("triples", T.ArrayType(TRIPLE_STRUCT)),
    T.StructField("links", T.ArrayType(LINK_STRUCT)),
    T.StructField("surfaces", T.ArrayType(SURFACE_STRUCT)),
    T.StructField("hub_pairs", T.ArrayType(HUB_PAIR_STRUCT)),
])

HUB_SEP = "␟"  # must match operators/graph.SEP


# ------------------------------------------------------------ mentions

def doc_mentions_py(tokens: list[dict]) -> list[dict]:
    """BIO span assembly, identical to operators/spans.assemble_spans.

    span_id = 1-based running count of B- tokens; a span is the B-
    token plus the maximal following run of I-<same type> tokens
    (GetFullNETagsFromTokens, NERefinements.pm:219-286)."""
    out: list[dict] = []
    n = len(tokens)
    span_id = 0
    i = 0
    while i < n:
        tag = tokens[i]["ne_tag"]
        if not tag.startswith("B-"):
            i += 1
            continue
        span_id += 1
        t = tag[2:]
        j = i
        while j + 1 < n and tokens[j + 1]["ne_tag"] == f"I-{t}":
            j += 1
        span = tokens[i:j + 1]
        out.append({
            "span_id": span_id,
            "sent_id": span[0]["sent_id"],
            "begin_tok": span[0]["tok_id"],
            "end_tok": span[-1]["tok_id"],
            "line_from": span[0]["line_from"],
            "col_from": span[0]["col_from"],
            "line_to": span[-1]["line_to"],
            "col_to": span[-1]["col_to"],
            "surface": " ".join(tk["token"] for tk in span),
            "lemmas": " ".join(tk["lemma"] for tk in span),
            "ne_type": t,
            "avg_prob": sum(tk["ne_prob"] for tk in span) / len(span),
            "n_tokens": len(span),
        })
        i = j + 1
    return out


# ------------------------------------------------------------- triples

def doc_triples_py(mentions: list[dict], tokens: list[dict],
                   link_map: dict | None = None) -> list[dict]:
    """Consecutive-mention-pair triples, identical to
    operators/triples.extract_triples (sentence window + first verb
    strictly between the pair).  ``link_map`` ((ne_type, alias) ->
    canonical) annotates each end with its within-doc canonical."""
    link_map = link_map or {}
    verbs = [(tk["tok_id"], tk["sent_id"], tk["lemma"])
             for tk in tokens if tk["pos"] == "VB"]
    out: list[dict] = []
    by_sent: dict[int, list[dict]] = {}
    for m in mentions:
        by_sent.setdefault(m["sent_id"], []).append(m)
    for sent_id, ms in by_sent.items():
        ms = sorted(ms, key=lambda m: m["begin_tok"])
        for a, b in zip(ms, ms[1:]):
            verb = None
            for v_tok, v_sent, v_lemma in verbs:
                if (v_sent == sent_id and a["end_tok"] < v_tok
                        < b["begin_tok"]):
                    if verb is None or v_tok < verb[0]:
                        verb = (v_tok, v_lemma)
            out.append({
                "sent_id": sent_id,
                "subj": a["surface"], "subj_type": a["ne_type"],
                "pred": verb[1] if verb else "co_occurs",
                "obj": b["surface"], "obj_type": b["ne_type"],
                "prob": min(a["avg_prob"], b["avg_prob"]),
                "kind": "pattern" if verb else "cooc",
                "subj_dc": link_map.get(
                    (a["ne_type"], a["surface"]), a["surface"]),
                "obj_dc": link_map.get(
                    (b["ne_type"], b["surface"]), b["surface"]),
            })
    return out


# --------------------------------------------------------------- links

def doc_links_py(mentions: list[dict], initialisms: frozenset[str],
                 cfg: EngineConfig) -> list[dict]:
    """Within-document alias resolution, identical to
    operators/linking.alias_links (containment-first scoring, JW only
    for single-token typo variants, nearest-preceding tie-break,
    per-alias majority)."""
    occs = []
    for m in mentions:
        # dedup while preserving order: the DataFrame path's
        # array_except dedups, so repeated tokens in a surface must
        # not skew the len(toks) ordering filter here (row-level
        # parity contract, ADVICE r01)
        toks = list(dict.fromkeys(
            t for t in m["surface"].split(" ") if t not in initialisms))
        if toks:
            occs.append({
                "ne_type": m["ne_type"], "surface": m["surface"],
                "begin_tok": m["begin_tok"], "toks": toks,
                "tokset": set(toks),
            })
    if len(occs) < 2:
        return []
    best_rows: list[tuple] = []
    for a in occs:
        best_key = None
        best = None
        for c in occs:
            if (a["ne_type"] != c["ne_type"]
                    or a["surface"] == c["surface"]
                    or len(a["toks"]) > len(c["toks"])
                    or len(a["surface"]) >= len(c["surface"])
                    or not (a["tokset"] & c["tokset"])):
                continue
            contained = a["tokset"] <= c["tokset"]
            if contained:
                score = 0.95
            elif len(a["toks"]) == 1 and len(c["toks"]) == 1:
                score = jaro_winkler_py(
                    a["toks"][0].lower(), c["toks"][0].lower())
                if score < cfg.typo_min_score:
                    continue
            else:
                continue
            pref = (c["begin_tok"] - a["begin_tok"]
                    if c["begin_tok"] < a["begin_tok"]
                    else -(1 << 40) - c["begin_tok"])
            key = (-score, -pref, c["surface"])
            if best_key is None or key < best_key:
                best_key = key
                best = (a["ne_type"], a["surface"], c["surface"], score)
        if best is not None:
            best_rows.append(best)
    # per-(type, alias) majority over occurrences; tie -> max score,
    # then lexicographic canonical
    agg: dict[tuple, dict[str, list]] = {}
    for ne_type, alias, canonical, score in best_rows:
        d = agg.setdefault((ne_type, alias), {})
        d.setdefault(canonical, []).append(score)
    out = []
    for (ne_type, alias), cands in sorted(agg.items()):
        canonical, scores = min(
            cands.items(),
            key=lambda kv: (-len(kv[1]), -max(kv[1]), kv[0]))
        out.append({
            "ne_type": ne_type, "alias": alias,
            "canonical": canonical, "score": max(scores),
        })
    return out


# ------------------------------------------------- surfaces/hub pairs

def doc_surfaces_py(mentions: list[dict],
                    links: list[dict]) -> tuple[list[dict], list[dict]]:
    """Distinct (type, surface) of the doc with within-doc canonical
    (the graph stage's ``resolved`` left-join, operators/graph.py,
    computed doc-locally), plus the hub-hub edges from alias chains
    (alias -> canonical where the canonical itself aliases further).
    """
    link_map = {(l["ne_type"], l["alias"]): l["canonical"] for l in links}
    surfaces: list[dict] = []
    seen: set[tuple] = set()
    for m in mentions:
        key = (m["ne_type"], m["surface"])
        if key in seen:
            continue
        seen.add(key)
        surfaces.append({
            "ne_type": key[0], "surface": key[1],
            "doc_canonical": link_map.get(key, key[1]),
        })
    pairs: list[dict] = []
    pseen: set[tuple] = set()
    for (ne_type, _alias), canonical in link_map.items():
        nxt = link_map.get((ne_type, canonical))
        if nxt is not None and nxt != canonical:
            src = f"g:{ne_type}{HUB_SEP}{canonical}"
            dst = f"g:{ne_type}{HUB_SEP}{nxt}"
            if (src, dst) not in pseen:
                pseen.add((src, dst))
                pairs.append({"src": src, "dst": dst})
    return surfaces, pairs


# ----------------------------------------------------------- fused UDF

def process_document_py(text: str | None, gaz: dict,
                        initialisms: frozenset[str],
                        cfg: EngineConfig) -> dict:
    tokens = refine_doc_py(classify_doc_py(tokenize_text_py(text), gaz), cfg)
    mentions = doc_mentions_py(tokens)
    links = doc_links_py(mentions, initialisms, cfg)
    link_map = {(l["ne_type"], l["alias"]): l["canonical"] for l in links}
    surfaces, hub_pairs = doc_surfaces_py(mentions, links)
    return {
        "tokens": tokens,
        "mentions": mentions,
        "triples": doc_triples_py(mentions, tokens, link_map),
        "links": links,
        "surfaces": surfaces,
        "hub_pairs": hub_pairs,
    }


def make_process_document_udf(gazetteer_rows, cfg: EngineConfig | None = None,
                              initialisms=frozenset()):
    """text -> struct(tokens, mentions, triples, links), one Arrow pass.

    The gazetteer index ships as a real Spark broadcast (one copy per
    executor) via :func:`classify.ship_broadcast`."""
    from tildener_spark.operators.classify import ship_broadcast

    cfg = cfg or EngineConfig()
    get_gaz = ship_broadcast(build_gazetteer_index(gazetteer_rows))
    inits = frozenset(initialisms)

    @F.pandas_udf(DOC_STRUCT)
    def process_document(text: pd.Series) -> pd.DataFrame:
        # struct return type => a DataFrame whose columns are the
        # struct fields
        gaz = get_gaz()
        docs = [process_document_py(t, gaz, inits, cfg) for t in text]
        return pd.DataFrame(
            {k: [d[k] for d in docs]
             for k in ("tokens", "mentions", "triples", "links",
                       "surfaces", "hub_pairs")},
            index=text.index)

    return process_document


def explode_docs(docs: DataFrame, part: str) -> DataFrame:
    """Narrow projection: docs(url, lang, doc) -> flat per-part table."""
    return (
        docs.select("url", F.explode(F.col(f"doc.{part}")).alias("x"))
        .select("url", "x.*")
    )
