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

from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from tildener_spark.config import EngineConfig
from tildener_spark.operators.classify import (
    build_gazetteer_index, classify_table,
)
from tildener_spark.operators.linking import jaro_winkler_py
from tildener_spark.operators.refine import refine_table
from tildener_spark.operators.tokenize import (
    TAGGED_TYPE, TokenTable, batch_token_spans, tokenize_table,
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

def doc_struct_type(emit_tokens: bool = True,
                    emit_mentions: bool = True) -> T.StructType:
    """Return schema of the fused UDF.  ``emit_tokens=False`` drops the
    tokens field — it is ~40% of the Arrow-serialized bytes and the
    default in-memory pipeline path has no consumer for it, so not
    emitting it at all beats emitting-then-pruning (the JVM-side slim
    re-projection cannot reach back into the Python worker).
    ``emit_mentions=False`` additionally drops the mentions field —
    measured at ~50% of the REMAINING Arrow bytes (50 MB / 20k docs vs
    30 MB triples + 20 MB surfaces) — because the graph + canonical-
    triple stages consume only triples/links/surfaces/hub_pairs: the
    fused pass precomputes per-doc what the graph stage would have
    derived from mentions, so the mention rows themselves cross into
    the JVM only for consumers that ask for them (checkpoint mode, or
    a recompute-on-access projection)."""
    fields = [T.StructField("tokens", TAGGED_TYPE)] if emit_tokens else []
    if emit_mentions:
        fields.append(
            T.StructField("mentions", T.ArrayType(MENTION_STRUCT)))
    return T.StructType(fields + [
        T.StructField("triples", T.ArrayType(TRIPLE_STRUCT)),
        T.StructField("links", T.ArrayType(LINK_STRUCT)),
        T.StructField("surfaces", T.ArrayType(SURFACE_STRUCT)),
        T.StructField("hub_pairs", T.ArrayType(HUB_PAIR_STRUCT)),
    ])


DOC_STRUCT = doc_struct_type(True)

HUB_SEP = "␟"  # must match operators/graph.SEP


# ------------------------------------------------------------ mentions

class Mention(NamedTuple):
    """Row of MENTION_STRUCT — a NamedTuple IS a tuple, so Arrow
    serializes it directly (no per-mention dict, VERDICT r02 item 4)."""
    span_id: int
    sent_id: int
    begin_tok: int
    end_tok: int
    line_from: int
    col_from: int
    line_to: int
    col_to: int
    surface: str
    lemmas: str
    ne_type: str
    avg_prob: float
    n_tokens: int


def doc_mentions_py(tt: TokenTable) -> list[Mention]:
    """BIO span assembly, identical to operators/spans.assemble_spans.

    span_id = 1-based running count of B- tokens; a span is the B-
    token plus the maximal following run of I-<same type> tokens
    (GetFullNETagsFromTokens, NERefinements.pm:219-286)."""
    out: list[Mention] = []
    tags = tt.ne_tag
    probs = tt.ne_prob
    sent_ids = tt.sent_id
    line_from, col_from = tt.line_from, tt.col_from
    line_to, col_to = tt.line_to, tt.col_to
    tokens, lemmas = tt.token, tt.lemma
    n = len(tags)
    span_id = 0
    i = 0
    while i < n:
        tag = tags[i]
        # label space is closed (BIO_LABELS): first-char dispatch
        if tag[0] != "B":
            i += 1
            continue
        span_id += 1
        t = tag[2:]
        want = "I-" + t
        j = i
        while j + 1 < n and tags[j + 1] == want:
            j += 1
        seg = probs[i:j + 1]
        out.append(Mention(
            span_id, sent_ids[i], i, j,
            line_from[i], col_from[i],
            line_to[j], col_to[j],
            " ".join(tokens[i:j + 1]),
            " ".join(lemmas[i:j + 1]),
            t, sum(seg) / len(seg), j - i + 1,
        ))
        i = j + 1
    return out


# ------------------------------------------------------------- triples

def doc_triples_py(mentions: list[Mention], tt: TokenTable,
                   link_map: dict | None = None) -> list[tuple]:
    """Consecutive-mention-pair triples, identical to
    operators/triples.extract_triples (sentence window + first verb
    strictly between the pair).  ``link_map`` ((ne_type, alias) ->
    canonical) annotates each end with its within-doc canonical.
    Rows are tuples in TRIPLE_STRUCT field order."""
    link_map = link_map or {}
    # verbs bucketed per sentence, in token order (enumerate order):
    # the pair loop below only ever probes its own sentence's verbs,
    # and "first verb strictly between" is the first in-range element
    # of an ascending list
    verbs_by_sent: dict[int, list[tuple[int, str]]] = {}
    sent_ids = tt.sent_id
    lemmas = tt.lemma
    for k, pos in enumerate(tt.pos):
        if pos == "VB":
            verbs_by_sent.setdefault(sent_ids[k], []).append(
                (k, lemmas[k]))
    out: list[tuple] = []
    by_sent: dict[int, list[Mention]] = {}
    for m in mentions:
        by_sent.setdefault(m.sent_id, []).append(m)
    for sent_id, ms in by_sent.items():
        ms = sorted(ms, key=lambda m: m.begin_tok)
        sent_verbs = verbs_by_sent.get(sent_id, ())
        for a, b in zip(ms, ms[1:]):
            verb = None
            for v_tok, v_lemma in sent_verbs:
                if v_tok >= b.begin_tok:
                    break  # ascending: nothing later can be in range
                if v_tok > a.end_tok:
                    verb = (v_tok, v_lemma)
                    break  # first in-range == minimal v_tok
            out.append((
                sent_id,
                a.surface, a.ne_type,
                verb[1] if verb else "co_occurs",
                b.surface, b.ne_type,
                min(a.avg_prob, b.avg_prob),
                "pattern" if verb else "cooc",
                link_map.get((a.ne_type, a.surface), a.surface),
                link_map.get((b.ne_type, b.surface), b.surface),
            ))
    return out


# --------------------------------------------------------------- links

def _links_for_type(a_type: str, occs: list[tuple], cfg: EngineConfig,
                    best_rows: list[tuple]) -> None:
    """Best canonical per alias occurrence within one ne_type bucket.

    Same pair predicate / scoring / tie-break as the pre-bucketed
    all-mentions loop (the a_type != c_type arm is now structural)."""
    typo_min = cfg.typo_min_score
    for a_surf, a_begin, a_ntoks, a_toks, a_set in occs:
        a_len = len(a_surf)
        best_key = None
        best = None
        for c_surf, c_begin, c_ntoks, _c_toks, c_set in occs:
            if (a_surf == c_surf
                    or a_ntoks > c_ntoks
                    or a_len >= len(c_surf)
                    or not (a_set & c_set)):
                continue
            if a_set <= c_set:
                score = 0.95
            elif a_ntoks == 1 and c_ntoks == 1:
                score = jaro_winkler_py(
                    a_toks[0].lower(), _c_toks[0].lower())
                if score < typo_min:
                    continue
            else:
                continue
            pref = (c_begin - a_begin if c_begin < a_begin
                    else -(1 << 40) - c_begin)
            key = (-score, -pref, c_surf)
            if best_key is None or key < best_key:
                best_key = key
                best = (a_type, a_surf, c_surf, score)
        if best is not None:
            best_rows.append(best)


def doc_links_py(mentions: list[Mention], initialisms: frozenset[str],
                 cfg: EngineConfig) -> list[tuple]:
    """Within-document alias resolution, identical to
    operators/linking.alias_links (containment-first scoring, JW only
    for single-token typo variants, nearest-preceding tie-break,
    per-alias majority).  Rows are (ne_type, alias, canonical, score)
    tuples (LINK_STRUCT order)."""
    # candidate pairs only ever form within one ne_type, so bucket by
    # type up front: the scoring loop is quadratic per bucket instead
    # of quadratic over the whole document's mentions
    by_type: dict[str, list[tuple]] = {}
    for m in mentions:
        # dedup while preserving order: the DataFrame path's
        # array_except dedups, so repeated tokens in a surface must
        # not skew the len(toks) ordering filter here (row-level
        # parity contract, ADVICE r01)
        toks = list(dict.fromkeys(
            t for t in m.surface.split(" ") if t not in initialisms))
        if toks:
            # (surface, begin_tok, n_toks, toks, tokset)
            by_type.setdefault(m.ne_type, []).append(
                (m.surface, m.begin_tok, len(toks), toks, set(toks)))
    best_rows: list[tuple] = []
    for a_type, occs in by_type.items():
        if len(occs) < 2:
            continue
        _links_for_type(a_type, occs, cfg, best_rows)
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
        out.append((ne_type, alias, canonical, max(scores)))
    return out


# ------------------------------------------------- surfaces/hub pairs

def doc_surfaces_py(mentions: list[Mention],
                    links: list[tuple]) -> tuple[list[tuple], list[tuple]]:
    """Distinct (type, surface) of the doc with within-doc canonical
    (the graph stage's ``resolved`` left-join, operators/graph.py,
    computed doc-locally), plus the hub-hub edges from alias chains
    (alias -> canonical where the canonical itself aliases further).
    """
    link_map = {(ne_type, alias): canonical
                for ne_type, alias, canonical, _score in links}
    surfaces: list[tuple] = []
    seen: set[tuple] = set()
    for m in mentions:
        key = (m.ne_type, m.surface)
        if key in seen:
            continue
        seen.add(key)
        surfaces.append((key[0], key[1], link_map.get(key, key[1])))
    pairs: list[tuple] = []
    pseen: set[tuple] = set()
    for (ne_type, _alias), canonical in link_map.items():
        nxt = link_map.get((ne_type, canonical))
        if nxt is not None and nxt != canonical:
            src = f"g:{ne_type}{HUB_SEP}{canonical}"
            dst = f"g:{ne_type}{HUB_SEP}{nxt}"
            if (src, dst) not in pseen:
                pseen.add((src, dst))
                pairs.append((src, dst))
    return surfaces, pairs


# ----------------------------------------------------------- fused UDF

def process_document_py(text: str | None, gaz: dict,
                        initialisms: frozenset[str],
                        cfg: EngineConfig,
                        emit_tokens: bool = True,
                        emit_mentions: bool = True,
                        spans=None) -> dict:
    """One document -> the DOC_STRUCT fields, columnar throughout:
    tokens live in a TokenTable (parallel lists) from tokenizer to
    Arrow hand-off; rows cross into Arrow as tuples, never dicts.
    ``emit_tokens=False`` omits the tokens key (and skips building the
    per-token tuples entirely); ``emit_mentions=False`` omits the
    mentions key (mentions are still computed internally — triples,
    links and surfaces derive from them — but never serialized).
    ``spans`` is this document's entry from
    tokenize.batch_token_spans, when the caller vectorized raw-token
    location over the whole Arrow batch."""
    tt = tokenize_table(text, spans)
    classify_table(tt, gaz)
    refine_table(tt, cfg)
    mentions = doc_mentions_py(tt)
    links = doc_links_py(mentions, initialisms, cfg)
    link_map = {(ne_type, alias): canonical
                for ne_type, alias, canonical, _score in links}
    surfaces, hub_pairs = doc_surfaces_py(mentions, links)
    out = {
        "triples": doc_triples_py(mentions, tt, link_map),
        "links": links,
        "surfaces": surfaces,
        "hub_pairs": hub_pairs,
    }
    if emit_mentions:
        out["mentions"] = mentions
    if emit_tokens:
        out["tokens"] = tt.token_tuples()
    return out


def make_process_document_udf(gazetteer_rows, cfg: EngineConfig | None = None,
                              initialisms=frozenset(),
                              emit_tokens: bool = True,
                              emit_mentions: bool = True):
    """text -> struct(tokens?, mentions, triples, links, ...), one
    Arrow pass.

    The gazetteer index ships as a real Spark broadcast (one copy per
    executor) via :func:`classify.ship_broadcast`."""
    from tildener_spark.operators.classify import ship_broadcast

    cfg = cfg or EngineConfig()
    get_gaz = ship_broadcast(build_gazetteer_index(gazetteer_rows))
    inits = frozenset(initialisms)
    struct = doc_struct_type(emit_tokens, emit_mentions)
    fields = tuple(f.name for f in struct.fields)

    @F.pandas_udf(struct)
    def process_document(text: pd.Series) -> pd.DataFrame:
        # struct return type => a DataFrame whose columns are the
        # struct fields
        gaz = get_gaz()
        # one vectorized codepoint pass locates every raw token of
        # the batch (tokenize.batch_token_spans) before the per-doc
        # Python loop runs
        spans = batch_token_spans(text.tolist())
        docs = [process_document_py(t, gaz, inits, cfg, emit_tokens,
                                    emit_mentions, sp)
                for t, sp in zip(text, spans)]
        return pd.DataFrame(
            {k: [d[k] for d in docs] for k in fields},
            index=text.index)

    return process_document


def explode_docs(docs: DataFrame, part: str) -> DataFrame:
    """Narrow projection: docs(url, lang, doc) -> flat per-part table."""
    return (
        docs.select("url", F.explode(F.col(f"doc.{part}")).alias("x"))
        .select("url", "x.*")
    )
