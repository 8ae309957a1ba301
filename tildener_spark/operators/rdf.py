"""RDF N-Triples export of the canonical knowledge graph.

The last mile of KG construction: downstream consumers (triple
stores, SPARQL engines, JSON-LD loaders) ingest W3C N-Triples, so the
engine ships the canonical nodes/edges as spec-conformant statement
lines.  Reference parity note: TildeNER stops at tagged files — this
serves the kg_construct tier's north-rule "graph materialization"
stage alongside ``operators/graph.py``'s parquet/orc tables.

Spec + determinism choices (N-Triples 1.1, RFC 3987 IRIs):

* IRIs may carry unicode directly, so canonicals are NOT
  percent-encoded wholesale — only the characters N-Triples forbids
  inside ``<...>`` (space, angle brackets, quote, braces, pipe,
  caret, backtick, backslash, and ``%`` itself first so encodings
  never double-encode).  That keeps the transform a fixed chain of
  literal ``replace`` calls — identical builtins in Spark and DuckDB,
  so the export is value-hash oracled like every other operator
  (no URL-codec library whose space/+/hex-case conventions differ
  between engines).
* statement kinds: one ``rdf:type`` line per entity and one
  predicate line per distinct (subj, pred, obj) edge; evidence
  counts ride as an ``ev:count`` integer-literal statement per edge
  so nothing the graph stage knows is dropped.
* output is ``(kind, line)`` distinct rows — line order is carrier
  semantics (N-Triples is order-independent), so no global sort is
  forced; a writer can ``sortWithinPartitions`` for stable shards.

Scale shape: two projection passes over the |E|-sized canonical
triple table plus one |V|-sized distinct for the type lines — all
whole-stage-codegen string expressions, zero UDFs, one partial-agg
shuffle (the distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BASE = "http://kg.example.org/"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
XSD_INT = "<http://www.w3.org/2001/XMLSchema#integer>"

# (%% first: never double-encode) — the exact chars N-Triples forbids
# bare inside an IRIREF, RFC 3987 production
_IRI_ESCAPES = [
    ("%", "%25"), (" ", "%20"), ("<", "%3C"), (">", "%3E"),
    ('"', "%22"), ("{", "%7B"), ("}", "%7D"), ("|", "%7C"),
    ("^", "%5E"), ("`", "%60"), ("\\", "%5C"),
]


def iri_escape(col):
    """Escape the N-Triples-forbidden IRI characters in ``col`` via a
    fixed literal-replace chain (engine-portable, order-pinned)."""
    out = col
    for raw, enc in _IRI_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(enc))
    return out


def _entity_iri(type_col, canon_col):
    return F.concat(F.lit(f"<{BASE}entity/"), iri_escape(type_col),
                    F.lit("/"), iri_escape(canon_col), F.lit(">"))


def triples_to_ntriples(canon_triples: DataFrame) -> DataFrame:
    """Canonical triples -> N-Triples statement lines
    ``(kind, line)`` with kind in {type, edge, evidence}.

    * ``type``:     ``<entity> rdf:type <class> .`` per distinct
                    (ne_type, canonical) endpoint;
    * ``edge``:     ``<subj> <pred> <obj> .`` per distinct edge;
    * ``evidence``: ``<subj> <ev_pred> "n"^^xsd:integer .`` carrying
                    the evidence count (predicate IRI suffixed
                    ``/count/<pred>`` so multi-predicate pairs stay
                    distinct).
    """
    edges = (
        canon_triples
        .groupBy("subj_type", "subj_canonical", "pred",
                 "obj_type", "obj_canonical")
        .agg(F.count(F.lit(1)).alias("n_evidence"))
    )
    subj = _entity_iri(F.col("subj_type"), F.col("subj_canonical"))
    obj = _entity_iri(F.col("obj_type"), F.col("obj_canonical"))
    pred = F.concat(F.lit(f"<{BASE}pred/"),
                    iri_escape(F.col("pred")), F.lit(">"))
    ev_pred = F.concat(F.lit(f"<{BASE}pred/count/"),
                       iri_escape(F.col("pred")), F.lit(">"))

    edge_lines = edges.select(
        F.lit("edge").alias("kind"),
        F.concat(subj, F.lit(" "), pred, F.lit(" "), obj,
                 F.lit(" .")).alias("line"))
    ev_lines = edges.select(
        F.lit("evidence").alias("kind"),
        F.concat(subj, F.lit(" "), ev_pred, F.lit(' "'),
                 F.col("n_evidence").cast("string"),
                 F.lit(f'"^^{XSD_INT} .')).alias("line"))
    endpoints = (
        canon_triples.select(F.col("subj_type").alias("t"),
                             F.col("subj_canonical").alias("c"))
        .union(canon_triples.select(F.col("obj_type").alias("t"),
                                    F.col("obj_canonical").alias("c")))
        .distinct()
    )
    type_lines = endpoints.select(
        F.lit("type").alias("kind"),
        F.concat(_entity_iri(F.col("t"), F.col("c")),
                 F.lit(f" {RDF_TYPE} <{BASE}type/"),
                 iri_escape(F.col("t")), F.lit("> .")).alias("line"))
    return edge_lines.unionByName(ev_lines).unionByName(type_lines)
