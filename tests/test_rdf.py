"""N-Triples export (operators/rdf.py): statement grammar, IRI
escaping of every forbidden character, and family counts — the
kg_ntriples query's unit-level backing (value parity vs DuckDB is the
oracle row)."""

import re

import pytest
from pyspark.sql import functions as F

from tildener_spark.operators.rdf import (
    BASE, iri_escape, triples_to_ntriples)

# IRIREF per the N-Triples 1.1 grammar: no space, <>, ", {}, |, ^,
# backtick, backslash, or control chars inside the angle brackets
_IRI = r"<[^\x00-\x20<>\"{}|^`\\]*>"
_LINE = re.compile(
    rf"^{_IRI} {_IRI} ({_IRI}|\"[0-9]+\"\^\^{_IRI}) \.$")


def _ct(spark, rows):
    return spark.createDataFrame(
        rows, "subj_type string, subj_canonical string, pred string, "
              "obj_type string, obj_canonical string")


def test_every_line_matches_ntriples_grammar(spark):
    rows = [
        ("PER", "janis berzins", "vadi", "ORG", "latvijas banka"),
        ("PER", "janis berzins", "vadi", "ORG", "latvijas banka"),
        ("ORG", 'a<b>"c"', "own%s", "LOC", "x{y}|z^w`\\v"),
    ]
    out = triples_to_ntriples(_ct(spark, rows)).collect()
    assert out, "no lines emitted"
    for r in out:
        assert _LINE.match(r["line"]), r["line"]


def test_escape_chain_handles_every_forbidden_char(spark):
    nasty = '% <>"{}|^`\\'
    df = spark.range(1).select(iri_escape(F.lit(nasty)).alias("e"))
    got = df.collect()[0]["e"]
    # % first, then each forbidden char; nothing double-encoded
    assert got == "%25%20%3C%3E%22%7B%7D%7C%5E%60%5C"


def test_statement_families_and_counts(spark):
    rows = [
        ("PER", "a", "p1", "ORG", "b"),
        ("PER", "a", "p1", "ORG", "b"),   # same edge, 2 evidence
        ("PER", "a", "p2", "ORG", "b"),   # second predicate
        ("ORG", "b", "p1", "LOC", "c"),
    ]
    out = triples_to_ntriples(_ct(spark, rows))
    by_kind = {r["kind"]: r["cnt"] for r in
               out.groupBy("kind").agg(
                   F.count(F.lit(1)).alias("cnt")).collect()}
    # 3 distinct edges, each with an evidence line; 3 endpoints
    assert by_kind == {"edge": 3, "evidence": 3, "type": 3}
    ev = [r["line"] for r in out.collect()
          if r["kind"] == "evidence" and "/count/p1>" in r["line"]
          and f"<{BASE}entity/PER/a>" in r["line"]]
    assert len(ev) == 1 and '"2"^^' in ev[0]


def test_multiword_canonical_percent_encodes_spaces(spark):
    rows = [("ORG", "latvijas universitate", "atrodas",
             "LOC", "riga")]
    lines = [r["line"] for r in
             triples_to_ntriples(_ct(spark, rows)).collect()]
    assert any("entity/ORG/latvijas%20universitate" in ln
               for ln in lines)
    assert not any(" universitate" in ln.split(">")[0]
                   for ln in lines)  # no bare space inside an IRI


def test_materialize_graph_rdf_sink_roundtrip(spark, tmp_path):
    """rdf=True ships N-Triples text shards alongside nodes/edges;
    reading them back yields exactly the operator's line set."""
    from tildener_spark.operators.graph import materialize_graph

    ct = spark.createDataFrame(
        [("u1", 0, "Janis", "janis", "PER", "vadi",
          "Banka", "banka", "ORG", 0.9, "pattern")] * 2,
        "url string, sent_id int, subj string, subj_canonical string, "
        "subj_type string, pred string, obj string, "
        "obj_canonical string, obj_type string, prob double, "
        "kind string")
    ents = ct.selectExpr("subj_canonical as canonical",
                         "subj_type as ne_type").distinct()
    got = materialize_graph(ents, ct, str(tmp_path / "g"),
                            buckets=2, rdf=True)
    assert "ntriples" in got
    back = {r["value"] for r in
            spark.read.text(got["ntriples"]).collect()}
    expect = {r["line"] for r in
              triples_to_ntriples(ct).collect()}
    assert back == expect and len(back) == 4  # edge+ev+2 types
