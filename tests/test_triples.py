"""Triple extraction + the end-to-end parity gate (P/R >= 0.95)."""

import pyspark.sql.functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
from tildener_spark.operators.classify import with_ne_tags
from tildener_spark.operators.refine import with_refinements
from tildener_spark.operators.spans import assemble_spans
from tildener_spark.operators.tokenize import explode_tokens, with_tokens
from tildener_spark.operators.triples import extract_triples, triple_prf


def _mentions_df(spark, rows):
    return spark.createDataFrame(rows, (
        "url string, sent_id int, begin_tok int, end_tok int,"
        "surface string, ne_type string, avg_prob double"))


def _tokens_df(spark, rows):
    return spark.createDataFrame(rows, (
        "url string, sent_id int, tok_id int, pos string, lemma string"))


def test_pattern_triple_uses_first_verb_between(spark):
    mentions = _mentions_df(spark, [
        ("u", 0, 0, 1, "Jānis Bērziņš", "PERS", 0.97),
        ("u", 0, 4, 4, "Rīga", "LOC", 0.97),
    ])
    tokens = _tokens_df(spark, [
        ("u", 0, 2, "VB", "dzīvot"), ("u", 0, 3, "VB", "strādāt"),
    ])
    out = extract_triples(mentions, tokens).collect()
    assert len(out) == 1
    t = out[0]
    assert (t["subj"], t["pred"], t["obj"], t["kind"]) == (
        "Jānis Bērziņš", "dzīvot", "Rīga", "pattern")
    assert abs(t["prob"] - 0.97) < 1e-12


def test_cooccurrence_without_verb(spark):
    mentions = _mentions_df(spark, [
        ("u", 0, 0, 0, "A", "PERS", 0.9),
        ("u", 0, 2, 2, "B", "ORG", 0.8),
    ])
    tokens = _tokens_df(spark, [("u", 0, 5, "VB", "vadīt")])  # after both
    out = extract_triples(mentions, tokens).collect()
    assert len(out) == 1
    assert out[0]["pred"] == "co_occurs" and out[0]["kind"] == "cooc"
    assert abs(out[0]["prob"] - 0.8) < 1e-12


def test_only_consecutive_pairs(spark):
    mentions = _mentions_df(spark, [
        ("u", 0, 0, 0, "A", "PERS", 0.9),
        ("u", 0, 2, 2, "B", "ORG", 0.9),
        ("u", 0, 4, 4, "C", "LOC", 0.9),
    ])
    tokens = _tokens_df(spark, [])
    out = extract_triples(mentions, tokens).collect()
    pairs = {(t["subj"], t["obj"]) for t in out}
    assert pairs == {("A", "B"), ("B", "C")}  # no (A, C)


def test_no_cross_sentence_pairs(spark):
    mentions = _mentions_df(spark, [
        ("u", 0, 0, 0, "A", "PERS", 0.9),
        ("u", 1, 2, 2, "B", "ORG", 0.9),
    ])
    out = extract_triples(mentions, _tokens_df(spark, [])).collect()
    assert out == []


def test_end_to_end_triple_parity_gate(spark):
    """The BASELINE.json metric: triple P/R >= 0.95 vs gold."""
    corpus = corpus_df(spark, 40).cache()
    pages, _gm, gt, _gl = split_gold(corpus)
    gaz = gazetteer_df(spark)
    tagged = with_refinements(
        with_ne_tags(with_tokens(pages), gaz), EngineConfig())
    flat = explode_tokens(tagged)
    mentions = assemble_spans(flat)
    triples = extract_triples(mentions, flat)
    m = triple_prf(triples, gt)
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m
