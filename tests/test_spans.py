"""BIO span assembly: Spark DataFrame op vs the pure-python span
walker on identical documents (GetFullNETagsFromTokens parity)."""

import pyspark.sql.functions as F

from tildener_spark.datagen import corpus_df, gazetteer_df, world_gazetteer
from tildener_spark.operators.classify import (
    build_gazetteer_index, classify_doc_py)
from tildener_spark.operators.refine import _spans
from tildener_spark.operators.spans import assemble_spans
from tildener_spark.operators.tokenize import (
    explode_tokens, tokenize_text_py, with_tokens)
from tildener_spark.operators.classify import with_ne_tags
from tildener_spark.datagen import gen_doc


def test_spark_spans_match_python_walker(spark):
    corpus = corpus_df(spark, 12).select("url", "text")
    gaz = gazetteer_df(spark)
    tagged = with_ne_tags(with_tokens(corpus), gaz)
    flat = explode_tokens(tagged)
    got = {
        (r["url"], r["begin_tok"], r["end_tok"], r["ne_type"])
        for r in assemble_spans(flat).collect()
    }
    gidx = build_gazetteer_index(world_gazetteer())
    want = set()
    for i in range(12):
        d = gen_doc(i)
        toks = classify_doc_py(tokenize_text_py(d["text"]), gidx)
        for (a, b, t) in _spans([tk["ne_tag"] for tk in toks]):
            want.add((d["url"], a, b, t))
    assert got == want


def test_stray_I_ignored(spark):
    rows = [
        ("u", 0, 0, "A", "a", 0, 0, 0, 0, "I-LOC", 0.9),   # stray
        ("u", 1, 0, "B", "b", 0, 2, 0, 2, "B-ORG", 0.8),
        ("u", 2, 0, "C", "c", 0, 4, 0, 4, "I-LOC", 0.7),   # type break
        ("u", 3, 0, "D", "d", 0, 6, 0, 6, "I-ORG", 0.6),   # after break
    ]
    df = spark.createDataFrame(rows, (
        "url string, tok_id int, sent_id int, token string, lemma string,"
        "line_from int, col_from int, line_to int, col_to int,"
        "ne_tag string, ne_prob double"))
    out = assemble_spans(df).collect()
    assert len(out) == 1
    s = out[0]
    assert (s["begin_tok"], s["end_tok"], s["ne_type"]) == (1, 1, "ORG")
    assert abs(s["avg_prob"] - 0.8) < 1e-12


def test_span_fields(spark):
    rows = [
        ("u", 0, 0, "Jānis", "jānis", 3, 2, 3, 6, "B-PERS", 0.9),
        ("u", 1, 0, "Bērziņš", "bērziņš", 3, 8, 3, 14, "I-PERS", 0.7),
    ]
    df = spark.createDataFrame(rows, (
        "url string, tok_id int, sent_id int, token string, lemma string,"
        "line_from int, col_from int, line_to int, col_to int,"
        "ne_tag string, ne_prob double"))
    s = assemble_spans(df).collect()[0]
    assert s["surface"] == "Jānis Bērziņš"
    assert s["lemmas"] == "jānis bērziņš"
    assert (s["line_from"], s["col_from"], s["line_to"], s["col_to"]) == (3, 2, 3, 14)
    assert abs(s["avg_prob"] - 0.8) < 1e-12
    assert s["n_tokens"] == 2
