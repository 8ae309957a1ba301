"""Fused per-document pass (operators/document.py) must agree row-for-
row with the DataFrame operator path (spans/triples/linking) — the
oracle-parity contract of the fused production pipeline."""

import pyspark.sql.functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
from tildener_spark.operators.classify import make_tag_pages_udf
from tildener_spark.operators.document import (
    explode_docs, make_process_document_udf,
)
from tildener_spark.operators.linking import alias_links
from tildener_spark.operators.spans import assemble_spans
from tildener_spark.operators.tokenize import explode_tokens
from tildener_spark.operators.triples import extract_triples
from tildener_spark.plans.pipeline import run_pipeline


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols)
        for r in df.select(*cols).collect()
    )


def _setup(spark, n_docs=60):
    corpus = corpus_df(spark, n_docs).cache()
    pages, *_ = split_gold(corpus)
    gaz = gazetteer_df(spark)
    cfg = EngineConfig()
    gaz_rows = [(r["ne_type"], r["surface"]) for r in gaz.collect()]
    inits = frozenset(
        r["surface"] for r in gaz.filter(
            F.col("ne_type") == "ORG_INIT").collect())
    docs = pages.select(
        "url", "lang",
        make_process_document_udf(gaz_rows, cfg, inits)(
            F.col("text")).alias("doc")).persist()
    tagged = pages.select(
        "url", "lang",
        make_tag_pages_udf(gaz_rows, cfg)(F.col("text")).alias("tokens"))
    tokens = explode_tokens(tagged).persist()
    return docs, tokens, cfg, inits


def test_fused_matches_operator_path(spark):
    docs, tokens, cfg, inits = _setup(spark)

    m_cols = ["url", "span_id", "sent_id", "begin_tok", "end_tok",
              "line_from", "col_from", "line_to", "col_to",
              "surface", "lemmas", "ne_type", "n_tokens"]
    fused_m = explode_docs(docs, "mentions").persist()
    op_m = assemble_spans(tokens).persist()
    assert _rows(fused_m, m_cols) == _rows(op_m, m_cols)
    # probs separately with rounding (float-sum order differs)
    assert _rows(fused_m.withColumn("p", F.round("avg_prob", 9)), ["url", "begin_tok", "p"]) == \
           _rows(op_m.withColumn("p", F.round("avg_prob", 9)), ["url", "begin_tok", "p"])

    t_cols = ["url", "sent_id", "subj", "subj_type", "pred",
              "obj", "obj_type", "kind"]
    fused_t = explode_docs(docs, "triples")
    op_t = extract_triples(op_m, tokens)
    assert _rows(fused_t, t_cols) == _rows(op_t, t_cols)

    l_cols = ["url", "ne_type", "alias", "canonical", "score"]
    fused_l = explode_docs(docs, "links")
    op_l = alias_links(op_m, cfg, inits)
    assert _rows(fused_l, l_cols) == _rows(op_l, l_cols)

    # schemas of the shared columns agree (driver hash-compare relies
    # on matching dtypes)
    fused_types = dict(fused_m.select(*m_cols, "avg_prob").dtypes)
    op_types = dict(op_m.select(*m_cols, "avg_prob").dtypes)
    assert fused_types == op_types


def test_fused_pipeline_matches_unfused(spark):
    corpus = corpus_df(spark, 40).cache()
    pages, *_ = split_gold(corpus)
    gaz = gazetteer_df(spark)
    cfg = EngineConfig()
    a = run_pipeline(spark, pages, gaz, cfg, fused=True)
    b = run_pipeline(spark, pages, gaz, cfg, fused=False)
    key = ["url", "subj_canonical", "pred", "obj_canonical"]
    assert _rows(a.canonical_triples, key) == _rows(b.canonical_triples, key)
    ekey = ["ne_type", "canonical", "n_docs", "n_surfaces"]
    assert _rows(a.entities, ekey) == _rows(b.entities, ekey)
