"""The end-to-end KG-construction pipeline (the "flagship query").

Spark re-expression of NEMuc7TagPlaintext.pl (SURVEY.md §3.1) extended
with the north-rule KG stages:

    pages ─ extract_text ─ tokenize_pos ─ classify ─ refine ──┐
      (one narrow stage: all four are per-row column maps      │
       over the nested token array — zero shuffles)            │
                                                               ▼
    explode ─ assemble_spans (1 shuffle: groupBy url,span_grp) ─ mentions
    mentions ─ extract_triples (window + verb range join)      ─ triples
    mentions ─ alias_links ─ connected_components              ─ entities
    triples × mapping ─ canonicalize ─ aggregate               ─ edges

Stage boundaries are exactly the shuffles; with ``checkpoint_dir``
set, each named stage materializes to parquet with per-partition
lineage (plans/lineage.py) and a re-run resumes from the last
completed stage — the kill-and-resume contract of BASELINE.md.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.functions.text import extract_text
from tildener_spark.operators.classify import make_tag_pages_udf
from tildener_spark.operators.graph import (
    build_entity_graph, canonicalize_triples, materialize_graph,
)
from tildener_spark.operators.spans import assemble_spans
from tildener_spark.operators.tokenize import explode_tokens
from tildener_spark.operators.triples import extract_triples
from tildener_spark.plans.lineage import checkpoint_stage


@dataclass
class PipelineResult:
    tagged: DataFrame
    tokens: DataFrame
    mentions: DataFrame
    triples: DataFrame
    links: DataFrame
    entities: DataFrame
    mapping: DataFrame
    canonical_triples: DataFrame
    extra: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    gazetteer: DataFrame,
    cfg: EngineConfig | None = None,
    reextract_text: bool = False,
) -> PipelineResult:
    """Run the full chain; lazily unless cfg.checkpoint_dir is set.

    ``reextract_text``: recompute text from html (the production path;
    off by default because the input table already carries text and
    the byte-identity test asserts both agree).
    """
    cfg = cfg or EngineConfig()
    ckpt = cfg.checkpoint_dir

    if reextract_text:
        pages = pages.withColumn("text", extract_text("html"))

    initialisms = {
        r["surface"]
        for r in gazetteer.filter(F.col("ne_type") == "ORG_INIT").collect()
    }

    gaz_rows = (
        [(r["ne_type"], r["surface"]) for r in gazetteer.collect()]
        if hasattr(gazetteer, "collect") else list(gazetteer)
    )
    tag_udf = make_tag_pages_udf(gaz_rows, cfg)
    tagged = pages.select(
        "url", "lang", tag_udf(F.col("text")).alias("tokens"))
    if ckpt:
        tagged = checkpoint_stage(spark, tagged, ckpt, "tagged")
    else:
        # the tagged table feeds three downstream branches (spans,
        # triples' verb lookup, linking); without materialization each
        # branch would re-run the whole UDF chain
        tagged = tagged.persist()

    tokens = explode_tokens(tagged)
    mentions = assemble_spans(tokens)
    if ckpt:
        mentions = checkpoint_stage(spark, mentions, ckpt, "mentions")
    else:
        mentions = mentions.persist()

    triples = extract_triples(mentions, tokens)
    if ckpt:
        triples = checkpoint_stage(spark, triples, ckpt, "triples")

    graph = build_entity_graph(mentions, cfg, initialisms)
    links, entities, mapping = (
        graph["links"], graph["entities"], graph["mapping"])
    if ckpt:
        links = checkpoint_stage(spark, links, ckpt, "links")
        entities = checkpoint_stage(spark, entities, ckpt, "entities")
        mapping = checkpoint_stage(spark, mapping, ckpt, "mapping")
    else:
        mapping = mapping.persist()  # joined twice (subj + obj sides)

    canon = canonicalize_triples(triples, mapping)
    if ckpt:
        canon = checkpoint_stage(spark, canon, ckpt, "canonical_triples")

    return PipelineResult(
        tagged=tagged, tokens=tokens, mentions=mentions, triples=triples,
        links=links, entities=entities, mapping=mapping,
        canonical_triples=canon,
    )


def materialize(result: PipelineResult, out_dir: str,
                buckets: int = 64) -> dict:
    return materialize_graph(result.entities, result.canonical_triples,
                             out_dir, buckets)
