"""Incremental KG maintenance (plans/incremental.py): merging a
delta batch into a prior checkpointed run must reproduce the
full-batch result bit-for-bit — canonical triples, entities, and the
mention mapping — while touching the per-document pass only for the
delta pages."""

from pyspark.sql import functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
from tildener_spark.plans.incremental import run_pipeline_incremental
from tildener_spark.plans.pipeline import run_pipeline


def _rows(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(tuple(r[c] for c in cols)
                  for r in df.select(*cols).collect())


def _doc_num(col):
    return F.regexp_extract(col, r"doc/([0-9]+)$", 1).cast("int")


def test_incremental_equals_full_batch(spark, tmp_path):
    corpus = corpus_df(spark, 40).cache()
    pages, *_ = split_gold(corpus)
    pages = pages.select("url", "warc_ts", "text", "lang").cache()
    gaz = gazetteer_df(spark)

    base = pages.filter(_doc_num(F.col("url")) < 30)
    delta = pages.filter(_doc_num(F.col("url")) >= 30)
    assert 0 < delta.count() < pages.count()

    # full batch, in-memory fused — the ground truth
    full = run_pipeline(spark, pages, gaz, EngineConfig())

    # prior run: base pages, checkpointed (the state a production
    # deployment holds between crawl batches)
    ckpt = str(tmp_path / "prior")
    run_pipeline(spark, base, gaz, EngineConfig(checkpoint_dir=ckpt))

    inc = run_pipeline_incremental(spark, ckpt, delta, gaz,
                                   EngineConfig())

    canon_cols = ["url", "sent_id", "subj", "subj_canonical",
                  "subj_type", "pred", "obj", "obj_canonical",
                  "obj_type", "prob", "kind"]
    assert _rows(inc["canonical_triples"], canon_cols) \
        == _rows(full.canonical_triples, canon_cols)
    assert _rows(inc["entities"]) == _rows(full.entities)
    assert _rows(inc["mapping"]) == _rows(full.mapping)
    for c in inc["caches"]:
        c.unpersist()


def test_incremental_merges_cross_batch_entities(spark, tmp_path):
    """A delta surface must be able to merge INTO a prior entity
    cluster (the cross-batch link is the whole point): check that at
    least one merged component spans a base url and a delta url."""
    corpus = corpus_df(spark, 40).cache()
    pages, *_ = split_gold(corpus)
    pages = pages.select("url", "warc_ts", "text", "lang").cache()
    gaz = gazetteer_df(spark)
    base = pages.filter(_doc_num(F.col("url")) < 30)
    delta = pages.filter(_doc_num(F.col("url")) >= 30)

    ckpt = str(tmp_path / "prior")
    run_pipeline(spark, base, gaz, EngineConfig(checkpoint_dir=ckpt))
    inc = run_pipeline_incremental(spark, ckpt, delta, gaz,
                                   EngineConfig())

    spans = (inc["mapping"]
             .withColumn("is_delta", _doc_num(F.col("url")) >= 30)
             .groupBy("component")
             .agg(F.countDistinct("is_delta").alias("sides"))
             .filter(F.col("sides") == 2))
    assert spans.count() > 0
    # counters surface the delta-only work profile
    assert inc["counters"]["vocab_delta"]["rows_out"] > 0
    for c in inc["caches"]:
        c.unpersist()


def test_recrawl_supersedes_prior_version(spark, tmp_path):
    """Re-crawl semantics: a delta whose urls ALREADY exist in the
    prior state replaces those pages at the fact level — the merged
    result must equal a full-batch run over the LATEST version of
    every url (no stale triples, no double-counted evidence)."""
    corpus = corpus_df(spark, 50).cache()
    pages, *_ = split_gold(corpus)
    pages = pages.select("url", "warc_ts", "text", "lang").cache()
    gaz = gazetteer_df(spark)

    base = pages.filter(_doc_num(F.col("url")) < 30)
    # v2 of urls 20-29: same urls, DIFFERENT content (texts of docs
    # 30-39 swapped in — deterministic, same corpus distribution)
    v2_src = (pages.filter((_doc_num(F.col("url")) >= 30)
                           & (_doc_num(F.col("url")) < 40))
              .withColumn("n", _doc_num(F.col("url")) - 10))
    url_of = (pages.filter((_doc_num(F.col("url")) >= 20)
                           & (_doc_num(F.col("url")) < 30))
              .select(F.col("url").alias("new_url"),
                      _doc_num(F.col("url")).alias("n")))
    delta = (v2_src.join(url_of, "n")
             .select(F.col("new_url").alias("url"), "warc_ts",
                     "text", "lang").cache())
    assert delta.count() == 10

    # ground truth: full batch over docs 0-19 (v1) + the v2 pages
    latest = base.filter(_doc_num(F.col("url")) < 20) \
        .unionByName(delta)
    full = run_pipeline(spark, latest, gaz, EngineConfig())

    ckpt = str(tmp_path / "prior")
    run_pipeline(spark, base, gaz, EngineConfig(checkpoint_dir=ckpt))
    inc = run_pipeline_incremental(spark, ckpt, delta, gaz,
                                   EngineConfig())

    canon_cols = ["url", "sent_id", "subj", "subj_canonical",
                  "subj_type", "pred", "obj", "obj_canonical",
                  "obj_type", "prob", "kind"]
    assert _rows(inc["canonical_triples"], canon_cols) \
        == _rows(full.canonical_triples, canon_cols)
    assert _rows(inc["entities"]) == _rows(full.entities)
    # superseded facts really gone: every re-crawled url carries
    # exactly one version in the merged fact table
    n_urls = (inc["triples_dc"].select("url").distinct().count())
    assert n_urls <= 30
    for c in inc["caches"]:
        c.unpersist()
