"""Adversarial-skew guard tests: the bucket/df caps must FIRE on a
hostile corpus (and be observable), not merely exist in the plan.

Companion to scripts/skew_bench.py, which measures wall-time ratios
at bench scale; here we assert the guard SEMANTICS at test scale:
  * the LSH vocabulary bucket cap drops the colliding near-identical
    surfaces and reports it through the observe() counters;
  * doc-level minhash pair generation stays bounded when 2% of the
    corpus is byte-identical;
  * the n-gram document-frequency cap removes a universal shingle
    from the join key space entirely.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from tildener_spark.config import EngineConfig
from tildener_spark.datagen import gazetteer_df, pages_df
from tildener_spark.plans.pipeline import run_pipeline


def _skewed(spark, n=600):
    sys.path.insert(0, "scripts")
    from skew_bench import skew_corpus
    return skew_corpus(pages_df(spark, n))


def test_lsh_bucket_guard_fires_and_is_observable(spark):
    pages = _skewed(spark)
    gaz = gazetteer_df(spark)
    res = run_pipeline(spark, pages, gaz, EngineConfig(url_dedup=True))
    n = res.canonical_triples.count()
    assert n > 0
    guard = res.counters["lsh_bucket_guard"]
    # every doc contributed a distinct "SIA Megabanka<num>" surface;
    # their bands collide into buckets far above the cap, so the
    # guard must have dropped rows and said so
    assert guard["rows_dropped"] > 0, guard
    assert guard["buckets_dropped_approx"] > 0, guard
    assert guard["rows_dropped"] < guard["rows_total"], guard
    for h in res.extra.get("caches", []):
        h.unpersist()


def test_lsh_bucket_guard_silent_on_uniform_corpus(spark):
    pages = pages_df(spark, 300)
    gaz = gazetteer_df(spark)
    res = run_pipeline(spark, pages, gaz, EngineConfig())
    res.canonical_triples.count()
    guard = res.counters["lsh_bucket_guard"]
    assert guard["rows_dropped"] == 0, guard
    for h in res.extra.get("caches", []):
        h.unpersist()


def test_doc_minhash_pairs_bounded_under_identical_flood(spark):
    from tildener_spark.operators.dedup import minhash_lsh_pairs
    pages = _skewed(spark, 600)
    # 12 identical cookie-wall docs (600/50): with the cap at
    # max_bucket=8 < 12, the flood bucket is dropped entirely and the
    # identical docs contribute ZERO candidate pairs — bounded, and
    # exactly the behaviour the docstring promises (oversized buckets
    # carry no discriminative signal; exact dedup catches them)
    cookie = {
        r["url"] for r in pages.filter(
            F.regexp_extract("url", r"(?:doc|page)/0*([0-9]+)$", 1)
            .cast("long") % 50 == 0).select("url").collect()}
    assert len(cookie) >= 10

    def cookie_pairs(max_bucket):
        p = minhash_lsh_pairs(pages, "url", "text",
                              max_bucket=max_bucket)
        return p.filter(F.col("doc_a").isin(cookie)
                        & F.col("doc_b").isin(cookie)).count()

    # cap below the flood size: the identical docs' bucket is dropped
    # wholesale, so they contribute ZERO candidate pairs (exact dedup
    # is the pass that catches byte-identical floods)
    assert cookie_pairs(8) == 0
    # cap above the flood size: the same bucket yields all C(n,2)
    # flood pairs — proving it was the guard, not luck, that bounded
    # the capped run
    n = len(cookie)
    assert cookie_pairs(10_000) == n * (n - 1) // 2


def test_ngram_df_cap_removes_universal_shingle(spark):
    from tildener_spark.operators.dedup import ngram_jaccard_pairs
    pages = _skewed(spark, 400).filter(
        ~F.col("text").startswith("Šī vietne"))  # drop exact dups
    # the universal sentence is in every doc; with max_df far below
    # the corpus size its shingles leave the join key space, so the
    # join completes and near-identical-only pairs survive
    out = ngram_jaccard_pairs(pages, "url", "text", n=3,
                              threshold=0.8, max_df=50)
    assert out.count() == 0  # docs differ beyond the shared suffix
