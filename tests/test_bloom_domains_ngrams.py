"""q65 Bloom pre-dedup, q66 frequent n-grams, q67 registered domains."""

import pyspark.sql.functions as F
import pytest

from tildener_spark.operators.dedup import bloom_prefilter
from tildener_spark.operators.textstats import frequent_ngrams
from tildener_spark.operators.urls import (
    domain_stats, registered_domain)


# ----------------------------------------------------------- q65 bloom

def _corpus(spark):
    held = spark.createDataFrame(
        [(i, f"held document number {i} with shared phrasing")
         for i in range(40)], ["doc_id", "text"])
    new = spark.createDataFrame(
        # 0-9: exact duplicates of held docs; 10-19: novel
        [(100 + i, f"held document number {i} with shared phrasing")
         for i in range(10)]
        + [(200 + i, f"completely novel text {i} {i * 7919}")
           for i in range(10)], ["doc_id", "text"])
    return held, new


def test_bloom_no_false_negatives(spark):
    held, new = _corpus(spark)
    out = {r["doc_id"]: r for r in
           bloom_prefilter(held, new).collect()}
    for i in range(10):  # every exact duplicate must be flagged
        assert out[100 + i]["maybe_dup"] is True
        assert out[100 + i]["n_hits"] == 4
    # novel docs: mostly clean at m=2^20, n=40 (FP rate ~1e-17)
    flagged_novel = [i for i in range(10) if out[200 + i]["maybe_dup"]]
    assert flagged_novel == []


def test_bloom_join_and_bitmap_paths_agree(spark):
    held, new = _corpus(spark)
    a = sorted(map(tuple, bloom_prefilter(
        held, new, via="bitmap").collect()))
    b = sorted(map(tuple, bloom_prefilter(
        held, new, via="join").collect()))
    assert a == b
    with pytest.raises(ValueError):
        bloom_prefilter(held, new, via="nope")


def test_bloom_small_m_has_false_positives_not_negatives(spark):
    held, new = _corpus(spark)
    out = {r["doc_id"]: r for r in
           bloom_prefilter(held, new, m=64, k=4).collect()}
    for i in range(10):  # saturation can't unset a duplicate's bits
        assert out[100 + i]["maybe_dup"] is True


# --------------------------------------------------------- q66 ngrams

def test_frequent_ngrams_df_vs_tf(spark):
    docs = spark.createDataFrame(
        [(1, "click here to subscribe click here to win"),
         (2, "click here to unsubscribe"),
         (3, "nothing in common at all")],
        ["doc_id", "text"])
    rows = frequent_ngrams(docs, n=3, k=5).collect()
    top = rows[0]
    assert top["ngram"] == "click here to"
    assert top["df"] == 2          # docs 1 and 2
    assert top["total_tf"] == 3    # twice in doc 1, once in doc 2
    assert top["rank"] == 1
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks)


def test_frequent_ngrams_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, "one"),
         (4, "exactly three words")],
        ["doc_id", "text"])
    rows = frequent_ngrams(docs, n=3, k=10).collect()
    assert [r["ngram"] for r in rows] == ["exactly three words"]


# -------------------------------------------------------- q67 domains

def test_registered_domain_psl_rules(spark):
    cases = [
        ("www.example.com", "example.com"),
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("a.b.c.github.io", "c.github.io"),
        ("someblog.blogspot.com", "someblog.blogspot.com"),
        ("blogspot.com", None),      # host IS a public suffix
        ("co.uk", None),
        ("localhost", None),          # no dot, no suffix
        ("10.0.0.1", None),           # IP: no listed suffix
        ("UPPER.Example.COM", "example.com"),
        ("deep.sub.domain.example.org", "example.org"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["host"])
    out = df.select("host",
                    registered_domain(F.col("host")).alias("d"))
    got = {r["host"]: r["d"] for r in out.collect()}
    for host, want in cases:
        assert got[host] == want, (host, got[host], want)


def test_domain_stats_rollup(spark):
    pages = spark.createDataFrame(
        [("https://www.shop.example.com/a", "x" * 10),
         ("https://m.shop.example.com/b", "x" * 20),
         ("http://example.com/c", "x" * 5),
         ("https://other.co.uk/d", "x" * 7)],
        ["url", "text"])
    rows = {r["domain"]: r for r in domain_stats(pages).collect()}
    assert rows["example.com"]["n_hosts"] == 3
    assert rows["example.com"]["n_pages"] == 3
    assert rows["example.com"]["total_chars"] == 35
    assert rows["other.co.uk"]["n_pages"] == 1
