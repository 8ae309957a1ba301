"""URL canonicalization, URL-level dedup, per-host rollup
(operators/urls.py; webtext crawl preprocessing, no reference
counterpart — TildeNER consumes staged files,
ProcessDirectory.pl:28-40)."""

import datetime

from pyspark.sql import functions as F

from tildener_spark.operators.urls import (
    dedup_urls, host_stats, normalize_url)


def _norm(spark, url):
    return spark.range(1).select(
        normalize_url(F.lit(url)).alias("n")).collect()[0]["n"]


def test_normalize_url_cases(spark):
    assert _norm(spark, "https://www.Example.COM/a/b/") == \
        "example.com/a/b"
    assert _norm(spark, "HTTP://example.com/a?utm_source=1#frag") == \
        "example.com/a"
    assert _norm(spark, "https://example.com///") == "example.com"
    # path case preserved (RFC 3986: only scheme/host case-insensitive)
    assert _norm(spark, "https://EXAMPLE.com/CaseSensitive") == \
        "example.com/CaseSensitive"
    # scheme-less input passes through the scheme strip unharmed
    assert _norm(spark, "www.example.com/x") == "example.com/x"
    # content-bearing query params are PRESERVED (?id=1 != ?id=2)
    assert _norm(spark, "https://example.com/p?id=1") == \
        "example.com/p?id=1"
    assert _norm(spark, "https://example.com/p?id=2") == \
        "example.com/p?id=2"
    # only known tracking params are stripped, in any position
    assert _norm(
        spark,
        "https://example.com/p?utm_source=f&id=1&fbclid=x&gclid=y"
    ) == "example.com/p?id=1"
    assert _norm(spark, "https://example.com/p?id=1&utm_campaign=c") \
        == "example.com/p?id=1"
    # query directly after the authority: host still lowercases
    assert _norm(spark, "https://EXAMPLE.com?q=A") == "example.com?q=A"
    # trailing path slash strips before a kept query too
    assert _norm(spark, "https://example.com/p/?id=1") == \
        "example.com/p?id=1"


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string")


def test_dedup_urls_keeps_earliest(spark):
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    t1 = datetime.datetime(2026, 1, 1, 1, 0, 0)
    d = _pages(spark, [
        ("https://a.com/x", t1, "later", "en"),
        ("http://www.A.com/x/", t0, "earliest", "en"),
        ("https://a.com/x?utm_source=f", t1, "later2", "en"),
        ("https://b.com/y", t0, "solo", "de"),
    ])
    out = {r["norm_url"]: r for r in dedup_urls(d).collect()}
    # n_dups = dropped variants, NOT group size: 3 fetches -> 2 dups
    assert out["a.com/x"]["n_dups"] == 2
    assert out["a.com/x"]["kept_url"] == "http://www.A.com/x/"
    assert out["b.com/y"]["n_dups"] == 0


def test_host_stats(spark):
    t0 = datetime.datetime(2026, 1, 1)
    d = _pages(spark, [
        ("https://a.com/1", t0, "xx", "en"),
        ("https://a.com/2", t0, "yyy", "de"),
        ("https://B.com/1", t0, "z", "en"),
    ])
    out = {r["host"]: r for r in host_stats(d).collect()}
    assert out["a.com"]["n_pages"] == 2
    assert out["a.com"]["total_chars"] == 5
    assert out["a.com"]["n_langs"] == 2
    assert out["b.com"]["n_pages"] == 1


def test_cap_per_host(spark):
    """Budget cap: deterministic md5 rank, exactly k kept on hosts
    over budget, all kept under it, and the kept set is stable
    across repartitionings."""
    from tildener_spark.operators.urls import cap_per_host
    rows = ([(f"https://big.example.lv/p/{i}",) for i in range(9)]
            + [(f"https://small.example.lv/p/{i}",) for i in range(3)])
    pages = spark.createDataFrame(rows, "url string")
    out = cap_per_host(pages, k=5).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["big.example.lv"]) == 9
    assert sum(r["kept"] for r in by_host["big.example.lv"]) == 5
    assert all(r["kept"] for r in by_host["small.example.lv"])
    ranks = sorted(r["host_rank"] for r in by_host["big.example.lv"])
    assert ranks == list(range(1, 10))
    # determinism under adversarial partitioning
    again = cap_per_host(pages.repartition(7), k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_recrawl_drift(spark):
    """u1: 3 fetches, 1 change (A->A->B); u2: 2 fetches, unchanged;
    u3: single fetch (never revisited).  u1/u2 share a host."""
    from datetime import datetime

    from tildener_spark.operators.urls import recrawl_drift

    t = datetime(2026, 1, 1)
    rows = [
        ("https://a.example.com/u1", t.replace(day=1), "A"),
        ("https://a.example.com/u1", t.replace(day=2), "A"),
        ("https://a.example.com/u1", t.replace(day=3), "B"),
        ("https://a.example.com/u2", t.replace(day=1), "X"),
        ("https://a.example.com/u2", t.replace(day=2), "X"),
        ("https://solo.example.org/u3", t.replace(day=1), "Z"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string")
    got = {r["host"]: r for r in recrawl_drift(df).collect()}
    a = got["a.example.com"]
    assert (a["n_urls"], a["n_fetches"], a["n_revisits"],
            a["n_changes"]) == (2, 5, 3, 1)
    assert a["change_rate"] == round(1 / 3, 6)
    s = got["solo.example.org"]
    assert (s["n_urls"], s["n_fetches"], s["n_revisits"],
            s["n_changes"]) == (1, 1, 0, 0)
    assert s["change_rate"] == 0.0
