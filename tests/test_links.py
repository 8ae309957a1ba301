"""Hyperlink extraction + host graph (operators/links.py)."""

from tildener_spark.operators.links import (
    extract_links, host_link_graph, host_of)

from pyspark.sql import functions as F

PAGES = [
    ("https://a.example.com/p1",
     '<html><body><a href="https://b.example.com/x">B x</a>'
     '<a href="https://b.example.com/x" rel="nofollow">again</a>'
     '<a href="https://B.EXAMPLE.COM/y">case host</a>'
     '<a href="mailto:me@example.com">mail</a>'
     '<a href="/relative">rel</a></body></html>'),
    ("https://a.example.com/p2",
     '<html><body><p>no links here</p></body></html>'),
    ("not a url",
     '<a href="https://c.example.com/">c</a>'),
]


def _pages(spark):
    return spark.createDataFrame(PAGES, "url string, html string")


def test_extract_links_rows(spark):
    out = extract_links(_pages(spark)).collect()
    # p1 contributes 5 tags, p2 none, bad-src page 1
    assert len(out) == 6
    by_src = {}
    for r in out:
        by_src.setdefault(r["src_url"], []).append(
            (r["dst_url"], r["anchor_text"]))
    assert len(by_src["https://a.example.com/p1"]) == 5
    assert ("https://b.example.com/x", "B x") in \
        by_src["https://a.example.com/p1"]
    assert ("/relative", "rel") in by_src["https://a.example.com/p1"]
    assert by_src["not a url"] == [("https://c.example.com/", "c")]


def test_extract_links_binary_html(spark):
    pages = _pages(spark).select(
        "url", F.encode("html", "UTF-8").alias("html"))
    assert extract_links(pages).count() == 6


def test_host_of(spark):
    df = spark.range(1).select(
        host_of(F.lit("https://A.Example.COM/x?q=1")).alias("a"),
        host_of(F.lit("http://h.io")).alias("b"),
        host_of(F.lit("mailto:x@y.z")).alias("c"),
        host_of(F.lit("/relative")).alias("d"))
    r = df.collect()[0]
    assert r["a"] == "a.example.com" and r["b"] == "h.io"
    assert r["c"] == "" and r["d"] == ""


def test_host_link_graph(spark):
    out = host_link_graph(extract_links(_pages(spark))).collect()
    edges = {(r["src_host"], r["dst_host"]):
             (r["n_links"], r["n_unique_dst"]) for r in out}
    # mailto + /relative dropped (no dst host); "not a url" src
    # dropped (no src host); host lowercased so b.example.com
    # collapses: 3 links, 2 distinct dst urls (x kept verbatim twice)
    assert edges == {("a.example.com", "b.example.com"): (3, 2)}
