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


def test_anchor_text_stats(spark):
    from tildener_spark.operators.links import anchor_text_stats
    links = spark.createDataFrame(
        [("https://a.io/1", "https://t.io/x", "Acme"),
         ("https://a.io/2", "https://t.io/x", "Acme"),
         ("https://b.io/1", "https://t.io/x", "Acme Corp"),
         ("https://b.io/2", "https://t.io/y", ""),
         ("https://b.io/3", "https://t.io/y", "")],
        "src_url string, dst_url string, anchor_text string")
    out = {r["dst_url"]: r for r in anchor_text_stats(links).collect()}
    x = out["https://t.io/x"]
    assert (x["n_refs"], x["n_src_hosts"]) == (3, 2)
    assert (x["top_anchor"], x["top_anchor_refs"]) == ("Acme", 2)
    y = out["https://t.io/y"]  # only empty anchors -> ('', 0)
    assert (y["n_refs"], y["n_src_hosts"]) == (2, 1)
    assert (y["top_anchor"], y["top_anchor_refs"]) == ("", 0)


def test_host_pagerank_drops_self_edges(spark):
    from tildener_spark.operators.links import host_pagerank
    # a.io links to itself heavily and to b.io once; b.io -> a.io.
    # With self-edges dropped this is a symmetric 2-cycle: equal rank.
    hg = spark.createDataFrame(
        [("a.io", "a.io", 100, 50), ("a.io", "b.io", 1, 1),
         ("b.io", "a.io", 1, 1)],
        "src_host string, dst_host string, n_links long, "
        "n_unique_dst long")
    ranks = {r["host"]: r["rank"] for r in host_pagerank(hg).collect()}
    assert set(ranks) == {"a.io", "b.io"}
    assert ranks["a.io"] == ranks["b.io"] == 0.5


def test_crawl_frontier(spark):
    from tildener_spark.operators.links import crawl_frontier
    links = spark.createDataFrame(
        # a.io/1 is crawled (appears as src); a.io/2 and a.io/3 are
        # frontier with 2 and 1 inlinks; mailto has no host
        [("https://a.io/1", "https://a.io/2", "x"),
         ("https://b.io/1", "https://a.io/2", "x"),
         ("https://b.io/1", "https://a.io/3", "x"),
         ("https://b.io/1", "https://a.io/1", "seen"),
         ("https://b.io/1", "mailto:x@y.z", "m")],
        "src_url string, dst_url string, anchor_text string")
    ranks = spark.createDataFrame(
        [("a.io", 0.625)], "host string, rank double")
    out = crawl_frontier(links, ranks, per_host=1).collect()
    # per_host=1 keeps only the best frontier url of a.io
    assert len(out) == 1
    r = out[0]
    assert r["host"] == "a.io" and r["dst_url"] == "https://a.io/2"
    assert r["n_refs"] == 2 and r["host_rank"] == 0.625
    assert r["priority"] == 1

    # without the cap: a.io/3 surfaces at priority 2, and its
    # host_rank defaults to 0.0 when the host is missing from ranks
    out2 = {r["dst_url"]: r for r in crawl_frontier(
        links, ranks.filter("host <> 'a.io'"), per_host=10).collect()}
    assert set(out2) == {"https://a.io/2", "https://a.io/3"}
    assert out2["https://a.io/3"]["priority"] == 2
    assert out2["https://a.io/2"]["host_rank"] == 0.0


def test_host_link_graph(spark):
    out = host_link_graph(extract_links(_pages(spark))).collect()
    edges = {(r["src_host"], r["dst_host"]):
             (r["n_links"], r["n_unique_dst"]) for r in out}
    # mailto + /relative dropped (no dst host); "not a url" src
    # dropped (no src host); host lowercased so b.example.com
    # collapses: 3 links, 2 distinct dst urls (x kept verbatim twice)
    assert edges == {("a.example.com", "b.example.com"): (3, 2)}
