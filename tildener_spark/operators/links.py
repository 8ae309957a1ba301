"""Hyperlink extraction and the host-level web graph.

Crawl pipelines consume the link structure as much as the text: the
outlink list drives frontier scheduling, and the host graph feeds
centrality (host PageRank as a quality prior — the original web-scale
use of the algorithm) and spam-cluster detection.  The reference has
no link stage (it assumes curated corpora); this is part of the
web-crawl operator family alongside urls.py.

Everything is built-in JVM regex (``regexp_extract_all`` /
``regexp_extract``) inside whole-stage codegen — no Python in the hot
path.  Patterns are kept to the common Java/RE2 subset so the DuckDB
oracle runs the identical expressions (the urls.py discipline).

Scale shape: extraction is a per-row flatMap (zero shuffle); the host
rollup is one partial-agg shuffle keyed by (src_host, dst_host) —
mega-host fanout is absorbed map-side exactly like urls.host_stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one <a> tag: double-quoted href, optional extra attributes, then
# flat (tag-free) anchor text up to the closing </a>
_A_TAG = r'<a href="[^"]*"[^>]*>[^<]*</a>'
_HREF = r'href="([^"]*)"'
_ANCHOR = r">([^<]*)<"
_HOST = r"^https?://([^/?#]+)"


def host_of(col: Column) -> Column:
    """scheme://host[/...] -> lowercased host ('' if not a url)."""
    return F.lower(F.regexp_extract(col, _HOST, 1))


def extract_links(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Pages -> one row per ``<a href="...">`` tag:
    (src_url, dst_url, anchor_text).

    ``html_col`` may be binary (WARC payload) or string; pages with
    no links contribute no rows (explode, not explode_outer — the
    outlink table is sparse by nature and consumers join on src)."""
    tags = F.expr(
        f"regexp_extract_all(cast({html_col} as string), "
        f"'{_A_TAG}', 0)")
    return (
        pages.select(F.col(url_col).alias("src_url"),
                     F.explode(tags).alias("tag"))
        .select(
            "src_url",
            F.regexp_extract("tag", _HREF, 1).alias("dst_url"),
            F.regexp_extract("tag", _ANCHOR, 1).alias("anchor_text"))
    )


def host_link_graph(links: DataFrame) -> DataFrame:
    """Outlink rows -> host-level edge list:
    (src_host, dst_host, n_links, n_unique_dst).

    Self-edges (intra-host navigation) are kept — consumers decide;
    rows whose src or dst fails to parse as a url are dropped."""
    hosted = links.select(
        host_of(F.col("src_url")).alias("src_host"),
        host_of(F.col("dst_url")).alias("dst_host"),
        "dst_url",
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    return (
        hosted.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"),
             F.countDistinct("dst_url").alias("n_unique_dst"))
    )
