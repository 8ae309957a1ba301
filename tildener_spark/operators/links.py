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

from pyspark.sql import Column, DataFrame, Window, functions as F

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


def anchor_text_stats(links: DataFrame) -> DataFrame:
    """Per-target anchor-text profile — the classic web-IR signal
    (anchor text describes the TARGET document, often better than the
    target's own text; feeds retrieval and entity aliasing).

    Output per dst_url: ``n_refs`` (inlink count), ``n_src_hosts``
    (distinct referring hosts — the spam-resistant popularity form),
    ``top_anchor`` / ``top_anchor_refs`` (most frequent NON-EMPTY
    anchor text, ties broken lexicographically; ''/0 when every
    anchor is empty).

    Scale shape: one (dst_url, anchor) partial-agg shuffle + a window
    over each dst's distinct anchors (bounded by its inlink count),
    and one dst_url-keyed rollup — no url x url blowup anywhere.
    """
    per_anchor = (
        links.filter(F.col("anchor_text") != "")
        .groupBy("dst_url", "anchor_text")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("dst_url").orderBy(
        F.col("n").desc(), F.col("anchor_text").asc())
    top = (
        per_anchor.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("dst_url", F.col("anchor_text").alias("top_anchor"),
                F.col("n").alias("top_anchor_refs"))
    )
    totals = links.groupBy("dst_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_refs"),
        F.countDistinct(host_of(F.col("src_url")))
        .alias("n_src_hosts"),
    )
    return totals.join(top, "dst_url", "left").select(
        "dst_url", "n_refs", "n_src_hosts",
        F.coalesce("top_anchor", F.lit("")).alias("top_anchor"),
        F.coalesce("top_anchor_refs", F.lit(0).cast("long"))
        .alias("top_anchor_refs"),
    )


def host_pagerank(host_graph: DataFrame, iterations: int = 5,
                  damping: float = 0.85,
                  quantize: int = 9) -> DataFrame:
    """Host-quality PageRank over the :func:`host_link_graph` edge
    list -> (host, rank) — the original web-scale use of the
    algorithm, consumed here as a crawl-priority / quality prior.

    Self-edges (intra-host navigation) are dropped first: they only
    recycle a host's own mass and would let boilerplate nav bars
    inflate the prior.  Delegates to ``graphstats.weighted_pagerank``
    (same quantized, engine-replayable fixpoint as the entity-salience
    ranking), weighted by ``n_links``.
    """
    from tildener_spark.operators.graphstats import weighted_pagerank

    edges = (
        host_graph.filter(F.col("src_host") != F.col("dst_host"))
        .select(F.col("src_host").alias("src"),
                F.col("dst_host").alias("dst"), "n_links")
    )
    pr = weighted_pagerank(edges, "n_links", iterations, damping,
                           quantize)
    return pr.select(F.col("node").alias("host"), "rank")


def crawl_frontier(links: DataFrame, host_ranks: DataFrame,
                   per_host: int = 10) -> DataFrame:
    """Rank the uncrawled frontier: http(s) dst urls never seen as a
    src, scored by inlink count and capped per host (politeness — a
    scheduler drains hosts round-robin, so the per-host top-k IS the
    useful shape; it also bounds mega-host fanout exactly like the
    2-hop top-k guard in graphstats).

    Output: (host, dst_url, n_refs, host_rank, priority) where
    priority is the 1-based rank within the host by (n_refs desc,
    dst_url) and host_rank is the :func:`host_pagerank` prior
    (0.0 for hosts never seen as a link target of a parsed src —
    left join keeps the frontier complete).

    Scale shape: one dst_url partial agg, one url-keyed anti-join
    against the fetched set, a broadcast-sized host-rank join (hosts
    « urls), one per-host window.
    """
    fetched = links.select(F.col("src_url").alias("dst_url")) \
        .distinct()
    cand = (
        links.withColumn("host", host_of(F.col("dst_url")))
        .filter(F.col("host") != "")
        .groupBy("host", "dst_url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
        .join(fetched, "dst_url", "left_anti")
    )
    scored = cand.join(host_ranks, "host", "left").select(
        "host", "dst_url", "n_refs",
        F.coalesce("rank", F.lit(0.0)).alias("host_rank"),
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_refs").desc(), F.col("dst_url").asc())
    return (
        scored.withColumn("priority", F.row_number().over(w))
        .filter(F.col("priority") <= per_host)
    )
