"""robots.txt parsing + crawl-allow filtering (RFC 9309).

A crawl-side companion to the frontier scheduler (operators/links.py
crawl_frontier): before a frontier URL is fetched it must clear the
target host's robots exclusion rules.  The reference has no crawler
(its corpus arrives as a directory, ProcessDirectory.pl:55-73); this
is part of the beyond-reference web-scale ingestion surface.

Both stages are pure DataFrame ops (window functions + LIKE), so the
whole parse→group→match pipeline has an exact DuckDB oracle (q49)
and stays inside whole-stage codegen — no UDF.

Semantics implemented (RFC 9309, the parts that affect matching):
  * groups = maximal runs of ``User-agent:`` lines followed by their
    rules; lines before the first group are ignored; comments (#…)
    stripped; field names case-insensitive;
  * this engine evaluates the generic-agent view (groups whose agent
    set contains ``*``) — a product-token-specific view is the same
    filter with a different agent literal;
  * empty Allow/Disallow values match nothing (dropped);
  * rule paths support ``*`` wildcards and a terminal ``$`` anchor;
  * precedence: longest rule wins; on a tie Allow beats Disallow;
  * no applicable group or no matching rule → allowed.

Scale shape: the rules table is hosts × rules (tiny next to pages) —
Spark broadcasts it into the URL join; the match predicate is a LIKE
against the translated pattern, evaluated host-locally.  Per-host
rule-count skew is bounded by real robots.txt sizes (the RFC caps
parse obligation at 500 KiB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# the pinned Java∩RE2 whitespace class (see operators/dedup.py WS)
_WS = r" \t\n\x0b\f\r"


def parse_robots(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """robots.txt text per host → (host, verdict, rule) rule table.

    ``verdict`` is ``allow``/``disallow``; only rules from groups
    applying to ``*`` survive; empty-valued rules are dropped.
    """
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(txt_col), "\n"))
            .alias("idx", "raw"))
        .withColumn("line", F.trim(F.regexp_replace("raw", "#.*$", "")))
        .withColumn("field", F.lower(F.regexp_extract(
            "line", rf"^([A-Za-z-]+)[{_WS}]*:", 1)))
        .withColumn("value", F.trim(F.regexp_extract(
            "line", rf"^[A-Za-z-]+[{_WS}]*:[{_WS}]*(.*)$", 1)))
    )
    w = Window.partitionBy("host").orderBy("idx")
    grouped = (
        lines
        .withColumn("is_ua", (F.col("field") == "user-agent").cast("int"))
        .withColumn("run_start", (
            (F.col("is_ua") == 1)
            & (F.coalesce(F.lag("is_ua").over(w), F.lit(0)) == 0)
        ).cast("int"))
        .withColumn("grp", F.sum("run_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    star_groups = (
        grouped
        .filter((F.col("is_ua") == 1) & (F.lower("value") == "*"))
        .select("host", "grp").distinct()
    )
    return (
        grouped
        .filter(F.col("field").isin("allow", "disallow")
                & (F.col("value") != "") & (F.col("grp") >= 1))
        .join(star_groups, ["host", "grp"])
        .select("host", F.col("field").alias("verdict"),
                F.col("value").alias("rule"))
        .distinct()
    )


def _like_pattern(rule):
    """robots rule → SQL LIKE pattern (escape ``\\``): ``*`` becomes
    ``%``; a terminal ``$`` anchors (no trailing ``%``)."""
    anchored = rule.like("%$")
    body = F.when(anchored, F.expr(
        "substr(rule, 1, length(rule) - 1)")).otherwise(rule)
    esc = F.replace(
        F.replace(
            F.replace(body, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"), F.lit("\\%")),
        F.lit("_"), F.lit("\\_"))
    pat = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.concat(pat, F.when(anchored, F.lit("")).otherwise(F.lit("%")))


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Apply parsed rules to URLs → one verdict row per URL.

    Output: (url, host, path, matched_rule, verdict, allowed) where
    matched_rule/verdict are '' for unmatched URLs (allowed=true).
    The match runs on path+query (RFC 9309 §2.2.2), '' → '/'.
    """
    u = urls.select(
        F.col(url_col).alias("url"),
        F.lower(F.regexp_extract(url_col, r"^https?://([^/?#]+)", 1))
        .alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col,
                                      r"^https?://[^/?#]+([^#]*)", 1),
                     F.lit("")),
            F.lit("/")).alias("path"),
    )
    r = rules.select(
        "host", "verdict", "rule", _like_pattern(F.col("rule"))
        .alias("pattern"))
    cand = (
        u.join(F.broadcast(r), "host")
        .filter(F.expr("path like pattern escape '\\\\'"))
    )
    pick = Window.partitionBy("url").orderBy(
        F.length("rule").desc(),
        F.when(F.col("verdict") == "allow", 0).otherwise(1),
        F.col("rule"))
    best = (
        cand.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select("url", F.col("rule").alias("matched_rule"), "verdict")
    )
    return (
        u.join(best, "url", "left")
        .select(
            "url", "host", "path",
            F.coalesce("matched_rule", F.lit("")).alias("matched_rule"),
            F.coalesce("verdict", F.lit("")).alias("verdict"),
            (F.coalesce("verdict", F.lit("allow")) != "disallow")
            .alias("allowed"))
    )
