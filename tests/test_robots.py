"""robots.txt parsing + crawl-allow filtering (operators/robots.py).

Covers the RFC 9309 surface the operator claims: group detection
(multi-UA runs, agent-scoped groups, pre-group lines), comment and
empty-rule handling, ``*`` wildcards, terminal ``$`` anchors,
longest-match precedence with the allow-beats-disallow tie, the
path+query match target, and robots-less hosts passing through
allowed.  The q49 DuckDB oracle replays the same pipeline end to end;
these tests pin the row-level semantics directly.
"""

import pytest

from pyspark.sql import functions as F

from tildener_spark.operators.robots import parse_robots, robots_filter

ROBOTS = "\n".join([
    "# banner comment before any group",
    "Sitemap: https://x.example/sitemap.xml",
    "User-agent: Googlebot",
    "Disallow: /google-only/",
    "",
    "user-AGENT: *",
    "User-agent: tildebot",
    "Disallow: /tmp/   # trailing comment",
    "Allow: /tmp/public*",
    "Disallow: /*.pdf$",
    "Disallow:",
    "Allow: /doc/",
    "Disallow: /doc/4",
    "Crawl-delay: 2",
])


def _rules(spark, txt=ROBOTS, host="h"):
    df = spark.createDataFrame([(host, txt)],
                               "host string, robots_txt string")
    return parse_robots(df)


def test_parse_star_group_rules(spark):
    got = {(r.verdict, r.rule)
           for r in _rules(spark).collect()}
    assert got == {
        ("disallow", "/tmp/"),
        ("allow", "/tmp/public*"),
        ("disallow", "/*.pdf$"),
        ("allow", "/doc/"),
        ("disallow", "/doc/4"),
    }


def test_parse_ignores_agent_scoped_group(spark):
    rules = {r.rule for r in _rules(spark).collect()}
    assert "/google-only/" not in rules


def test_parse_no_star_group_yields_no_rules(spark):
    txt = "User-agent: bingbot\nDisallow: /"
    assert _rules(spark, txt).count() == 0


def _verdicts(spark, paths, txt=ROBOTS):
    urls = spark.createDataFrame(
        [("https://h" + p,) for p in paths], "url string")
    out = robots_filter(urls, _rules(spark, txt))
    rows = {r.url: r for r in out.collect()}
    assert len(rows) == len(paths)
    return {p: rows["https://h" + p] for p in paths}


def test_match_semantics(spark):
    v = _verdicts(spark, [
        "/tmp/file1",          # Disallow /tmp/
        "/tmp/public/x",       # Allow /tmp/public* beats /tmp/
        "/report.pdf",         # anchored /*.pdf$
        "/report.pdf?dl=1",    # query breaks the $ anchor
        "/doc/12",             # Allow /doc/
        "/doc/4",              # longer Disallow /doc/4 wins
        "/elsewhere",          # no rule matches
    ])
    assert not v["/tmp/file1"].allowed
    assert v["/tmp/public/x"].allowed
    assert v["/tmp/public/x"].matched_rule == "/tmp/public*"
    assert not v["/report.pdf"].allowed
    assert v["/report.pdf?dl=1"].allowed
    assert v["/doc/12"].allowed
    assert not v["/doc/4"].allowed
    assert v["/doc/4"].matched_rule == "/doc/4"
    assert v["/elsewhere"].allowed
    assert v["/elsewhere"].matched_rule == ""
    assert v["/elsewhere"].verdict == ""


def test_allow_beats_disallow_on_equal_length(spark):
    txt = "\n".join([
        "User-agent: *",
        "Disallow: /",
        "Allow: /public",
        "Disallow: /public",
    ])
    v = _verdicts(spark, ["/public/post/1", "/private/1"], txt)
    assert v["/public/post/1"].allowed
    assert v["/public/post/1"].verdict == "allow"
    assert not v["/private/1"].allowed


def test_empty_path_matches_as_root(spark):
    txt = "User-agent: *\nDisallow: /"
    urls = spark.createDataFrame([("https://h",)], "url string")
    row = robots_filter(urls, _rules(spark, txt)).collect()[0]
    assert row.path == "/" and not row.allowed


def test_host_without_robots_is_allowed(spark):
    urls = spark.createDataFrame(
        [("https://unlisted.example/x",)], "url string")
    row = robots_filter(urls, _rules(spark)).collect()[0]
    assert row.allowed and row.matched_rule == ""


def test_like_metachars_in_rule_are_literal(spark):
    # %, _ and \ inside a robots path must not act as LIKE wildcards
    txt = "User-agent: *\nDisallow: /a%b_c\\d"
    v = _verdicts(spark, ["/a%b_c\\d/e", "/aXbYc/e"], txt)
    assert not v["/a%b_c\\d/e"].allowed
    assert v["/aXbYc/e"].allowed


def test_no_udf_in_plan(spark):
    urls = spark.createDataFrame([("https://h/x",)], "url string")
    plan = robots_filter(urls, _rules(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
