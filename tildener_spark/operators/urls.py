"""URL canonicalization + exact URL-level dedup for web crawls.

Not in the reference (TildeNER consumes a staged directory of files,
ProcessDirectory.pl:28-40); at CommonCrawl scale the same page is
fetched under many URL spellings (scheme casing, ``www.`` prefix,
tracking query params, fragments, trailing slashes) and URL-level
dedup is the cheapest first pass — it needs no content comparison at
all, only a canonical key.

Everything is built-in ``regexp_replace``/``regexp_extract`` (RE2-
compatible patterns so the DuckDB oracle runs the identical chain);
the only shuffle is the window over the canonical key, whose groups
are duplicate-spelling sets (tiny, bounded by crawler politeness), so
skew is structurally impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# Known tracking query parameters (and ONLY these) are removed from
# the canonical key: utm_* (Google Analytics campaign tags), fbclid
# (Facebook click id), gclid (Google Ads click id).  Every other
# parameter is content-bearing until proven otherwise (?id=1 vs ?id=2,
# pagination, search terms) and stays in the key.
_TRACKING = r"(?:utm_[^=&]*|fbclid|gclid)"


def _strip_url(col):
    """Fragment / tracking-param / scheme removal — the shared prefix
    of the canonicalization.  Both the host and the path derive from
    this regexp chain, so DataFrame operators stage it as its OWN
    column before splitting (dedup.word_tokens staging discipline; the
    plan audit flags the unstaged form as DUP-EXPR).

    The query string is kept except for the known tracking params:
    first drop every ``&tracking=...`` (global), then a leading
    ``?tracking=...&`` collapses to ``?``, then a lone ``?tracking=...``
    disappears entirely.  All patterns are RE2-compatible so the DuckDB
    oracle runs the identical chain."""
    u = F.regexp_replace(col, r"#.*$", "")
    u = F.regexp_replace(u, rf"&{_TRACKING}=[^&]*", "")
    u = F.regexp_replace(u, rf"\?{_TRACKING}=[^&]*&", "?")
    u = F.regexp_replace(u, rf"\?{_TRACKING}=[^&]*$", "")
    return F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")


def _canonical_from_stripped(u):
    """host/path split + host normalization over an already-staged
    stripped-URL column.  The host ends at the first ``/`` or ``?``
    (a query can follow the authority directly); trailing slashes are
    stripped both at end-of-URL and immediately before the query."""
    host = F.regexp_extract(u, r"^([^/?]*)", 1)
    path = F.regexp_replace(u, r"^[^/?]*", "")
    return F.concat(
        F.regexp_replace(F.lower(host), r"^www\.", ""),
        F.regexp_replace(
            F.regexp_replace(path, r"/+\?", "?"), r"/+$", ""),
    )


def normalize_url(col):
    """Canonical URL key: drop the fragment, drop known tracking query
    params (``utm_*``, ``fbclid``, ``gclid``) but KEEP the rest of the
    query string, drop the scheme, lowercase the authority and strip a
    leading ``www.``, strip trailing slashes from the path.

    Conservative by design: path case and all non-tracking params are
    preserved (paths are case-sensitive per RFC 3986 and
    ``?id=1`` / ``?id=2`` are different pages; only the host/scheme
    are case-insensitive).

    One-expression form (re-runs the strip chain for host and path);
    inside operators prefer staging ``_strip_url`` as a column and
    applying ``_canonical_from_stripped`` to it."""
    return _canonical_from_stripped(_strip_url(col))


def dedup_urls(pages: DataFrame, url_col: str = "url",
               ts_col: str = "warc_ts") -> DataFrame:
    """Exact URL dedup: one row per canonical URL, keeping the
    earliest fetch (ties broken by raw URL string, deterministic).

    Returns (norm_url, kept_url, n_dups) where n_dups counts the
    DROPPED spelling variants — a URL fetched once reports
    n_dups = 0."""
    w = Window.partitionBy("norm_url").orderBy(
        F.asc(ts_col), F.asc(url_col))
    ranked = pages.select(
        _strip_url(F.col(url_col)).alias("_u3"),
        F.col(url_col), F.col(ts_col),
    ).select(
        _canonical_from_stripped(F.col("_u3")).alias("norm_url"),
        url_col, ts_col,
    ).withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("norm_url")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col(url_col)))
            .alias("kept_url"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dups"),
        )
    )


def keep_canonical_urls(pages: DataFrame, url_col: str = "url",
                        ts_col: str = "warc_ts") -> DataFrame:
    """Pipeline pre-filter form of :func:`dedup_urls`: keep only the
    earliest fetch per canonical URL, preserving the input schema.

    When ``ts_col`` is absent the raw URL string is the sole order
    key (still deterministic).  Same shuffle shape as dedup_urls —
    one window over the canonical key with spelling-variant-sized
    groups."""
    order = ([F.asc(ts_col)] if ts_col in pages.columns else []) + \
        [F.asc(url_col)]
    staged = pages.withColumn("_u3", _strip_url(F.col(url_col))) \
        .withColumn("_norm", _canonical_from_stripped(F.col("_u3")))
    w = Window.partitionBy("_norm").orderBy(*order)
    return (
        staged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_u3", "_norm", "_rn")
    )


def cap_per_host(pages: DataFrame, k: int = 1000,
                 url_col: str = "url") -> DataFrame:
    """Per-host crawl budget: label each page with its deterministic
    within-host rank and whether it survives a keep-at-most-``k``
    cap — the standard anti-domination rule when one host contributes
    a disproportionate slice of the crawl (C4/Gopher-style corpus
    hygiene).

    The rank orders by ``md5(url)`` (url as tiebreak), so the kept
    subset is a stable uniform sample of the host's pages — not
    crawl-order-biased — and reproducible across runs and partitions.
    Output: (url, host, host_rank, kept); join ``kept`` back or
    filter on it.

    Scale shape: one shuffle on host for the window.  The window
    sorts each host's rows, and the head host is bounded by crawl
    politeness budgets; for a pathological mega-host, pre-filter by
    an md5 threshold (keep md5(url) < t with t sized so expected
    survivors per host >= k) to bound the window input — the rank
    order is the SAME md5, so the pre-filter never changes the kept
    set as long as it passes >= k rows per host."""
    host = F.lower(F.regexp_extract(
        F.regexp_replace(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^([^/]*)", 1))
    w = Window.partitionBy("host").orderBy(F.md5(url_col), url_col)
    return (
        pages.select(F.col(url_col).alias("url"), host.alias("host"))
        .withColumn("host_rank",
                    F.row_number().over(w).cast("bigint"))
        .withColumn("kept", F.col("host_rank") <= k)
    )


def host_stats(pages: DataFrame, url_col: str = "url",
               text_col: str = "text",
               lang_col: str = "lang") -> DataFrame:
    """Per-host crawl rollup: page count, total extracted chars,
    distinct languages.  One partial-aggregating shuffle on host;
    host cardinality is web-scale-friendly (the head host is bounded
    by crawl politeness budgets, and partial aggregation absorbs what
    skew remains)."""
    host = F.lower(F.regexp_extract(
        F.regexp_replace(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^([^/]*)", 1))
    return (
        pages.select(
            host.alias("host"),
            F.length(F.col(text_col)).cast("long").alias("_chars"),
            F.col(lang_col).alias("_lang"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.sum("_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("_lang").cast("bigint").alias("n_langs"),
        )
    )


# Public-suffix subset used by registered_domain.  The real PSL is
# ~9k rules maintained by Mozilla; a production deployment loads the
# full list the same way (it is a literal expression table either
# way — the when-chain below is what a broadcast map lookup compiles
# to for a list this small).  Multi-label suffixes MUST sort before
# their parent TLD so the longest match wins.
PUBLIC_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "net.br", "co.in", "co.nz",
    "github.io", "blogspot.com",
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "ai", "dev", "app", "info", "biz",
    "uk", "de", "fr", "jp", "au", "br", "in", "nz",
    "lv", "lt", "ee", "ru", "pl", "nl", "se", "it", "es",
]


def registered_domain(host_col):
    """Registered (pay-level) domain of a host per the public-suffix
    rules: the label immediately left of the longest matching public
    suffix, plus the suffix.  Hosts that ARE a bare suffix, IPs, or
    hosts with no dot return NULL (no registrable domain).

    Expression-only (anchored regexp per suffix, longest-first
    coalesce) — zero shuffle, whole-stage codegen, and an exact SQL
    mirror for the oracle."""
    h = F.lower(host_col)
    candidates = [
        F.nullif(F.regexp_extract(
            h, r"([^.]+\." + suffix.replace(".", r"\.") + r")$", 1),
            F.lit(""))
        for suffix in PUBLIC_SUFFIXES]
    # a host that IS a public suffix has no registrable domain
    # (e.g. 'blogspot.com' must not resolve via the plain 'com' rule)
    return F.when(h.isin(PUBLIC_SUFFIXES),
                  F.lit(None).cast("string")).otherwise(
        F.coalesce(*candidates, F.lit(None).cast("string")))


def domain_stats(pages: DataFrame, url_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Per-registered-domain crawl rollup: distinct hosts, pages,
    total chars.  The domain is the right granularity for crawl
    budgets and source-quality decisions (one site = many hosts:
    www/m/cdn/lang subdomains); host_stats alone over-fragments.

    Scale shape: the domain is a map-side expression over the host,
    so this stays ONE partial-aggregating shuffle exactly like
    host_stats; suffix matching never fans out rows."""
    host = F.lower(F.regexp_extract(
        F.regexp_replace(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^([^/?]*)", 1))
    return (
        pages.select(
            host.alias("host"),
            F.length(F.col(text_col)).cast("long").alias("_chars"))
        .withColumn("domain", registered_domain(F.col("host")))
        .groupBy("domain")
        .agg(F.countDistinct("host").cast("bigint").alias("n_hosts"),
             F.count(F.lit(1)).cast("bigint").alias("n_pages"),
             F.sum("_chars").cast("bigint").alias("total_chars")))


def recrawl_drift(crawl: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  text_col: str = "text") -> DataFrame:
    """Per-host content-drift rate across crawl snapshots — the
    recrawl-scheduling signal (Cho & Garcia-Molina 2003): hosts whose
    pages change between fetches deserve a shorter revisit interval.

    A *revisit* is any fetch of a url after its first; a revisit is a
    *change* when its content fingerprint (md5 of the text) differs
    from the previous fetch's.  Output per host:

    (host, n_urls, n_fetches, n_revisits, n_changes, change_rate)

    with ``change_rate = round(n_changes / n_revisits, 6)`` (0.0 for
    hosts never revisited — one IEEE division of bigints, so the
    DuckDB replay hashes identically).

    Scale shape: one shuffle on url for the lag window (groups are
    revisit-count-sized — a url's fetch history, bounded by crawl
    frequency, never corpus-sized), then one partial-agg shuffle on
    host.  Ties on ``ts`` are broken by the fingerprint so the lag
    order is total and partition-independent.
    """
    host = F.lower(F.regexp_extract(
        F.regexp_replace(url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^([^/?]*)", 1))
    fp = F.md5(F.col(text_col))
    w = Window.partitionBy("url").orderBy("ts", "fp")
    per_fetch = (
        crawl
        .select(F.col(url_col).alias("url"), host.alias("host"),
                F.col(ts_col).alias("ts"), fp.alias("fp"))
        .withColumn("prev_fp", F.lag("fp").over(w))
    )
    return (
        per_fetch
        .groupBy("host")
        .agg(
            F.countDistinct("url").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.sum(F.when(F.col("prev_fp").isNotNull(), 1)
                  .otherwise(0)).cast("long").alias("n_revisits"),
            F.sum(F.when(F.col("prev_fp").isNotNull()
                         & (F.col("prev_fp") != F.col("fp")), 1)
                  .otherwise(0)).cast("long").alias("n_changes"),
        )
        .select(
            "host", "n_urls", "n_fetches", "n_revisits", "n_changes",
            F.when(F.col("n_revisits") > 0,
                   F.round(F.col("n_changes") / F.col("n_revisits"), 6))
            .otherwise(F.lit(0.0)).alias("change_rate"))
    )


def scd2_versions(crawl: DataFrame, url_col: str = "url",
                  ts_col: str = "warc_ts",
                  text_col: str = "text") -> DataFrame:
    """Slowly-changing-dimension type-2 version table from a
    multi-snapshot crawl: one row per distinct consecutive content
    version per URL, with half-open validity intervals.

    Consecutive refetches with identical content collapse into the
    earlier version; a change opens a new interval at its fetch time
    and closes the previous one (A -> B -> A yields three versions —
    validity is temporal, not content-keyed).  ``valid_to`` is null
    on the live version.  Downstream, a point-in-time page lookup is
    :func:`tildener_spark.operators.asof.asof_join` against
    ``valid_from`` — the SCD-2 read pattern.

    Determinism: fetch order is the (ts, fingerprint) total order
    (same tie rule as :func:`recrawl_drift`); version numbers are
    row_number over that order restricted to change rows.

    Scale shape: two windows over the same (url)-hash partitioning —
    one shuffle, reused; no joins, no driver state.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, "fp")
    starts = (
        crawl
        .select(url_col, ts_col, F.md5(text_col).alias("fp"))
        .withColumn("prev_fp", F.lag("fp").over(w))
        .filter(F.col("prev_fp").isNull()
                | (F.col("prev_fp") != F.col("fp")))
    )
    w2 = Window.partitionBy(url_col).orderBy(ts_col, "fp")
    return (
        starts
        .select(
            url_col,
            F.row_number().over(w2).cast("long").alias("version"),
            "fp",
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
