"""Training-data scrubbing operators: PII redaction and
cross-document paragraph deduplication.

Standard large-corpus preparation steps (not in the reference, which
tags already-curated text); both are pure JVM-side built-ins with
exact DuckDB oracles, like operators/textstats.py.

Scale notes: redaction is a per-row map (no shuffle, rides whole-stage
codegen).  Paragraph dedup shuffles twice — once hash-partitioned by
paragraph content for the global first-occurrence window, once by doc
id for reassembly — the same shape as exact document dedup
(operators/dedup.py), so it holds at 10^12 documents; skew is bounded
because a paragraph's window only ranks its duplicates, and
pathological mega-duplicate paragraphs (boilerplate) are exactly the
rows AQE skew-join/window handling splits.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# Patterns kept to the common RE2/Java-regex subset so the DuckDB
# oracle can run the byte-identical expressions; replacement ORDER is
# part of the contract (email first, then ipv4, then phone).
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d[\d ]{6,}\d", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str = "clean") -> DataFrame:
    """Replace email / IPv4 / phone spans with typed placeholders."""
    col = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return docs.withColumn(out_col, col)


def dedup_paragraphs(docs: DataFrame, id_col: str = "url",
                     text_col: str = "text") -> DataFrame:
    """Keep only the globally-first occurrence of every paragraph.

    Paragraph = non-empty trimmed line.  "First" is the total order
    (id, line index), so the result is deterministic under any
    partitioning.  Returns (id, n_pars, n_kept, text_dedup) with
    text_dedup the surviving paragraphs rejoined in document order;
    documents whose every paragraph is a duplicate — and documents
    whose text is empty or all-whitespace — keep an empty string with
    n_pars = n_kept = 0 (every input row surfaces in the output; the
    aggregate is left-joined back onto the input so nothing vanishes).
    """
    pars = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("idx", "par"))
        .withColumn("par", F.trim("par"))
        .filter(F.col("par") != "")
    )
    w = Window.partitionBy("par").orderBy("_id", "idx")
    ranked = pars.withColumn("rn", F.row_number().over(w))
    agg = (
        ranked.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_pars"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("rn") == 1,
                        F.struct("idx", "par")))),
                    lambda s: s["par"]),
                "\n").alias("text_dedup"),
        )
    )
    # left-join back onto the input so empty/all-whitespace docs
    # surface as n_pars=0 rather than silently dropping; same shuffle
    # key (doc id) as the reassembly aggregate, so no extra exchange
    # shape at scale
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(agg, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_pars", F.lit(0)).cast("long")
            .alias("n_pars"),
            F.coalesce("n_kept", F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"))
    )


def remove_boilerplate(pages: DataFrame, min_docs: int = 5,
                       url_col: str = "url",
                       text_col: str = "text") -> DataFrame:
    """Cross-document boilerplate-line removal, host-scoped: a line
    appearing on >= ``min_docs`` distinct pages of the SAME host is
    template chrome (nav menus, footers, cookie banners) and is
    dropped from every page; rarer lines keep every occurrence —
    unlike :func:`dedup_paragraphs`, which keeps only the globally
    first copy of anything repeated.

    Line = non-empty trimmed line.  Returns (url, n_lines, n_kept,
    text_clean) with text_clean the surviving lines rejoined in page
    order; a page that is all boilerplate — and a page whose text is
    empty or all-whitespace — keeps an empty string with
    n_lines = n_kept = 0 (the aggregate is left-joined back onto the
    input pages so every input row surfaces in the output).

    Scale shape: one partial-agg shuffle on (host, line) for the
    document-frequency count, one hash-join of the lines back against
    the boilerplate set on the same key, one reassembly shuffle by
    url.  The boilerplate set is NOT broadcast by us — at crawl scale
    it is huge per host but the join stays co-partitioned on
    (host, line); AQE may still broadcast it at test scale.  Skew on
    mega-boilerplate lines is absorbed by partial aggregation
    (countDistinct rewrites to two hash aggregates).
    """
    host = F.lower(F.regexp_extract(
        F.regexp_replace(F.col(url_col),
                         r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
        r"^([^/]*)", 1))
    lines = (
        pages.select(
            F.col(url_col).alias("_url"), host.alias("_host"),
            F.posexplode(F.split(F.col(text_col), "\n"))
            .alias("idx", "line"))
        .withColumn("line", F.trim("line"))
        .filter(F.col("line") != "")
    )
    boiler = (
        lines.groupBy("_host", "line")
        .agg(F.countDistinct("_url").alias("df"))
        .filter(F.col("df") >= min_docs)
        .select("_host", "line", F.lit(True).alias("_boiler"))
    )
    marked = lines.join(boiler, ["_host", "line"], "left")
    agg = (
        marked.groupBy("_url")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_boiler").isNull(), 1).otherwise(0))
            .cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.when(
                        F.col("_boiler").isNull(),
                        F.struct("idx", "line")))),
                    lambda s: s["line"]),
                "\n").alias("text_clean"),
        )
    )
    # left-join back: empty/all-whitespace pages produced no line rows
    # above and would otherwise vanish; join key == reassembly key, so
    # the plan gains no new exchange shape at scale
    return (
        pages.select(F.col(url_col).alias("_url"))
        .join(agg, "_url", "left")
        .select(
            F.col("_url").alias(url_col),
            F.coalesce("n_lines", F.lit(0)).cast("long")
            .alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"))
    )


# ------------------------------------------------------------------
# Unicode canonicalization

# precomposed -> NFD decomposition pairs used by tests/oracles to
# synthesize combining-mark input (the synthetic corpus is pure
# ASCII); stable since Unicode 1.1, so CPython's unicodedata and
# DuckDB's utf8proc agree on every pair.
NFC_PAIRS = [
    ("ā", "ā"),   # ā
    ("č", "č"),   # č
    ("ē", "ē"),   # ē
    ("ī", "ī"),   # ī
    ("ū", "ū"),   # ū
    ("é", "é"),   # é
]


def normalize_nfc(docs: DataFrame, text_col: str = "text",
                  out_col: str = "text_nfc") -> DataFrame:
    """Unicode NFC canonicalization of a text column.

    Web text mixes precomposed and combining-mark encodings of the
    same glyph; every dedup / fingerprint / gazetteer operator keyed
    on surface strings silently misses cross-encoding duplicates
    unless the corpus is normalized first, so this runs as a per-row
    map (no shuffle) ahead of them.

    Implementation: Arrow-batched pandas UDF over CPython's
    ``unicodedata.normalize`` (a C routine; the Python layer is one
    ``str`` call per row, the sanctioned Arrow-batch pattern).  The
    DuckDB oracle is ``nfc_normalize``; both sides implement the same
    Unicode normalization spec and the test surface pins the
    character set to stable pairs (NFC_PAIRS).
    """
    def _nfc_batch(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None else None)

    _nfc = F.pandas_udf(_nfc_batch, "string")
    return docs.withColumn(out_col, _nfc(F.col(text_col)))
