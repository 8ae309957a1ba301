"""Span -> token BIO writeback joins (the reference's two positional
joins, SURVEY.md §2.4).

  * write_tags_from_spans — WriteNEtagsInTokens
    (NERefinements.pm:296-355): given token-index spans, rewrite each
    token's BIO tag (B- at the span start, I- inside, O elsewhere);
  * add_new_tags — AddNewTags (NEPreprocess.pm:171-347): given MUC-7
    *standoff* spans addressed by (line, col) character positions,
    attach them to tokens.  A span whose start position does not
    exactly hit a token start, or whose end does not hit a token end,
    is DROPPED (boundary-mismatch warning, NEPreprocess.pm:335-343).

Both are equi-joins on (url, position) + a between-bounds condition —
hash joins co-partitioned by url, no UDF, fully SQL-expressible (the
DuckDB oracle runs the same query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def write_tags_from_spans(tokens: DataFrame, spans: DataFrame) -> DataFrame:
    """tokens(url, tok_id, ...) + spans(url, begin_tok, end_tok,
    ne_type[, avg_prob]) -> tokens with ne_tag/ne_prob rewritten."""
    has_prob = "avg_prob" in spans.columns
    s = spans.select(
        "url", "begin_tok", "end_tok",
        F.col("ne_type").alias("_t"),
        *( [F.col("avg_prob").alias("_p")] if has_prob else []),
    )
    j = tokens.join(
        s,
        (tokens["url"] == s["url"])
        & (F.col("tok_id") >= F.col("begin_tok"))
        & (F.col("tok_id") <= F.col("end_tok")),
        "left",
    ).drop(s["url"])
    out = j.withColumn(
        "ne_tag",
        F.when(F.col("_t").isNull(), F.lit("O"))
        .when(F.col("tok_id") == F.col("begin_tok"),
              F.concat(F.lit("B-"), F.col("_t")))
        .otherwise(F.concat(F.lit("I-"), F.col("_t"))),
    )
    if has_prob:
        out = out.withColumn(
            "ne_prob",
            F.when(F.col("_t").isNull(), F.lit(0.0)).otherwise(F.col("_p")))
    return out.drop("_t", "_p", "begin_tok", "end_tok") if has_prob \
        else out.drop("_t", "begin_tok", "end_tok")


def add_new_tags(tokens: DataFrame, standoff: DataFrame) -> DataFrame:
    """Attach MUC-7 standoff spans (url, ne_type, line_from, col_from,
    line_to, col_to) to tokens by exact boundary alignment; returns
    tokens + ne_tag (O where untagged).  Misaligned spans are dropped
    (NEPreprocess.pm:335-343)."""
    start = tokens.select(
        "url",
        F.col("line_from").alias("s_line"), F.col("col_from").alias("s_col"),
        F.col("tok_id").alias("begin_tok"))
    end = tokens.select(
        "url",
        F.col("line_to").alias("e_line"), F.col("col_to").alias("e_col"),
        F.col("tok_id").alias("end_tok"))
    aligned = (
        standoff
        .join(start,
              (standoff["url"] == start["url"])
              & (standoff["line_from"] == F.col("s_line"))
              & (standoff["col_from"] == F.col("s_col")))
        .drop(start["url"])
        .join(end,
              (standoff["url"] == end["url"])
              & (standoff["line_to"] == F.col("e_line"))
              & (standoff["col_to"] == F.col("e_col")))
        .drop(end["url"])
        .filter(F.col("end_tok") >= F.col("begin_tok"))
        .select(standoff["url"].alias("url"), "ne_type",
                "begin_tok", "end_tok")
    )
    return write_tags_from_spans(tokens, aligned)
