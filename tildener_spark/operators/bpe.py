"""Distributed BPE tokenizer training (Sennrich et al. 2016).

Training-data pipeline operator (not in the reference): learning the
merge table IS the corpus-scale part of tokenizer training, and the
canonical algorithm maps cleanly onto Spark:

  * the corpus collapses once into a DISTINCT-WORD table with counts
    (one wordcount shuffle; at 10^12 docs this table is
    vocabulary-sized, ~10^7-8 rows, not corpus-sized — the same
    collapse every published distributed BPE trainer performs);
  * each merge step is (a) one pair-count partial-agg shuffle over
    the word table (explode adjacent symbol pairs weighted by word
    count — Sennrich's get_stats, overlapping occurrences counted),
    (b) a 1-row argmax collect (count desc, then lexicographic
    (left, right) — deterministic tie-break), and (c) a map-only
    per-word merge fold, no shuffle;
  * the merge itself is the LEFT-TO-RIGHT NON-OVERLAPPING rule,
    implemented as an array fold: append the symbol, or if the
    accumulator ends with `left` and the symbol is `right`, replace
    the tail with the merged token.  A fold is provably LTR (the
    x==y run case merges at even run offsets exactly like the
    reference implementation); a regex replace loop is NOT (the
    consumed-separator artifact diverges on runs >= 4), which is why
    the DuckDB oracle replays the SAME fold via recursive CTEs
    rather than string replacement.

Simplifications vs production tokenizers (documented, not hidden):
no end-of-word marker and no byte fallback — symbols start as the
word's characters; words are the pinned-whitespace tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tildener_spark.materialize import materialize_once
from tildener_spark.operators.dedup import word_tokens


def _merge_fold(syms, left: str, right: str):
    """LTR non-overlapping merge of (left, right) over a symbol
    array, as a single aggregate fold."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))))


def train_bpe(spark: SparkSession, docs: DataFrame,
              n_merges: int = 4,
              text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the
    merge log (step, left, right, merged, pair_count) — the artifact
    a tokenizer ships.  Deterministic: argmax ties break on the
    lexicographically smallest (left, right) (UTF-8 byte order ==
    codepoint order, so Spark and DuckDB agree)."""
    words = (docs.select(
                 F.explode(word_tokens(F.col(text_col))).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("cnt")))
    wt = words.select(
        "w", "cnt",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.substring(F.col("w"), i, F.lit(1)))
        .alias("syms"))
    wt = materialize_once(wt)

    log = []
    for step in range(n_merges):
        syms = F.col("syms")
        n_s = F.size(syms)
        pairs = (wt.filter(n_s >= 2)
                 .select(
                     "cnt",
                     F.explode(F.zip_with(
                         F.slice(syms, 1, n_s - 1),
                         F.slice(syms, 2, n_s - 1),
                         lambda a, b: F.struct(a.alias("x"),
                                               b.alias("y"))))
                     .alias("p"))
                 .groupBy(F.col("p.x").alias("x"),
                          F.col("p.y").alias("y"))
                 .agg(F.sum("cnt").alias("c")))
        top = pairs.orderBy(F.desc("c"), "x", "y").limit(1).collect()
        if not top:
            break
        left, right, c = top[0]["x"], top[0]["y"], top[0]["c"]
        log.append((step, left, right, left + right, int(c)))
        wt = materialize_once(
            wt.select("w", "cnt",
                      _merge_fold(syms, left, right).alias("syms")))

    return spark.createDataFrame(
        log, "step: int, left: string, right: string, "
             "merged: string, pair_count: bigint")


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]],
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge table: split each word to
    characters and replay every merge in order — the exact encoder
    dual of :func:`train_bpe`.  Map-only, zero shuffle.

    Output: (id_col, tokens array<string>) with per-word symbol
    arrays flattened in document order."""
    toks = word_tokens(F.col(text_col))
    per_word = F.transform(
        toks,
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.substring(w, i, F.lit(1))))
    staged = docs.select(F.col(id_col).alias(id_col),
                         per_word.alias("_sym"))
    col = F.col("_sym")
    for left, right in merges:
        col = F.transform(col, lambda s: _merge_fold(s, left, right))
    return staged.select(id_col, F.flatten(col).alias("tokens"))


def bpe_fertility(docs: DataFrame, merges: list[tuple[str, str]],
                  lang_col: str = "lang", id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-language tokenizer fertility report — the standard
    multilingual-tokenizer audit (tokens/word and chars/token per
    language; a language whose fertility is 2x another's pays 2x the
    sequence length for the same text, the classic under-trained-
    script symptom).

    Output: (lang, n_docs, n_words, n_tokens, n_chars, fertility,
    chars_per_token) with ``fertility = round(n_tokens/n_words, 6)``
    and ``chars_per_token = round(n_chars/n_tokens, 6)`` (0.0 when
    the denominator is empty; one IEEE division each).

    Scale shape: the encoder is :func:`apply_bpe` (map-only); the
    word/char columns are zero-shuffle; one co-partitioned join on
    ``id_col`` and one language-keyed partial agg.  Empty-word
    guards mirror the oracle's ``list_filter(t <> '')`` exactly.
    """
    words = docs.select(
        F.col(id_col).alias(id_col), F.col(lang_col).alias("lang"),
        F.size(F.filter(word_tokens(F.col(text_col)),
                        lambda t: t != "")).cast("long")
        .alias("n_words"))
    enc = apply_bpe(docs, merges, id_col=id_col,
                    text_col=text_col).select(
        id_col,
        F.size(F.filter(F.col("tokens"), lambda t: t != ""))
        .cast("long").alias("n_tokens"),
        F.length(F.array_join("tokens", "")).cast("long")
        .alias("n_chars"))
    per = words.join(enc, id_col)
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"))
    return agg.select(
        "lang", "n_docs", "n_words", "n_tokens", "n_chars",
        F.when(F.col("n_words") > 0,
               F.round(F.col("n_tokens") / F.col("n_words"), 6))
        .otherwise(F.lit(0.0)).alias("fertility"),
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_chars") / F.col("n_tokens"), 6))
        .otherwise(F.lit(0.0)).alias("chars_per_token"))
