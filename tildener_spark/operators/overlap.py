"""Cross-source corpus overlap analytics.

Training-data pipeline operator (not in the reference): before mixing
corpora (q30) or decontaminating (q28), a pipeline owner asks "how
much of source A is already inside source B?" — pretraining sets are
routinely assembled from crawls that embed each other (C4 ⊂ CC,
news ⊂ CC, ...), and double-counted sources silently skew mixture
weights.  This computes the FULL pairwise overlap matrix over
distinct word n-grams: Jaccard similarity and directed containment
|A∩B|/|A| for every source pair.

Scale shape: the big intermediate is the distinct (source, shingle)
set — one partial-agg shuffle keyed on the shingle; per-shingle state
is the set of sources containing it, bounded by the SOURCE REGISTRY
size S (tens), never by corpus size, and the pair fan-out per shingle
is <= S(S-1)/2.  The final matrix is S^2 rows joined broadcast-side.
No all-pairs document work anywhere; at 10^12 docs the cost is the
dedup shuffle, which is the theoretical floor for exact overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tildener_spark.operators.dedup import (
    shingles_from_tokens, word_tokens)


def source_overlap(docs: DataFrame, source_col: str = "source",
                   text_col: str = "text", n: int = 3) -> DataFrame:
    """Pairwise n-gram overlap between sources: one row per unordered
    source pair (src_a < src_b), zero-overlap pairs included:
    (src_a, src_b, n_a, n_b, n_common, jaccard, contain_a, contain_b)
    where contain_a = |A∩B|/|A| (how much of A sits inside B)."""
    staged = docs.select(
        F.col(source_col).alias("source"),
        word_tokens(F.col(text_col)).alias("_toks"))
    grams = (staged.select(
                 "source",
                 F.explode(shingles_from_tokens(F.col("_toks"), n))
                 .alias("g"))
             .filter(F.col("g") != "")
             .distinct())
    sizes = grams.groupBy("source").agg(
        F.count("*").alias("n_shingles"))
    inter = (grams.alias("a")
             .join(grams.alias("b"),
                   (F.col("a.g") == F.col("b.g"))
                   & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("src_a"),
                      F.col("b.source").alias("src_b"))
             .agg(F.count("*").alias("n_common")))
    mat = (sizes.alias("sa")
           .join(sizes.alias("sb"),
                 F.col("sa.source") < F.col("sb.source"))
           .select(F.col("sa.source").alias("src_a"),
                   F.col("sb.source").alias("src_b"),
                   F.col("sa.n_shingles").alias("n_a"),
                   F.col("sb.n_shingles").alias("n_b"))
           .join(inter, ["src_a", "src_b"], "left")
           .withColumn("n_common",
                       F.coalesce("n_common", F.lit(0))))
    c = F.col("n_common").cast("double")
    return mat.select(
        "src_a", "src_b", "n_a", "n_b", "n_common",
        F.round(c / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6).alias("jaccard"),
        F.round(c / F.col("n_a"), 6).alias("contain_a"),
        F.round(c / F.col("n_b"), 6).alias("contain_b"))
