"""Bootstrap building blocks: sentence selection + gazetteer growth.

Re-expresses the data side of BootstrapNEModel.pl's iteration
(SURVEY.md §3.3); the driver loop lives in plans/bootstrap.py.

  * sentence_type_stats — per (url, sent_id, NE token type): average
    probability of that type's tokens AND the minimum probability of
    the sentence's *other* tokens (BootstrapTools.pm:519-547), plus
    the sentence's morpho-fingerprint and joined token string used by
    the dedup filters (:395-453, :637-688);
  * top_sentences_per_type — candidate sentences (length >
    min_sentence_tokens, min other-token prob > 0.8, fingerprint seen
    < morpho_fingerprint_cap corpus-wide) ranked per type by type
    probability desc, top K, dedup by sentence string
    (BootstrapTools.pm:549, 644-690);
  * gazetteer_candidates — spans eligible for gazetteer harvest:
    type in {LOC,ORG,PERS} (NEUtilities.pm:26-45), 1..max tokens, not
    all-lowercase, avg prob >= gazetteer_min_prob
    (BootstrapTools.pm:757-775, threshold 0.95 at
    BootstrapNEModel.pl:355), minus entries already present
    (left_anti, BootstrapTools.pm:760).

All pure DataFrame ops — window ranks + hash aggregates; the only
corpus-wide state is the fingerprint count, itself a groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tildener_spark.config import GAZETTEER_TYPES, EngineConfig


def sentence_type_stats(tokens: DataFrame) -> DataFrame:
    """Flat tagged tokens -> one row per (url, sent_id, ne token type).

    Columns: type_prob (avg prob of the type's tokens), min_other_prob
    (min prob over the sentence's other tokens), n_tokens, sent_text,
    fingerprint (space-joined morpho tags, BootstrapTools.pm:395-453).
    """
    base = tokens.withColumn(
        "tok_type",
        F.when(F.col("ne_tag") == "O", F.lit(None))
        .otherwise(F.regexp_replace("ne_tag", "^[BI]-", "")))
    sent = (
        base.groupBy("url", "sent_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok_id", "token"))),
                    lambda x: x["token"]), " ").alias("sent_text"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("tok_id", "morpho"))),
                    lambda x: x["morpho"]), " ").alias("fingerprint"),
        )
    )
    per_type = (
        base.filter(F.col("tok_type").isNotNull())
        .groupBy("url", "sent_id", "tok_type")
        .agg(F.avg("ne_prob").alias("type_prob"))
    )
    sent_types = (
        per_type.select(
            "url", "sent_id", F.col("tok_type").alias("sent_type"))
        .distinct()
    )
    other = (
        base.join(sent_types, ["url", "sent_id"])
        .filter(
            (F.col("ne_tag") == "O")
            | (F.regexp_replace("ne_tag", "^[BI]-", "")
               != F.col("sent_type")))
        .groupBy("url", "sent_id",
                 F.col("sent_type").alias("tok_type"))
        .agg(F.min("ne_prob").alias("min_other_prob"))
    )
    return (
        per_type
        .join(other, ["url", "sent_id", "tok_type"], "left")
        .na.fill({"min_other_prob": 1.0})  # all-NE sentence: no others
        .join(sent, ["url", "sent_id"])
    )


def top_sentences_per_type(tokens: DataFrame, k: int = 10,
                           cfg: EngineConfig | None = None) -> DataFrame:
    """Best K training sentences per NE token type.

    Filters (BootstrapTools.pm:549): length > min_sentence_tokens,
    min other-token prob > sentence_min_other_prob, morpho fingerprint
    seen < morpho_fingerprint_cap times corpus-wide; rank by type_prob
    desc (ties: sent_text asc — documented determinism, SURVEY.md
    §4.3.4), dedup by sentence string (%sentStrHash, :678-682)."""
    cfg = cfg or EngineConfig()
    stats = sentence_type_stats(tokens)
    fp_count = (
        stats.select("url", "sent_id", "fingerprint").distinct()
        .groupBy("fingerprint").agg(F.count(F.lit(1)).alias("fp_n"))
    )
    cand = (
        stats.join(fp_count, "fingerprint")
        .filter(
            (F.col("n_tokens") > cfg.min_sentence_tokens)
            & (F.col("min_other_prob") > cfg.sentence_min_other_prob)
            & (F.col("fp_n") < cfg.morpho_fingerprint_cap))
        # dedup identical sentence strings before ranking
        .withColumn(
            "dup_rn",
            F.row_number().over(
                Window.partitionBy("tok_type", "sent_text")
                .orderBy(F.desc("type_prob"), F.asc("url"), F.asc("sent_id"))))
        .filter(F.col("dup_rn") == 1)
    )
    w = Window.partitionBy("tok_type").orderBy(
        F.desc("type_prob"), F.asc("sent_text"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("tok_type", "rank", "url", "sent_id", "sent_text",
                "type_prob", "min_other_prob")
    )


def top_files_per_tag(tokens: DataFrame, files_per_tag: int = 5,
                      min_tag_count: int = 1) -> DataFrame:
    """GetTopNECandidateFileNames (BootstrapTools.pm:25-143) as two
    hash aggregates + a window rank.

    Per file: per-tag token count and mean probability over EVERY tag
    value including ``O`` (the reference's %tags hash is keyed by the
    raw column-8 value, :71-80); file rating = mean of the per-tag
    means (:92-104).  Then, per tag seen anywhere in the corpus, files
    are ranked by rating desc and the best ``files_per_tag`` with at
    least ``min_tag_count`` tokens of that tag are selected
    (:115-143; min count default 1, :36-43).  Returns one row per
    (ne_tag, selected url) with rating/tag_count/rank; callers take
    ``select("url").distinct()`` for the reference's unique-file-set
    return value.

    Ties broken by url asc (the Perl sorts a hash — arbitrary order;
    documented determinism, SURVEY.md §4.3.4)."""
    per_tag = (
        tokens.groupBy("url", "ne_tag")
        .agg(F.count(F.lit(1)).alias("tag_count"),
             F.avg("ne_prob").alias("tag_avg"))
    )
    rating = per_tag.groupBy("url").agg(
        F.avg("tag_avg").alias("rating"))
    cand = (
        per_tag.filter(F.col("tag_count") >= min_tag_count)
        .join(rating, "url")
    )
    w = Window.partitionBy("ne_tag").orderBy(
        F.desc("rating"), F.asc("url"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= files_per_tag)
        .select("ne_tag", "url", "rating", "tag_count", "rank")
    )


def gazetteer_candidates(mentions: DataFrame, existing: DataFrame,
                         cfg: EngineConfig | None = None) -> DataFrame:
    """New gazetteer entries from high-confidence spans.

    Predicate (BootstrapTools.pm:757-775 + NEUtilities.pm:26-45):
    type in GAZETTEER_TYPES, 1..gazetteer_max_tokens tokens, surface
    not all-lowercase, avg prob >= gazetteer_min_prob; minus entries
    already in ``existing`` (ne_type, surface) — left_anti."""
    cfg = cfg or EngineConfig()
    cand = (
        mentions.filter(
            F.col("ne_type").isin(*GAZETTEER_TYPES)
            & (F.col("n_tokens") >= 1)
            & (F.col("n_tokens") <= cfg.gazetteer_max_tokens)
            & (F.col("surface") != F.lower(F.col("surface")))
            & (F.col("avg_prob") >= cfg.gazetteer_min_prob))
        .groupBy("ne_type", "surface")
        .agg(F.count(F.lit(1)).alias("n_mentions"),
             F.max("avg_prob").alias("max_prob"))
    )
    return cand.join(
        existing.select("ne_type", "surface").distinct(),
        ["ne_type", "surface"], "left_anti")


def merge_gazetteer(existing: DataFrame, new: DataFrame) -> DataFrame:
    """AppendAFileToAFile + uniqueness hash (NEUtilities.pm:523-604)."""
    return (
        existing.select("ne_type", "surface")
        .unionByName(new.select("ne_type", "surface"))
        .dropDuplicates(["ne_type", "surface"])
    )
