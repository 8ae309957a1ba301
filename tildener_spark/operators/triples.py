"""(subj, pred, obj) triple extraction within sentence windows.

New-engine stage mandated by the north rule (the reference stops at NE
tagging; triple extraction is the KG-construction extension).  Two
deterministic rules over the `mentions` and `tokens` tables:

  * pattern triple — two *consecutive* mentions of a sentence with at
    least one verb token strictly between them: pred = lemma of the
    first such verb;
  * co-occurrence triple — consecutive mention pair with no verb
    between: pred = 'co_occurs'.

Pure DataFrame plan, no UDFs:
  - consecutive pairs via lead() over Window(url, sent_id) — no
    mention×mention self-join, so no quadratic blowup on
    mention-heavy sentences;
  - the verb lookup is a range join on (url, sent_id) + tok_id
    between-bounds, aggregated with min_by to pick the first verb;
    (url, sent_id) equi-keys keep it a hash join, the range is a
    post-join filter — at 100 TB the join is co-partitioned by url
    and never broadcasts the big side.

prob = min of the two mention probabilities (FIXTURES.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TRIPLE_COLUMNS = [
    "url", "sent_id", "subj", "subj_type", "pred", "obj", "obj_type",
    "prob", "kind",
]


def mention_pairs(mentions: DataFrame) -> DataFrame:
    """Consecutive same-sentence mention pairs via lead()."""
    w = Window.partitionBy("url", "sent_id").orderBy("begin_tok")
    return (
        mentions
        .withColumn("obj", F.lead("surface").over(w))
        .withColumn("obj_type", F.lead("ne_type").over(w))
        .withColumn("obj_begin", F.lead("begin_tok").over(w))
        .withColumn("obj_prob", F.lead("avg_prob").over(w))
        .filter(F.col("obj").isNotNull())
        .select(
            "url", "sent_id",
            F.col("surface").alias("subj"),
            F.col("ne_type").alias("subj_type"),
            F.col("end_tok").alias("subj_end"),
            "obj", "obj_type", "obj_begin",
            F.least("avg_prob", "obj_prob").alias("prob"),
        )
    )


def extract_triples(mentions: DataFrame, tokens: DataFrame) -> DataFrame:
    """mentions + flat tokens -> triples DataFrame."""
    pairs = mention_pairs(mentions)
    verbs = (
        tokens.filter(F.col("pos") == "VB")
        .select("url", "sent_id",
                F.col("tok_id").alias("v_tok"),
                F.col("lemma").alias("v_lemma"))
    )
    joined = (
        pairs.join(verbs, ["url", "sent_id"], "left")
        .withColumn(
            "v_between",
            (F.col("v_tok") > F.col("subj_end"))
            & (F.col("v_tok") < F.col("obj_begin")),
        )
    )
    agg = (
        joined.groupBy(
            "url", "sent_id", "subj", "subj_type", "subj_end",
            "obj", "obj_type", "obj_begin", "prob",
        )
        .agg(
            F.min_by(
                "v_lemma", F.when(F.col("v_between"), F.col("v_tok"))
            ).alias("verb_lemma"),
        )
    )
    return (
        agg.withColumn(
            "pred", F.coalesce("verb_lemma", F.lit("co_occurs")))
        .withColumn(
            "kind",
            F.when(F.col("verb_lemma").isNotNull(), F.lit("pattern"))
            .otherwise(F.lit("cooc")))
        .select(*TRIPLE_COLUMNS)
    )


def triple_prf(predicted: DataFrame, gold: DataFrame) -> dict:
    """Set-based triple P/R/F1 on distinct (url, subj, pred, obj).

    The parity gate of BASELINE.json: P/R >= 0.95 vs the
    reference-semantics gold."""
    key = ["url", "subj", "pred", "obj"]
    p = predicted.select(*key).distinct()
    g = gold.select(*key).distinct()
    n_pred = p.count()
    n_gold = g.count()
    n_hit = p.join(g, key, "inner").count()
    precision = n_hit / n_pred if n_pred else 0.0
    recall = n_hit / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall else 0.0
    )
    return {
        "precision": precision, "recall": recall, "f1": f1,
        "n_pred": n_pred, "n_gold": n_gold, "n_hit": n_hit,
    }
