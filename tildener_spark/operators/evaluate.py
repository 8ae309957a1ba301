"""Token- and span-level P/R/Acc/F1 evaluator.

Re-expresses NEEvaluation_v2.pl:
  * files are paired by basename (:89-100)        -> join on url;
  * non-blank token lines are zipped positionally (:105-121)
                                                  -> join on (url, tok_id);
  * token-level tallies per BIO label (:124-183): relevant, retrieved,
    relevant∩retrieved; accuracy denominator = total tokens (:268-302);
  * span-level: a full NE counts as correct only if the B- labels
    match and both spans end together (:186-254) -> exact
    (start, end, type) match on assembled spans;
  * output rows: per-BIO-label + TOTAL_TOKEN, per-MUC-type + TOTAL_NE
    (:304,361,407,477); percentages at 2 decimals (sprintf "%.2f",
    :280); ``-`` (we use NULL) on zero denominators.

Pure hash aggregates — partial+final agg is automatic (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PCT = lambda x: F.round(x * 100, 2)  # noqa: E731


def _prf(df: DataFrame) -> DataFrame:
    """tallies (label, relevant, retrieved, rr, nn, total) -> metrics."""
    p = F.when(F.col("retrieved") > 0, F.col("rr") / F.col("retrieved"))
    r = F.when(F.col("relevant") > 0, F.col("rr") / F.col("relevant"))
    acc = F.when(
        F.col("total") > 0, (F.col("rr") + F.col("nn")) / F.col("total"))
    f1 = F.when(
        (F.col("retrieved") > 0) & (F.col("relevant") > 0)
        & (F.col("rr") > 0),
        2 * (F.col("rr") / F.col("retrieved")) * (F.col("rr") / F.col("relevant"))
        / (F.col("rr") / F.col("retrieved") + F.col("rr") / F.col("relevant")),
    )
    return df.select(
        "label",
        _PCT(r).alias("recall"),
        _PCT(p).alias("precision"),
        _PCT(acc).alias("accuracy"),
        _PCT(f1).alias("f1"),
        "relevant", "retrieved", "rr",
    )


def token_eval(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Token-level metrics per BIO label + TOTAL_TOKEN.

    gold/pred: (url, tok_id, ne_tag)."""
    j = (
        gold.select("url", "tok_id", F.col("ne_tag").alias("g"))
        .join(pred.select("url", "tok_id", F.col("ne_tag").alias("p")),
              ["url", "tok_id"])
    )
    j = j.cache()
    total = j.count()
    # one groupBy per tally (no label×token cross product — at 10^12
    # tokens that matters); nn derived arithmetically:
    # nn = total - relevant - retrieved + rr
    rel = (j.filter(F.col("g") != "O")
           .groupBy(F.col("g").alias("label"))
           .agg(F.count(F.lit(1)).alias("relevant")))
    ret = (j.filter(F.col("p") != "O")
           .groupBy(F.col("p").alias("label"))
           .agg(F.count(F.lit(1)).alias("retrieved")))
    rr = (j.filter((F.col("g") == F.col("p")) & (F.col("g") != "O"))
          .groupBy(F.col("g").alias("label"))
          .agg(F.count(F.lit(1)).alias("rr")))
    per_label = (
        rel.join(ret, "label", "full").join(rr, "label", "full")
        .na.fill(0, ["relevant", "retrieved", "rr"])
        .withColumn("total", F.lit(total))
        .withColumn(
            "nn",
            F.col("total") - F.col("relevant") - F.col("retrieved")
            + F.col("rr"))
    )
    tot = (
        j.agg(
            F.sum((F.col("g") != "O").cast("long")).alias("relevant"),
            F.sum((F.col("p") != "O").cast("long")).alias("retrieved"),
            F.sum(((F.col("g") != "O") & (F.col("g") == F.col("p")))
                  .cast("long")).alias("rr"),
            F.sum(((F.col("g") == "O") & (F.col("p") == "O"))
                  .cast("long")).alias("nn"),
        )
        .withColumn("label", F.lit("TOTAL_TOKEN"))
        .withColumn("total", F.lit(total))
    )
    return _prf(per_label.unionByName(tot))


def span_eval(gold_spans: DataFrame, pred_spans: DataFrame) -> DataFrame:
    """Exact-span NE metrics per type + TOTAL_NE.

    gold/pred spans: (url, line_from, col_from, line_to, col_to,
    ne_type) — correct iff start, end AND type all match
    (NEEvaluation_v2.pl:188-207)."""
    key = ["url", "line_from", "col_from", "line_to", "col_to", "ne_type"]
    g = gold_spans.select(*key).distinct()
    p = pred_spans.select(*key).distinct()
    hit = g.join(p, key).select("ne_type").groupBy("ne_type").agg(
        F.count(F.lit(1)).alias("rr"))
    rel = g.groupBy("ne_type").agg(F.count(F.lit(1)).alias("relevant"))
    ret = p.groupBy("ne_type").agg(F.count(F.lit(1)).alias("retrieved"))
    per_type = (
        rel.join(ret, "ne_type", "full")
        .join(hit, "ne_type", "full")
        .na.fill(0, ["relevant", "retrieved", "rr"])
        .withColumn("label", F.col("ne_type"))
    )
    tot = per_type.agg(
        F.sum("relevant").alias("relevant"),
        F.sum("retrieved").alias("retrieved"),
        F.sum("rr").alias("rr"),
    ).withColumn("label", F.lit("TOTAL_NE"))
    both = per_type.select("label", "relevant", "retrieved", "rr") \
        .unionByName(tot)
    both = both.withColumn("nn", F.lit(0)).withColumn("total", F.lit(0))
    return _prf(both).drop("accuracy")
