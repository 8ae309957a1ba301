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
    # ONE pass over the token join: aggregate to the (gold, pred)
    # confusion matrix — bounded by the label space (15x15, config
    # BIO_LABELS), so collecting it is a constant-size driver step,
    # not a data-dependent collect.  Every tally (per-label relevant/
    # retrieved/rr, TOTAL_TOKEN, nn = total - rel - ret + rr) derives
    # from it arithmetically.  The previous shape cached the join and
    # scanned it 5x (rel, ret, rr, totals, count) with full-outer
    # sort-merge joins over the tallies — at 10^12 tokens that is 5
    # full passes instead of one (round-2 plan audit finding).
    cm = {(r["g"], r["p"]): r["n"]
          for r in j.groupBy("g", "p")
          .agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(cm.values())
    labels = sorted({g for g, _ in cm if g != "O"}
                    | {p for _, p in cm if p != "O"})
    rows = []
    for lab in labels:
        rel = sum(n for (g, _p), n in cm.items() if g == lab)
        ret = sum(n for (_g, p), n in cm.items() if p == lab)
        rr = cm.get((lab, lab), 0)
        rows.append((lab, rel, ret, rr, total - rel - ret + rr, total))
    rows.append((
        "TOTAL_TOKEN",
        sum(n for (g, _p), n in cm.items() if g != "O"),
        sum(n for (_g, p), n in cm.items() if p != "O"),
        sum(n for (g, p), n in cm.items() if g == p and g != "O"),
        cm.get(("O", "O"), 0),
        total,
    ))
    tallies = gold.sparkSession.createDataFrame(
        rows,
        "label string, relevant long, retrieved long, rr long, "
        "nn long, total long")
    return _prf(tallies)


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
