"""Iterative self-training loop (BootstrapNEModel.pl:206-357).

Driver-side Python loop; every iteration is a set of DataFrame jobs
(SURVEY.md §3.3).  Where the reference retrains a CRF each iteration
(NETrainAndEvaluate.pl:82), our classifier's learned state IS the
gazetteer (classify.py decision list), so "training" = gazetteer
growth — the same self-training feedback: high-confidence spans from
unlabeled data become lookup entries that raise recall next round.

Iteration anatomy (reference line refs):
  1. tag a seeded random sample of unlabeled pages with the current
     gazetteer (GetRandomFiles, NEUtilities.pm:798-841 ->
     orderBy(rand(seed)).limit(n), BootstrapNEModel.pl:330-336);
  2. evaluate on the dev gold (NETrainAndEvaluate.pl:101-106);
  3. positive-iteration gate: accept iff the chosen metric(s) did not
     DECREASE vs the last accepted iteration
     (BootstrapNEModel.pl:254-258; metric is P, R, F, A or 'all');
  4. on accept: merge the temp gazetteer into the persistent one
     (:262-282) and keep the selected top sentences as accumulated
     positive training data (:340-347);
  5. harvest new gazetteer candidates at avg prob >=
     gazetteer_min_prob=0.95 (:355).

Each iteration checkpoints its gazetteer + metrics (per-stage
checkpoint/lineage contract of the north rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.operators.bootstrap import (
    gazetteer_candidates, merge_gazetteer, top_files_per_tag,
    top_sentences_per_type,
)
from tildener_spark.operators.document import (
    explode_docs, make_process_document_udf,
)
from tildener_spark.operators.evaluate import token_eval
from tildener_spark.operators.tokenize import explode_tokens

_METRIC_COLS = {"P": "precision", "R": "recall", "F": "f1", "A": "accuracy"}


@dataclass
class BootstrapResult:
    gazetteer: DataFrame
    history: list = field(default_factory=list)  # per-iteration dicts
    sentences: DataFrame | None = None


def _tag(spark, pages, gaz_rows, cfg):
    inits = frozenset(t[1] for t in gaz_rows if t[0] == "ORG_INIT")
    udf = make_process_document_udf(gaz_rows, cfg, inits)
    return pages.select("url", "lang", udf(F.col("text")).alias("doc"))


def _dev_metrics(pred, dev_gold_tokens) -> dict:
    row = (
        token_eval(dev_gold_tokens, pred)
        .filter(F.col("label") == "TOTAL_TOKEN").collect()
    )[0]
    return {m: row[c] for m, c in _METRIC_COLS.items()}


def bootstrap_loop(
    spark: SparkSession,
    unlabeled_pages: DataFrame,
    dev_pages: DataFrame,
    dev_gold_tokens: DataFrame,
    gazetteer: DataFrame,
    iterations: int = 3,
    docs_per_iteration: int = 50,
    sentences_per_type: int = 10,
    files_per_tag: int = 10,
    min_tag_count: int = 1,
    metric: str = "F",
    cfg: EngineConfig | None = None,
    seed: int = 42,
    artifact_dir: str | None = None,
) -> BootstrapResult:
    """Run the self-training loop; returns the grown gazetteer +
    per-iteration audit history.

    ``metric``: one of P/R/F/A or 'all' (all four must not decrease —
    the four simultaneous comparisons of BootstrapNEModel.pl:254-258).

    ``artifact_dir``: when set, each iteration's classifier outputs
    are materialized to parquet (``it{i}_dev_pred`` dev predictions,
    ``it{i}_tokens`` sampled-doc tokens, ``it{i}_mentions`` sampled-doc
    mentions, ``it{i}_gaz`` iteration-start gazetteer) — the per-stage
    checkpoint of the north rule, and the shared classifier input the
    DuckDB step-replay oracle re-derives the metric gate / file
    selection / gazetteer harvest from (the same contract as the
    _kg_materialized stage queries: the classifier has no SQL form,
    everything downstream is relational and re-derived exactly).
    """
    cfg = cfg or EngineConfig()
    gaz = gazetteer.select("ne_type", "surface").persist()
    history: list[dict] = []
    best: dict | None = None
    sentences = None

    for it in range(iterations):
        gaz_rows = [(r["ne_type"], r["surface"]) for r in gaz.collect()]
        # 1. seeded random sample of unlabeled docs (deterministic)
        sample = (
            unlabeled_pages.orderBy(F.rand(seed + it))
            .limit(docs_per_iteration)
        )
        tagged = _tag(spark, sample, gaz_rows, cfg).persist()
        all_tokens = explode_tokens(
            tagged.select("url", F.col("doc.tokens").alias("tokens")))
        mentions = explode_docs(tagged, "mentions")

        # 2. evaluate current model on dev
        dev_tagged = _tag(spark, dev_pages, gaz_rows, cfg)
        dev_pred = explode_tokens(
            dev_tagged.select("url", F.col("doc.tokens").alias("tokens")))
        if artifact_dir:
            dev_pred.select("url", "tok_id", "ne_tag").write.mode(
                "overwrite").parquet(
                f"{artifact_dir}/it{it}_dev_pred.parquet")
            all_tokens.select(
                "url", "tok_id", "ne_tag", "ne_prob").write.mode(
                "overwrite").parquet(
                f"{artifact_dir}/it{it}_tokens.parquet")
            mentions.select(
                "url", "ne_type", "surface", "n_tokens",
                "avg_prob").write.mode("overwrite").parquet(
                f"{artifact_dir}/it{it}_mentions.parquet")
            gaz.write.mode("overwrite").parquet(
                f"{artifact_dir}/it{it}_gaz.parquet")
        metrics = _dev_metrics(dev_pred, dev_gold_tokens)

        # 3. positive-iteration gate
        keys = list(_METRIC_COLS) if metric == "all" else [metric]
        accept = best is None or all(
            (metrics[k] or 0) >= (best[k] or 0) for k in keys)

        entry = {"iteration": it, "metrics": metrics, "accepted": accept,
                 "gazetteer_size": len(gaz_rows)}
        if accept:
            best = metrics
            # 4a. rate the tagged candidates and keep only the best
            # files per NE tag (GetTopNECandidateFileNames,
            # BootstrapTools.pm:25-143) — harvesting from every random
            # doc was round 1's shortcut; the reference-shaped
            # selection concentrates the sentence/gazetteer harvest on
            # high-confidence documents
            selected = (
                top_files_per_tag(all_tokens, files_per_tag,
                                  min_tag_count)
                .select("url").distinct().persist()
            )
            entry["selected_files"] = selected.count()
            # 4b. harvest from the selected files only
            tokens = all_tokens.join(selected, "url", "left_semi")
            top = top_sentences_per_type(tokens, sentences_per_type, cfg)
            sentences = (top if sentences is None
                         else sentences.unionByName(top).dropDuplicates(
                             ["tok_type", "sent_text"]))
            sel_mentions = mentions.join(selected, "url", "left_semi")
            new_entries = gazetteer_candidates(sel_mentions, gaz, cfg)
            entry["new_gazetteer_entries"] = new_entries.count()
            grown = merge_gazetteer(gaz, new_entries).persist()
            grown.count()  # materialize before unpersisting the old one
            gaz.unpersist()
            gaz = grown
            selected.unpersist()
        tagged.unpersist()
        history.append(entry)
        if not accept:
            # rejection is terminal for this model: the gazetteer (the
            # learned state) did not change, so every further
            # iteration would recompute identical dev metrics and be
            # deterministically rejected again (unlike the reference,
            # where CRF retraining on a fresh sample changes the model
            # each round, BootstrapNEModel.pl:254-258) — ADVICE r01
            break

    return BootstrapResult(gazetteer=gaz, history=history,
                           sentences=sentences)
