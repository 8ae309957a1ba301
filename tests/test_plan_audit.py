"""Plan-shape regressions for duplicated-evaluation bugs.

Two Catalyst-level bug classes round 3 hit:

* DUP-PY-UDF — a deterministic pandas UDF cloned to a second plan
  site (inferred filters pushed past Aggregate/Project), re-running
  the UDF per row stream (tests/test_linking.py guards the minhash
  case; scripts/audit_plans._dup_py_udfs detects).
* DUP-EXPR — an expensive built-in subtree (regex tokenize, md5
  transform) evaluated 2+ times within one node: interpreted
  higher-order eval has no common-subexpression elimination, so each
  reference re-runs it — inside a transform lambda, once per output
  element.  The engine stages such arrays as projected columns
  (dedup.word_tokens doc); these tests pin both the detector and the
  staged production plans.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts"))
from audit_plans import _dup_exprs  # noqa: E402

from tildener_spark.operators import dedup, textstats  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _corpus(spark):
    return spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i}")
         for i in range(20)], "doc_id long, text string")


def test_detector_fires_on_unstaged_multi_reference(spark):
    docs = _corpus(spark)
    toks = dedup.word_tokens(F.col("text"))
    bad = docs.select(F.size(toks).alias("a"),
                      F.size(F.array_distinct(toks)).alias("b"))
    assert _dup_exprs(_plan(bad)), \
        "unstaged multi-referenced tokenize must be flagged"


def test_detector_fires_on_lambda_internal_recompute(spark):
    docs = _corpus(spark)
    bad = docs.select(
        F.explode(dedup.word_shingles(F.col("text"), 3)).alias("s"))
    assert _dup_exprs(_plan(bad)), \
        "per-element split recompute inside the shingle lambda " \
        "must be flagged"


def test_staged_operator_plans_are_dup_free(spark):
    docs = _corpus(spark)
    for df in (
        dedup.ngram_jaccard_pairs(docs, threshold=0.1),
        dedup.simhash_duplicates(docs),
        textstats.detect_language(docs),
        textstats.quality_features(docs),
        textstats.fingerprints(docs),
    ):
        assert _dup_exprs(_plan(df)) == [], _plan(df)[:2000]


def test_infer_filters_from_generate_excluded(spark):
    """The staged shingle plan must NOT carry an inferred size()>0
    scan filter re-inlining the whole generator input (the
    expression-level twin of the round-3 minhash UDF-clone bug)."""
    assert ("InferFiltersFromGenerate"
            in spark.conf.get("spark.sql.optimizer.excludedRules", ""))
    docs = _corpus(spark)
    staged = docs.select(
        "doc_id", dedup.word_tokens(F.col("text")).alias("_toks"),
    ).select(
        "doc_id",
        dedup.shingles_from_tokens(F.col("_toks"), 3).alias("sh"))
    plan = _plan(staged.select(F.explode("sh")))
    assert "Filter (size(" not in plan


def test_ensure_min_parallelism(spark):
    from tildener_spark.materialize import ensure_min_parallelism
    target = spark.sparkContext.defaultParallelism
    few = spark.range(100).coalesce(1)
    assert ensure_min_parallelism(few).rdd.getNumPartitions() == target
    many = spark.range(100).repartition(target + 4)
    # already wide: metadata no-op, same plan object
    assert ensure_min_parallelism(many) is many


def test_staged_equals_one_expression_forms(spark):
    """shingles_from_tokens == word_shingles and
    simhash_from_hashes(token_md5s) == simhash_bits, row for row."""
    docs = _corpus(spark)
    staged_sh = docs.select(
        "doc_id", dedup.word_tokens(F.col("text")).alias("_t"),
    ).select("doc_id",
             dedup.shingles_from_tokens(F.col("_t"), 3).alias("sh"))
    plain_sh = docs.select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("sh"))
    assert staged_sh.exceptAll(plain_sh).count() == 0
    assert plain_sh.exceptAll(staged_sh).count() == 0

    staged_sig = docs.select(
        "doc_id", dedup.token_md5s(F.col("text")).alias("_h"),
    ).select("doc_id",
             dedup.simhash_from_hashes(F.col("_h"), 16).alias("sig"))
    plain_sig = docs.select(
        "doc_id", dedup.simhash_bits(F.col("text"), 16).alias("sig"))
    assert staged_sig.exceptAll(plain_sig).count() == 0
    assert plain_sig.exceptAll(staged_sig).count() == 0


def test_repetition_profile_zero_shuffle_and_dup_free(spark):
    """The Gopher repetition metrics are per-row array folds: the
    physical plan must contain NO Exchange (the operator's documented
    scale contract) and no duplicated expensive subtrees."""
    docs = _corpus(spark)
    prof = textstats.repetition_profile(docs)
    plan = _plan(prof)
    assert "Exchange" not in plan, plan[:2000]
    assert _dup_exprs(plan) == [], plan[:2000]
    filt = textstats.filter_repetitive(docs)
    plan_f = _plan(filt)
    assert "Exchange" not in plan_f, plan_f[:2000]


def test_boilerplate_exchanges_are_keyed_correctly(spark):
    """remove_boilerplate shuffles exactly on its documented keys:
    (host, line) for the DF count + join-back, url for reassembly —
    no stray repartition/rebalance nodes."""
    from tildener_spark.operators.scrub import remove_boilerplate
    d = spark.createDataFrame(
        [(f"https://h{i%2}.com/{i}", f"line a\nline {i}")
         for i in range(12)], "url string, text string")
    plan = _plan(remove_boilerplate(d, min_docs=3))
    # hash-partitioned exchanges only (AQE may elide/convert some at
    # runtime; the static plan must not contain round-robin shuffles)
    assert "RoundRobinPartitioning" not in plan, plan[:2000]
