"""DSIR-style hashed n-gram importance resampling.

Data Selection via Importance Resampling (Xie et al. 2023) picks
training documents whose hashed-ngram distribution looks like a
trusted TARGET corpus rather than the RAW crawl: estimate bag-of-
hashed-ngrams unigram distributions p (target) and q (raw), weight
each document by ``log w = sum_f [ln p(b(f)) - ln q(b(f))]`` over its
features, and sample without replacement via the Gumbel top-k trick.
The reference has no learned selection stage (its corpus is a staged
directory, ``ProcessDirectory.pl:28-40``); this is part of the
beyond-reference training-data surface, next to the q50 classifier.

Determinism contract (everything replays in DuckDB):

* Features are the q50 hashed word uni+bigrams; the bucket of a
  feature is ``uint32(md5(feature)[:8]) % n_buckets``.
* The target corpus is the deterministic slice
  ``doc_id % target_mod == 0`` (the q41 'trusted corpus' stand-in);
  the raw distribution is the whole corpus.
* Bucket log-ratios are Laplace-smoothed count ratios — integer
  inputs, one division and two ``ln`` — rounded to 9 decimals so
  both engines sum bitwise-identical addends (the kg_pagerank
  quantization trick); the per-doc sum is reported under
  ``round(.,6)``.
* Gumbel noise is a pure function of the doc id:
  ``u = (uint32(md5(seed|doc_id)) + 1) / (2^32 + 1)``,
  ``g = -ln(-ln(u))`` — no RNG state, partition-invariant,
  resumable.  Selection keeps the k largest ``round(log_w + g, 6)``
  with doc_id tie-break, so the kept set is engine- and
  partitioning-independent.

Scale shape (100 TB): the two count tables are n_buckets-sized
(vocabulary-bounded, default 1024 rows) and come from partial-agg
shuffles over the feature stream; the bucket->log-ratio table is
BROADCAST back, so scoring is a map-side join plus one partial-agg
shuffle keyed by doc_id.  The global top-k runs as
TakeOrderedAndProject (per-partition partial top-k, k rows to the
driver) — never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tildener_spark.operators.quality_clf import _FEATURES_EXPR, _toks_col

N_BUCKETS = 1024


def _bucket(col):
    """Feature string -> hash bucket in [0, n_buckets) (set n via %)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _doc_features(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, feature) with one row per feature OCCURRENCE; empty
    docs keep one row with a null feature (explode_outer)."""
    return (docs
            .select(F.col(id_col).alias("doc_id"),
                    _toks_col(text_col).alias("toks"))
            .select("doc_id", F.expr(_FEATURES_EXPR).alias("_feats"))
            .select("doc_id", F.explode_outer("_feats").alias("f")))


def bucket_log_ratios(feats: DataFrame, target_mod: int = 5,
                      n_buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, lam) — Laplace-smoothed importance log-ratio per hash
    bucket, quantized to 9 decimals.

    Raw counts cover every bucket any document touches, so the scoring
    join never misses; target counts are left-joined (0 when the
    target slice never hits the bucket).
    """
    occ = feats.filter(F.col("f").isNotNull()).select(
        "doc_id", (_bucket(F.col("f")) % n_buckets).alias("bucket"))
    raw = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tgt = (occ.filter(F.col("doc_id") % target_mod == 0)
           .groupBy("bucket").agg(F.count(F.lit(1)).alias("tc")))
    totals = (raw.agg(F.sum("rc").alias("tq"))
              .crossJoin(tgt.agg(F.sum("tc").alias("tp"))))
    return (raw.join(tgt, "bucket", "left")
            .crossJoin(F.broadcast(totals))
            .select(
                "bucket",
                F.round(
                    F.log((F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1))
                          / (F.col("tp") + F.lit(n_buckets)))
                    - F.log((F.col("rc") + F.lit(1))
                            / (F.col("tq") + F.lit(n_buckets))),
                    9).alias("lam")))


def importance_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", target_mod: int = 5,
                      n_buckets: int = N_BUCKETS,
                      seed: str = "dsir") -> DataFrame:
    """Per-document DSIR importance: (doc_id, n_feats, log_w, g_key).

    ``log_w`` is the rounded sum of its buckets' quantized log-ratios;
    ``g_key`` adds the deterministic Gumbel perturbation (the sampling
    key).  Empty docs score 0 features / 0.0 log_w but still draw a
    Gumbel key, so selection over them stays well-defined.
    """
    feats = _doc_features(docs, text_col, id_col)
    lam = bucket_log_ratios(feats, target_mod, n_buckets)
    scored = (feats
              .withColumn("bucket",
                          _bucket(F.col("f")) % n_buckets)
              .join(F.broadcast(lam), "bucket", "left")
              .groupBy("doc_id")
              .agg(F.count("bucket").cast("bigint").alias("n_feats"),
                   F.coalesce(F.sum("lam"), F.lit(0.0)).alias("_lw")))
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed + "|"),
                       F.col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("bigint")
    u = (h + F.lit(1)) / F.lit(4294967297.0)
    gumbel = -F.log(-F.log(u))
    return scored.select(
        "doc_id", "n_feats",
        F.round("_lw", 6).alias("log_w"),
        F.round(F.col("_lw") + gumbel, 6).alias("g_key"))


def resample_topk(docs: DataFrame, k: int, text_col: str = "text",
                  id_col: str = "doc_id", target_mod: int = 5,
                  n_buckets: int = N_BUCKETS,
                  seed: str = "dsir") -> DataFrame:
    """Gumbel top-k selection: importance_scores + ``kept`` flag for
    the k docs with the largest (g_key, then smallest doc_id).

    The top-k is ``orderBy(...).limit(k)`` — Spark plans it as
    TakeOrderedAndProject (per-partition partial top-k), not a global
    sort or single-partition window; k rows land on the driver.
    """
    scores = importance_scores(docs, text_col, id_col, target_mod,
                               n_buckets, seed)
    kept = (scores.orderBy(F.desc("g_key"), F.asc("doc_id"))
            .limit(k).select("doc_id"))
    return (scores.join(F.broadcast(kept.withColumn("kept", F.lit(True))),
                        "doc_id", "left")
            .select("doc_id", "n_feats", "log_w", "g_key",
                    F.coalesce("kept", F.lit(False)).alias("kept")))
