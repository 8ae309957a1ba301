"""N-gram language-model quality scoring (CCNet-style filter).

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by the
perplexity of a KenLM n-gram model trained on a trusted corpus and
keeps the low-perplexity head.  This is the same filter re-expressed
relationally: a bigram LM with Stupid Backoff smoothing (Brants et
al. 2007 — counts and a fixed backoff multiplier, no discounting, the
standard choice at web scale precisely because it needs only count
tables) trained on a deterministic slice of the corpus, scoring every
document in mean nats per token.

Exactness contract: every probability is a ratio of integer counts
(IEEE-exact in any engine); ``ln`` and the per-document mean introduce
sub-ulp engine wobble (~1e-15) absorbed by the final ``round(., 6)``
— the same absorption argument the kg_pagerank oracle documents.

Scale shape (100 TB): the unigram and bigram count tables are
vocabulary-sized (orders of magnitude below the corpus); scoring is
two equi-joins keyed by token / token-pair (1:1 lookup fanout, no
skew amplification — a frequent bigram is still ONE count row) plus
one partial-agg shuffle per doc.  No Python anywhere — the whole
filter is built-in expressions inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

WS_CLASS = r"[ \t\n\x0b\f\r]+"
BACKOFF = 0.4  # Brants et al. 2007's alpha


def _tokens(text_col: str):
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, WS_CLASS))


@dataclass
class NGramLM:
    """Count tables of a Stupid-Backoff bigram LM."""
    uni: DataFrame     # (w, c1)
    bi: DataFrame      # (w_prev, w, c2)
    n_tokens: int      # T: total training tokens
    vocab: int         # V: distinct training tokens


def train_ngram_lm(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   train_mod: int = 5) -> NGramLM:
    """Count unigrams/bigrams over the deterministic training slice
    ``doc_id % train_mod == 0`` (the 'trusted corpus' stand-in; at
    production scale this is Wikipedia-like reference text).

    Two partial-agg shuffles (token key / pair key); the slice
    predicate pushes to the scan.
    """
    toks = (
        docs.filter(F.pmod(F.col(id_col), F.lit(train_mod)) == 0)
        .select(F.posexplode(_tokens(text_col)).alias("pos", "w"),
                F.col(id_col).alias("_doc"))
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    totals = uni.agg(
        F.sum("c1").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    bi = (
        toks.withColumn(
            "w_prev",
            F.lag("w").over(
                Window.partitionBy("_doc").orderBy("pos")))
        .filter(F.col("w_prev").isNotNull())
        .groupBy("w_prev", "w")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    return NGramLM(uni=uni, bi=bi,
                   n_tokens=int(totals["t"] or 0),
                   vocab=int(totals["v"] or 0))


def perplexity_score(docs: DataFrame, lm: NGramLM,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document mean negative log-likelihood in nats per token.

    Position 0 scores with the Laplace unigram
    ``(c1+1)/(T+V)``; positions > 0 with Stupid Backoff
    ``c2/c1(prev)`` when the bigram was seen, else
    ``0.4 * (c1+1)/(T+V)``.  Output: (doc_id, n_tokens,
    nats_per_tok) with ``nats_per_tok = round(-avg(ln S), 6)``
    (0.0 for empty docs — they are flagged by n_tokens, not scored).
    """
    denom = float(lm.n_tokens + lm.vocab)
    pos_toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(_tokens(text_col)).alias("pos", "w"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    scored = (
        pos_toks
        .withColumn("w_prev", F.lag("w").over(w_doc))
        .join(lm.uni.withColumnRenamed("c1", "c1_w"), "w", "left")
        .join(lm.uni.select(F.col("w").alias("w_prev"),
                            F.col("c1").alias("c1_prev")),
              "w_prev", "left")
        .join(lm.bi, ["w_prev", "w"], "left")
        .withColumn(
            "uni_p",
            (F.coalesce("c1_w", F.lit(0)) + F.lit(1)) / F.lit(denom))
        .withColumn(
            "s",
            F.when(F.col("w").isNull(), F.lit(None))  # empty doc row
            .when(F.col("w_prev").isNull(), F.col("uni_p"))
            .when(F.col("c2").isNotNull(),
                  F.col("c2") / F.col("c1_prev"))
            .otherwise(F.lit(BACKOFF) * F.col("uni_p")))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("s").cast("long").alias("n_tokens"),
             F.round(F.coalesce(-F.avg(F.log("s")), F.lit(0.0)), 6)
             .alias("nats_per_tok"))
    )


def perplexity_buckets(docs: DataFrame, lm: NGramLM,
                       text_col: str = "text", id_col: str = "doc_id",
                       lang_col: str = "lang",
                       cuts: tuple[float, float] = (1 / 3, 2 / 3)
                       ) -> DataFrame:
    """CCNet head/middle/tail partitioning: bucket every document by
    where its LM score falls within its LANGUAGE's score distribution
    (Wenzek et al. 2020 keep the low-perplexity head/middle per
    language; a global cut would just rank languages).

    Thresholds are exact per-language percentiles of ``nats_per_tok``
    over scoreable (n_tokens > 0) docs — Spark ``percentile``
    interpolates bitwise-identically to DuckDB ``quantile_cont`` (the
    q35 contract), and the scores being compared are already
    round(.,6)-quantized, so bucket assignment replays exactly.
    Empty docs bucket as 'empty' and are never kept.

    Output: (doc_id, lang, n_tokens, nats_per_tok, bucket, kept) with
    kept ⇔ bucket in (head, middle) — the CCNet keep rule.

    Scale shape: scoring is q41's (two broadcast-able count-table
    joins + one doc-keyed partial agg); thresholds add ONE language-
    keyed aggregate whose output is language-cardinality and is
    broadcast back.  Exact percentile buffers each language's scores
    in the agg — swap approx_percentile at 10^12 docs (same plan
    shape, no exact mirror; same note as corpus_summary).
    """
    scored = perplexity_score(docs, lm, text_col, id_col)
    langs = docs.select(F.col(id_col).alias("doc_id"),
                        F.col(lang_col).alias("lang"))
    j = scored.join(langs, "doc_id")
    c1, c2 = (repr(float(c)) for c in cuts)
    thr = (j.filter(F.col("n_tokens") > 0)
           .groupBy("lang")
           .agg(F.expr(f"percentile(nats_per_tok, {c1})").alias("t_head"),
                F.expr(f"percentile(nats_per_tok, {c2})").alias("t_mid")))
    bucket = (
        F.when(F.col("n_tokens") == 0, F.lit("empty"))
        .when(F.col("nats_per_tok") <= F.col("t_head"), F.lit("head"))
        .when(F.col("nats_per_tok") <= F.col("t_mid"), F.lit("middle"))
        .otherwise(F.lit("tail")))
    return (j.join(F.broadcast(thr), "lang", "left")
            .select("doc_id", "lang", "n_tokens", "nats_per_tok",
                    bucket.alias("bucket"))
            .withColumn("kept", F.col("bucket").isin("head", "middle")))
