"""Inverted-index construction + BM25 retrieval over the corpus.

Not in the reference (TildeNER has no retrieval surface; its only
per-term table is the gazetteer, `Gazetteer.pl`); a training-data
pipeline needs keyword retrieval for corpus curation — pulling the
documents that match benchmark queries (decontamination triage),
topic probes, or quality audits — without re-scanning 100 TB of text
per question.

Shapes, stage by stage:

* **Postings build** is the wordcount shape: one explode + hash
  aggregate on ``(doc_id, term)``.  Partial aggregation combines
  map-side, so the shuffle carries per-partition-distinct pairs, not
  per-token rows; document length rides along as a grouping column
  (functionally dependent on doc_id, zero extra cost).
* **Document frequency** is a second hash aggregate over postings
  keyed by term — vocabulary-sized output.
* **Head-term guard**: terms with df > max_df_ratio·N are dropped
  from the index (stopwords are the skew: at crawl scale "the" owns
  a posting list the size of the corpus and answers no query
  usefully).  The dropped mass is observable via the df table.
* **Scoring** joins the (tiny, broadcast) query-term table against
  postings on term, then one hash aggregate per (query_id, doc_id)
  and a per-query top-k window.  Candidate volume is bounded by the
  posting lists of the query terms — never corpus × queries.

Numerics: BM25 per-term scores are ``ln`` + divisions over integer
inputs (tf, df, dl, N); the document score sums ≤ |query| of them and
is reported under ``round(.,6)`` (the q41 absorption argument), and
ranking windows order by the ROUNDED score with doc_id tie-break so
rank is engine- and partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tildener_spark.operators.dedup import normalized_text

K1 = 1.2
B = 0.75


def _tokens(text_col: str):
    """Non-empty lowercased word tokens of the normalized text."""
    return F.filter(F.split(normalized_text(F.col(text_col)), " "),
                    lambda w: w != "")


def build_postings(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   max_df_ratio: float | None = None) -> DataFrame:
    """Inverted index: one row per (term, doc) with tf, dl, df, n_docs.

    With ``max_df_ratio``, terms whose document frequency exceeds
    ratio·N are dropped (head-term/stopword guard)."""
    base = docs.select(F.col(id_col).alias("doc_id"),
                       _tokens(text_col).alias("toks"))
    tf = (base.select("doc_id", F.size("toks").alias("dl"),
                      F.explode("toks").alias("term"))
          .groupBy("doc_id", "dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_tab = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg(F.size("toks")).alias("avgdl"))
    out = (tf.join(df_tab, "term")
           .crossJoin(F.broadcast(stats)))
    if max_df_ratio is not None:
        out = out.filter(
            F.col("df") <= F.lit(float(max_df_ratio)) * F.col("n_docs"))
    return out.select("term", "doc_id", "tf", "dl", "df",
                      "n_docs", "avgdl")


def corpus_queries(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", every: int = 50,
                   start: int = 5, n_terms: int = 3) -> DataFrame:
    """Deterministic query set mined from the corpus itself (the q28
    benchmark-slice trick): every ``every``-th doc contributes tokens
    ``start..start+n_terms-1`` (1-indexed) as one query, so queries
    genuinely hit the index.  Output: (query_id, term), distinct."""
    base = docs.filter((F.col(id_col) % every) == 0).select(
        F.col(id_col).alias("query_id"), _tokens(text_col).alias("toks"))
    return (base.filter(F.size("toks") >= start + n_terms - 1)
            .select("query_id",
                    F.explode(F.slice("toks", start, n_terms))
                    .alias("term"))
            .distinct())


def bm25_topk(postings: DataFrame, queries: DataFrame,
              k: int = 10) -> DataFrame:
    """Per-query BM25 top-k: (query_id, doc_id, rank, score, n_hit).

    n_hit = how many query terms the doc matched.  Rank orders by the
    rounded score (desc) then doc_id — deterministic across engines
    and partitionings."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)))
    tfn = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl")))
    hits = (postings.join(F.broadcast(queries), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.round(F.sum(idf * tfn), 6).alias("score"),
                 F.count(F.lit(1)).alias("n_hit")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (hits.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank", "score", "n_hit"))


def bm25_search(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", k: int = 10,
                max_df_ratio: float | None = 0.5,
                every: int = 50) -> DataFrame:
    """End-to-end: build index, mine queries, score, top-k."""
    postings = build_postings(docs, text_col, id_col, max_df_ratio)
    queries = corpus_queries(docs, text_col, id_col, every=every)
    return bm25_topk(postings, queries, k=k)
