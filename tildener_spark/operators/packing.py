"""Sequence packing for LM training-data preparation.

GPT-style concat-and-split packing: documents are concatenated in a
deterministic order and cut into fixed token-budget training
sequences.  A single global concatenation order would serialize the
whole corpus through one prefix sum, so the corpus is first split
into deterministic shards (``doc_id mod n_shards``) and each shard is
packed independently — the layout a 100 TB tokenization job actually
uses (shards map 1:1 to writer tasks; each shard's prefix sum is one
window pass over its own partition, shards run in parallel).

Token counting matches q16/textstats (pinned whitespace class
``[ \\t\\n\\x0b\\f\\r]+`` so Java and RE2 regex agree — ADVICE r3).

All arithmetic is integer (window cumsum + integer division), so the
DuckDB mirror hashes identically with no float quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

WS_CLASS = r"[ \t\n\x0b\f\r]+"


def _n_tokens(text_col: str):
    t = F.trim(F.col(text_col))
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, WS_CLASS))).cast("long")


def pack_sequences(docs: DataFrame, budget: int = 2048,
                   n_shards: int = 32, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document placement in the packed training-sequence stream.

    Output columns:

    * ``shard``      — ``pmod(doc_id, n_shards)``;
    * ``n_tokens``   — whitespace token count (0 for blank docs);
    * ``start_tok``  — offset of the doc's first token in its shard's
      concatenated token stream;
    * ``seq_first`` / ``seq_last`` — indices of the ``budget``-sized
      training sequences the doc lands in (a doc may straddle several;
      a blank doc occupies none: ``n_seqs = 0`` with
      ``seq_first = seq_last`` at its insertion point);
    * ``n_seqs``     — number of sequences the doc touches.

    Plan: one shuffle keyed by ``shard`` for the window cumsum; the
    per-shard order is ``doc_id`` (total order within shard, no ties).
    """
    w = Window.partitionBy("shard").orderBy(id_col)
    d = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.pmod(F.col(id_col), F.lit(int(n_shards)))
            .cast("long").alias("shard"),
            _n_tokens(text_col).alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("start_tok", (F.col("cum")
                                  - F.col("n_tokens")).cast("long"))
        .withColumn("seq_first",
                    F.expr(f"start_tok div {int(budget)}"))
        .withColumn(
            "seq_last",
            F.when(F.col("n_tokens") > 0,
                   F.expr(f"(cum - 1) div {int(budget)}"))
            .otherwise(F.col("seq_first")))
        .withColumn(
            "n_seqs",
            F.when(F.col("n_tokens") > 0,
                   F.col("seq_last") - F.col("seq_first") + 1)
            .otherwise(F.lit(0)).cast("long"))
    )
    return d.select("doc_id", "shard", "n_tokens", "start_tok",
                    "seq_first", "seq_last", "n_seqs")


def chunk_documents(docs: DataFrame, chunk_tokens: int = 128,
                    stride: int = 64, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Sliding token-window chunking (RAG / long-context training
    prep): cut each document into windows of ``chunk_tokens``
    whitespace tokens advancing by ``stride`` (overlap =
    chunk_tokens - stride).

    Window convention: ``n_chunks = 1 + ceil((n_tok - chunk)/stride)``
    clamped to >= 1 for non-empty docs — the final window is the only
    possibly-short one and no window is fully contained in its
    predecessor (the trailing-tiny-window artifact of the naive
    while-start<n loop).  Empty/blank documents produce NO chunks
    (documented; a pipeline filters them upstream).

    Output: (doc_id, chunk_id, start_token, n_tokens, chunk_text).

    Scale shape: split + sequence + explode per row — NO shuffle, no
    UDF; at 10^12 docs chunking is embarrassingly parallel and the
    output is ~(n_tok/stride)x the input rows, which the writer
    partitioning absorbs.  Tokens here are whitespace words (the
    q16 convention); a BPE chunker swaps the splitter, same plan.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    t = F.trim(F.regexp_replace(F.col(text_col), WS_CLASS, " "))
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(t, " "), lambda w: w != "")
        .alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    # integer-exact: ceil(a/b) = floor((a + b - 1)/b) on positives
    extra = F.floor(
        (n_tok - chunk_tokens + stride - 1)
        / F.lit(stride).cast("double")).cast("long")
    n_chunks = F.when(n_tok == 0, F.lit(0).cast("long")).otherwise(
        F.greatest(extra + 1, F.lit(1).cast("long")))
    starts = F.when(
        n_chunks > 0,
        F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<long>"))
    staged = staged.select(
        "doc_id", "_toks",
        F.posexplode(
            F.transform(starts, lambda i: i * stride)
        ).alias("chunk_id", "start_token"))
    piece = F.slice(toks, F.col("start_token").cast("int") + 1,
                    chunk_tokens)
    return staged.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "start_token",
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"))
