"""Streaming knowledge-graph delta: triple extraction over a page
stream + cross-batch entity accumulation.

A continuously-ingesting crawl pipeline wants new pages to surface in
the KG without recomputing the corpus: the document-local stages
(extract → tokenize → classify → refine → spans → sentence-window
triples) are stateless per page, so the SAME fused single-Arrow-pass
UDF the batch pipeline uses (operators/document.py) runs unchanged
under ``readStream`` — streamed triples are bit-identical to the batch
pipeline's on the same pages (tests/test_streaming.py pins this).

The cross-document stages stay batch: linking / connected-components
canonicalization is global and iterative, so it runs as periodic
compaction over the accumulated triples table (the architecture
incremental.py documents).  What CAN be maintained online is the
per-entity-surface accumulator — first/last sighting and mention
count — via one ``applyInPandasWithState`` cell per (ne_type,
surface): the streaming counterpart of the batch ``kg_timeline``
operator (operators/graphstats.py entity_timeline), keyed on surfaces
because canonical ids only exist after batch compaction.

Scale shape: state is partitioned by the group key, one ~24-byte cell
per distinct surface (vocabulary-sized, orders of magnitude below the
page count); the triple stream itself carries no state at all.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tildener_spark.config import EngineConfig
from tildener_spark.operators.document import make_process_document_udf

TRIPLE_COLS = ("sent_id", "subj", "subj_type", "pred",
               "obj", "obj_type", "prob", "kind")


def triple_stream(pages: DataFrame, gazetteer_rows: list,
                  cfg: EngineConfig | None = None) -> DataFrame:
    """Streaming pages -> exploded (url, warc_ts, triple...) rows.

    Stateless: valid on a streaming DataFrame, one Arrow pass per
    micro-batch partition, no tokens/mentions crossing into the JVM
    (``emit_tokens=False, emit_mentions=False`` — the slim struct)."""
    cfg = cfg or EngineConfig()
    inits = frozenset(
        t[1] for t in gazetteer_rows if t[0] == "ORG_INIT")
    udf = make_process_document_udf(gazetteer_rows, cfg, inits,
                                    emit_tokens=False,
                                    emit_mentions=False)
    return (
        pages.select("url", "warc_ts",
                     udf(F.col("text")).alias("doc"))
        .select("url", "warc_ts",
                F.explode("doc.triples").alias("t"))
        .select("url", "warc_ts",
                *[F.col(f"t.{c}").alias(c) for c in TRIPLE_COLS])
    )


OUT_SCHEMA = ("ne_type string, surface string, "
              "first_seen timestamp, last_seen timestamp, "
              "n_endpoints bigint")
STATE_SCHEMA = ("first_seen timestamp, last_seen timestamp, "
                "n bigint")


def _accumulate(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's endpoint rows for one (ne_type, surface)
    into the persistent cell and emit the updated totals."""
    if state.exists:
        first, last, n = state.get
    else:
        first = last = None
        n = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        lo = pdf["warc_ts"].min()
        hi = pdf["warc_ts"].max()
        first = lo if first is None else min(first, lo)
        last = hi if last is None else max(last, hi)
    state.update((first, last, n))
    yield pd.DataFrame({
        "ne_type": [key[0]], "surface": [key[1]],
        "first_seen": [first], "last_seen": [last],
        "n_endpoints": [n],
    })


def entity_stats_stream(triples: DataFrame) -> DataFrame:
    """Streaming triples -> per-(ne_type, surface) running totals.

    Each micro-batch emits one updated row per surface it touched
    (update output mode); the totals survive across batches in the
    state store, so after draining N batches the latest row per key
    equals the batch groupBy over all N batches' triples."""
    endpoints = (
        triples.select(
            F.col("subj_type").alias("ne_type"),
            F.col("subj").alias("surface"), "warc_ts")
        .union(triples.select(
            F.col("obj_type").alias("ne_type"),
            F.col("obj").alias("surface"), "warc_ts"))
    )
    return endpoints.groupBy("ne_type", "surface").applyInPandasWithState(
        _accumulate,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_update_available_now(df: DataFrame, out_dir: str,
                             checkpoint_dir: str) -> None:
    """Drain an update-mode stream to parquet via foreachBatch
    (the parquet sink itself is append-only, so each micro-batch's
    updated rows are appended tagged with the batch id; the reader
    takes the max-batch row per key)."""
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    q = (
        df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
