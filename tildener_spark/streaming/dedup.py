"""Cross-batch streaming deduplication — a custom stateful operator
via ``applyInPandasWithState``.

A continuously-ingesting crawl pipeline must not re-emit a document
whose content already passed through in an earlier micro-batch.
Spark's built-in ``dropDuplicates`` on a stream keeps unbounded state
rows per key with no control over the emitted representative; this
operator keeps ONE boolean-sized state cell per content hash and
emits exactly the first-seen row per hash, ever.

Scale shape: state is partitioned by the group key (the content
hash), so state lookups are local to the shuffle partition that owns
the hash — the same key-partitioned layout the batch
``exact_duplicates`` hash aggregate uses (operators/dedup.py).  State
size is O(distinct documents) × ~1 byte payload, spillable to the
state store; at 10^12 docs you would shard the stream by hash prefix
and run one query per shard, or add a TTL via ``GroupStateTimeout``.

No reference analog (the reference is batch-only, SURVEY.md §2.8);
this is part of the LLM-training-data operator family.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tildener_spark.operators.dedup import normalized_text

OUT_SCHEMA = "text_hash string, url string"
STATE_SCHEMA = "seen byte"


def _first_seen(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first row of this hash group if the hash has never
    been seen in any earlier micro-batch; mark it seen."""
    if state.exists:
        # already emitted in an earlier batch: swallow everything
        for _ in pdfs:
            pass
        return
    best_url = None
    for pdf in pdfs:
        if len(pdf):
            batch_min = pdf["url"].min()  # deterministic representative
            if best_url is None or batch_min < best_url:
                best_url = batch_min
    if best_url is not None:
        state.update((1,))
        yield pd.DataFrame({"text_hash": [key[0]], "url": [best_url]})


def dedup_stream(pages: DataFrame, id_col: str = "url",
                 text_col: str = "text") -> DataFrame:
    """Streaming DataFrame -> (text_hash, url) of first-seen docs.

    Works on a ``readStream`` source; each content hash is emitted at
    most once across the lifetime of the query (state persisted in
    the streaming checkpoint)."""
    keyed = pages.select(
        F.md5(normalized_text(F.col(text_col))).alias("text_hash"),
        F.col(id_col).alias("url"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _first_seen,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_available_now(deduped: DataFrame, out_dir: str,
                            checkpoint_dir: str) -> None:
    """Drain everything currently available through the stateful
    dedup, then stop (same Trigger.AvailableNow contract as
    incremental.run_available_now)."""
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
