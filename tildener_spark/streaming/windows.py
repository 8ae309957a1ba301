"""Watermarked event-time windowed aggregation over a crawl/event
stream — the late-data-tolerant counterpart of the batch q20 hourly
rollup.

Late events are the norm in crawl ingestion (a fetcher retries, a
WARC lands hours after its capture timestamp).  The watermark bounds
how long window state is retained: events later than the watermark
horizon are dropped, everything newer updates its window.  With
``Trigger.AvailableNow`` + append output, only windows whose
watermark has passed are emitted — the exactly-once batch-compaction
contract the rest of the engine uses.

No reference analog (batch-only toolkit, SURVEY.md §2.8); part of the
streaming surface of the new engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = ("event_id long, user_id long, ts timestamp, "
                 "event_type string, value double")


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark.

    Output: (win_start, win_end, event_type, n, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type", "n", "sum_value")
    )


def run_windowed_available_now(agg: DataFrame, out_dir: str,
                               checkpoint_dir: str) -> None:
    """Drain all available events; append closed (watermark-passed)
    windows to the sink."""
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
