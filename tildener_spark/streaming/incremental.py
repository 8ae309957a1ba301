"""Incremental crawl ingestion via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.8); this is the optional
scale-path for continuously arriving crawl partitions: the SAME
stateless tagging chain (extract → tokenize → classify → refine →
spans) runs under ``readStream`` with ``Trigger.AvailableNow`` —
process everything that has landed, checkpoint offsets, exit.  Each
micro-batch is idempotent per input file, which composes with the
per-stage lineage checkpointing of the batch pipeline (new partitions
stream in; linking/CC run as periodic batch compaction over the
accumulated mentions table — CC is iterative/global and does not
stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tildener_spark.config import EngineConfig
from tildener_spark.operators.document import make_process_document_udf
from tildener_spark.datagen import CORPUS_SCHEMA

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def tag_stream(pages: DataFrame, gazetteer_rows: list,
               cfg: EngineConfig | None = None) -> DataFrame:
    """Stateless tagging chain — valid on a streaming DataFrame.

    Uses the fused single-Arrow-pass UDF (operators/document.py), same
    as the batch pipeline."""
    cfg = cfg or EngineConfig()
    inits = frozenset(
        t[1] for t in gazetteer_rows if t[0] == "ORG_INIT")
    udf = make_process_document_udf(gazetteer_rows, cfg, inits)
    return (
        pages.select("url", "lang", udf(F.col("text")).alias("doc"))
        .select("url", "lang", F.col("doc.tokens").alias("tokens"))
    )


def run_available_now(tagged: DataFrame, out_dir: str,
                      checkpoint_dir: str) -> None:
    """Drain everything currently available, then stop."""
    q = (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
