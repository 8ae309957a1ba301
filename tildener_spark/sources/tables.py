"""Table sources: driver testdata parquet + pages-shaped views.

The reference's "directory as corpus" (ProcessDirectory.pl:55-73)
becomes a partitioned table scan; with an Iceberg catalog configured
the same loaders read ``spark.read.format("iceberg")`` — plain
parquet keeps this sandbox dependency-free while preserving layout
semantics (column pruning + predicate pushdown verified in tests).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages shape.

    Used where a pages-like corpus at driver scale factors is needed;
    html is the canonical wrapping of text (so extract_text(html) ==
    normalized text)."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>d</title></head><body><p>"),
        F.regexp_replace(F.col("text"), "&", "&amp;"),
        F.lit("</p></body></html>"),
    ).cast("binary")
    return docs.select(
        F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                 F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
        .alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
    )
