"""Bucketed-table sink + co-located joins.

At 100 TB the dominant recurring cost of a fact-fact join is the
shuffle of both sides; Spark's bucketed tables pay that shuffle ONCE
at write time — ``bucketBy(n, key).sortBy(key)`` persists each side
pre-hash-partitioned and pre-sorted — and every later equi-join on
the bucket key sort-merges the matching bucket files directly, with
NO Exchange on either side (``tests/test_bucketing.py`` asserts the
plan shape).  This is the file-layout half of the engine's shuffle
story: broadcast for small dims (q24), AQE for runtime re-plan,
bucketing for repeated big-big joins on a stable key.

Bucket counts must match across co-joined tables and should be
sized so one bucket ≈ one task's worth of data at the target scale
(128-256 MB); the count is a write-time contract, recorded in the
table metadata.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["write_bucketed", "bucketed_order_revenue"]


def write_bucketed(spark: SparkSession, df: DataFrame, name: str,
                   key: str, n_buckets: int = 8) -> DataFrame:
    """(Re)write ``df`` as a managed parquet table bucketed AND
    sorted by ``key``; returns the table-backed DataFrame.  The
    pre-existing table/location is dropped first so repeated calls
    are idempotent under the in-memory catalog (a fresh session
    forgets table metadata but the warehouse directory survives)."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    shutil.rmtree(os.path.join(wh, name.lower()),
                  ignore_errors=True)
    spark.sql(f"drop table if exists {name}")
    (df.write.format("parquet")
     .bucketBy(n_buckets, key).sortBy(key)
     .mode("overwrite").saveAsTable(name))
    return spark.table(name)


def bucketed_order_revenue(spark: SparkSession, sf_dir: str,
                           n_buckets: int = 8) -> DataFrame:
    """lineitem ⋈ orders on the order key, both sides bucketed at
    write time: the recurring join runs Exchange-free.  Returns
    per-priority revenue (decimal-exact, cast to double at the
    surface like q24) + line/order counts.
    """
    li = write_bucketed(
        spark, spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        "tildener_lineitem_bucketed", "l_orderkey", n_buckets)
    od = write_bucketed(
        spark, spark.read.parquet(f"{sf_dir}/orders.parquet"),
        "tildener_orders_bucketed", "o_orderkey", n_buckets)
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum((dec("l_extendedprice")
                   * (F.lit(1).cast("decimal(18,2)")
                      - dec("l_discount"))).cast("decimal(38,4)"))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.countDistinct("o_orderkey").cast("bigint")
            .alias("n_orders"))
    )
