"""Streaming scale evidence: AvailableNow multi-micro-batch ingest
through the stateful cross-batch dedup (VERDICT r3 item 7).

Writes >=100k docs as N parquet drops (one per micro-batch via
maxFilesPerTrigger), runs the applyInPandasWithState dedup
(streaming/dedup.py) with Trigger.AvailableNow, and records per-batch
latency + state-store rows from the query progress events, plus the
on-disk state-store size afterwards.  A duplicate fraction is planted
so the cross-batch suppression is observable (later batches emit
fewer rows than they ingest).

Usage: SPARK_GRAFT_BENCH_DOCS=100000 python scripts/streaming_bench.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_STREAM_BATCHES", "5"))
DUP_FRAC = 0.2  # 20% of docs repeat an earlier doc's text


def main() -> None:
    from pyspark.sql import functions as F

    from tildener_spark import get_spark
    from tildener_spark.datagen import pages_df
    from tildener_spark.session import noise_probe
    from tildener_spark.streaming.dedup import dedup_stream

    spark = get_spark(app_name="streaming-bench", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tildener_stream_bench_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)

    # one parquet file per intended micro-batch; every 5th doc of
    # batches > 0 reuses a batch-0 text (cross-batch duplicate)
    per_batch = N_DOCS // N_BATCHES
    base = pages_df(spark, N_DOCS, partitions=N_BATCHES * 4).persist()
    base.count()
    num = F.regexp_extract("url", r"doc/([0-9]+)$", 1).cast("long")
    probe0 = noise_probe()
    # every 5th doc carries one of five fixed texts: within batch 0
    # they are first-seen, in every later batch they are cross-batch
    # duplicates the state must suppress
    dup_src = F.concat(
        F.lit("Dup seed text nr "),
        (F.floor((num % 25) / 5) + 1).cast("string"),
        F.lit(". Šis teksts atkārtojas katrā paketē."))
    for b in range(N_BATCHES):
        part = base.filter(
            (num >= b * per_batch) & (num < (b + 1) * per_batch))
        part = part.withColumn(
            "text",
            F.when(num % 5 == 0, dup_src).otherwise(F.col("text")))
        part.select("url", "text").coalesce(1).write.mode(
            "append").parquet(in_dir)

    pages = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    q = (
        dedup_stream(pages).writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.perf_counter()
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = []
    for p in q.recentProgress:
        op = (p["stateOperators"] or [{}])[0]
        batches.append({
            "batch": p["batchId"],
            "rows_in": p["numInputRows"],
            "batch_ms": p["batchDuration"],
            "state_rows": op.get("numRowsTotal"),
            "state_bytes": op.get("memoryUsedBytes"),
            "rows_updated": op.get("numRowsUpdated"),
        })
    emitted = spark.read.parquet(out_dir).count()
    ingested = spark.read.parquet(in_dir).count()
    state_disk = sum(
        os.path.getsize(f) for f in glob.glob(
            os.path.join(ckpt, "state", "**"), recursive=True)
        if os.path.isfile(f))
    report = {
        "n_docs": ingested, "n_batches": len(batches),
        "emitted_first_seen": emitted,
        "suppressed_duplicates": ingested - emitted,
        "wall_sec": round(wall, 2),
        "docs_per_hour": round(ingested / wall * 3600, 1),
        "state_store_disk_bytes": state_disk,
        "probe_cpu_ms": max(probe0["probe_cpu_ms"],
                            noise_probe()["probe_cpu_ms"]),
        "batches": batches,
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
