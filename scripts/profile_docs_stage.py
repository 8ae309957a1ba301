"""Decompose the fused docs-stage wall time at one parallelism level.

The scaling bench's dominant stage is pages-scan -> fused slim UDF ->
persist -> count.  This script times, on the same pre-materialized
pages parquet and in one session:

  scan       parquet scan + text length agg (no Python)
  udf_flow   full UDF, minimal JVM-side sink (sum of triple counts),
             NO persist — isolates scan + Arrow both ways + compute
  udf_cache  the production form: persist() + count()

udf_flow - scan        ~ Python compute + Arrow transfer
udf_cache - udf_flow   ~ InMemoryRelation columnar cache build cost

Usage: python scripts/profile_docs_stage.py [cores] [pages_parquet]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pages_path = (sys.argv[2] if len(sys.argv) > 2
                  else "/tmp/profile_pages_200000")

    from pyspark.sql import functions as F

    from tildener_spark import get_spark
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df
    from tildener_spark.operators.document import (
        make_process_document_udf)

    spark = get_spark(app_name=f"docs-stage-{cores}",
                      master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    gaz = gazetteer_df(spark)
    gaz_rows = [(r["ne_type"], r["surface"]) for r in gaz.collect()]
    inits = frozenset(
        s for t, s in gaz_rows if t == "ORG_INIT")
    udf = make_process_document_udf(
        gaz_rows, EngineConfig(), inits, emit_tokens=False,
        emit_mentions=False)  # the production slim form

    # warm-up: codegen + Python worker pool on a slice
    pages.limit(4000).select(udf(F.col("text")).alias("doc")) \
        .selectExpr("sum(size(doc.triples))").collect()

    t = {}
    t0 = time.perf_counter()
    pages.select(F.length("text").alias("n")).agg(F.sum("n")).collect()
    t["scan"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    pages.select(udf(F.col("text")).alias("doc")) \
        .select(F.size("doc.triples").alias("n")) \
        .agg(F.sum("n")).collect()
    t["udf_flow"] = round(time.perf_counter() - t0, 2)

    docs = pages.select(
        "url", "lang", udf(F.col("text")).alias("doc")).persist()
    t0 = time.perf_counter()
    docs.count()
    t["udf_cache"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    docs.select(F.size("doc.triples").alias("n")) \
        .agg(F.sum("n")).collect()
    t["cache_rescan"] = round(time.perf_counter() - t0, 2)
    docs.unpersist()

    t["cores"] = cores
    print(json.dumps(t))


if __name__ == "__main__":
    main()
