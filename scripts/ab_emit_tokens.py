"""A/B: slim docs cache built by pruning the full fused-UDF struct
(round-3 early form) vs a tokens-free UDF that never builds or
Arrow-serializes the tokens field (emit_tokens=False).

Interleaved trials in ONE Spark session so both modes see the same
host window; min-of-N per mode is the estimator (shared-VM noise only
inflates).  Usage:

    python scripts/ab_emit_tokens.py [cpus] [pages_parquet] [sweeps]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    pages_path = (sys.argv[2] if len(sys.argv) > 2
                  else "/tmp/tildener_scaling_127g02w5/pages")
    sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F
    from tildener_spark import get_spark
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df
    from tildener_spark.operators.document import make_process_document_udf

    spark = get_spark(app_name=f"ab-emit-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()
    gazdf = gazetteer_df(spark)
    gaz = [(r["ne_type"], r["surface"]) for r in gazdf.collect()]
    inits = {t[1] for t in gaz if t[0] == "ORG_INIT"}
    full_udf = make_process_document_udf(gaz, cfg, inits)
    slim_udf = make_process_document_udf(gaz, cfg, inits, emit_tokens=False)

    def build_prune():
        return pages.select(
            "url", "lang", full_udf(F.col("text")).alias("doc"),
        ).select(
            "url", "lang",
            F.struct("doc.mentions", "doc.triples", "doc.links",
                     "doc.surfaces", "doc.hub_pairs").alias("doc"),
        ).persist()

    def build_noemit():
        return pages.select(
            "url", "lang", slim_udf(F.col("text")).alias("doc"),
        ).persist()

    # warm-up both UDFs (codegen + worker pool)
    for udf in (full_udf, slim_udf):
        pages.limit(4000).repartition(cpus) \
            .select(udf(F.col("text")).alias("d")) \
            .select(F.size("d.mentions").alias("n")) \
            .groupBy().sum("n").collect()

    times: dict[str, list[float]] = {"prune": [], "noemit": []}
    for s in range(sweeps):
        for name, build in (("prune", build_prune), ("noemit", build_noemit)):
            t0 = time.perf_counter()
            df = build()
            df.count()
            dt = round(time.perf_counter() - t0, 2)
            times[name].append(dt)
            df.unpersist(blocking=True)
            print(f"sweep {s} {name}: {dt}s", flush=True)
    out = {"cpus": cpus, "n_docs": n_docs, "trials": times,
           "min_prune": min(times["prune"]),
           "min_noemit": min(times["noemit"])}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
