"""Per-stage wall breakdown of the fused kg pipeline.

run_pipeline materializes the fused per-document Arrow pass (the
docs cache) with one count() before the graph stage, so timing the
run_pipeline call itself isolates the document-local stage; the
subsequent entities/canonical counts isolate the cross-document
graph stage (LSH linking + CC) and the canonicalization joins.

Usage: python scripts/profile_kg.py [cores] [n_docs] [pages_parquet]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    pages_path = sys.argv[3] if len(sys.argv) > 3 else None

    from tildener_spark import get_spark
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df, pages_df
    from tildener_spark.plans.pipeline import run_pipeline

    spark = get_spark(app_name=f"profile-{cores}",
                      master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    if pages_path:
        pages = spark.read.parquet(pages_path)
    else:
        p = f"/tmp/tildener_profile_pages_{n_docs}"
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            pages_df(spark, n_docs, partitions=64).write \
                .mode("overwrite").parquet(p)
        pages = spark.read.parquet(p)
    gaz = gazetteer_df(spark)

    # warm-up (codegen + Python worker pool), then clean caches
    warm = pages.limit(8000).repartition(cores)
    run_pipeline(spark, warm, gaz, EngineConfig()).canonical_triples.count()
    spark.catalog.clearCache()

    t = {}
    t0 = time.perf_counter()
    res = run_pipeline(spark, pages, gaz, EngineConfig())
    t["docs_fused_pass"] = round(time.perf_counter() - t0, 2)
    t1 = time.perf_counter()
    n_ent = res.entities.count()
    t["graph_linking_cc"] = round(time.perf_counter() - t1, 2)
    t2 = time.perf_counter()
    n_can = res.canonical_triples.count()
    t["canonicalize"] = round(time.perf_counter() - t2, 2)
    t["total"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"cores": cores, "n_docs": n_docs, **t,
                      "entities": n_ent, "canonical_triples": n_can}))
    spark.stop()


if __name__ == "__main__":
    main()
