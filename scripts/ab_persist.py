"""A/B: full-docs persist vs slim persist for the fused pipeline.
Usage: python scripts/ab_persist.py <cpus> <mode: full|slim|none> [n]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus, mode = int(sys.argv[1]), sys.argv[2]
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 200000

    from pyspark.sql import functions as F
    from tildener_spark import get_spark
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df
    from tildener_spark.operators.document import make_process_document_udf
    from tildener_spark.operators.graph import (
        build_entity_graph, canonicalize_triples)

    spark = get_spark(app_name=f"ab-{mode}-{cpus}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()
    pages = spark.read.parquet(f"/tmp/profile_pages_{n_docs}")
    gazdf = gazetteer_df(spark)
    gaz = [(r["ne_type"], r["surface"]) for r in gazdf.collect()]
    inits = {t[1] for t in gaz if t[0] == "ORG_INIT"}
    udf = make_process_document_udf(gaz, cfg, inits)

    # warm-up
    pages.limit(4000).repartition(cpus) \
        .select(udf(F.col("text")).alias("d")) \
        .select(F.size("d.tokens").alias("n")).groupBy().sum("n").collect()

    t0 = time.perf_counter()
    docs = pages.select("url", "lang", udf(F.col("text")).alias("doc"))
    if mode == "full":
        docs = docs.persist()
        src = docs

        def flat(p):
            return (src.select("url", F.explode(f"doc.{p}").alias("x"))
                    .select("url", "x.*"))
    elif mode == "slim":
        src = docs.select(
            "url",
            F.col("doc.mentions").alias("_mentions"),
            F.col("doc.triples").alias("_triples"),
            F.col("doc.links").alias("_links")).persist()

        def flat(p):
            return (src.select("url", F.explode(f"_{p}").alias("x"))
                    .select("url", "x.*"))
    else:  # none: explode-once pattern, no cache
        src = docs

        def flat(p):
            return (src.select("url", F.explode(f"doc.{p}").alias("x"))
                    .select("url", "x.*"))

    if mode != "none":
        src.count()
    t1 = time.perf_counter()
    mentions, triples, links = flat("mentions"), flat("triples"), flat("links")
    graph = build_entity_graph(mentions, cfg, inits, links=links)
    mapping = graph["mapping"].persist()
    canon = canonicalize_triples(triples, mapping)
    n = canon.count()
    t2 = time.perf_counter()
    print({"mode": mode, "cpus": cpus,
           "cache_build": round(t1 - t0, 2),
           "downstream": round(t2 - t1, 2),
           "sec": round(t2 - t0, 2), "n": n,
           "docs_per_hour": round(n_docs / (t2 - t0) * 3600)})
    spark.stop()


if __name__ == "__main__":
    main()
