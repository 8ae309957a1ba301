"""Per-stage wall-time profile of the KG pipeline at one parallelism
level.  Usage: python scripts/profile_stages.py <cpus> [n_docs]

Times each stage by materializing it (count) in dependency order, so
stage N's time excludes upstream (upstream is persisted/counted first).
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
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 48000
    pages_path = sys.argv[3] if len(sys.argv) > 3 else None

    from tildener_spark import get_spark
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df, pages_df
    from tildener_spark.operators.classify import make_tag_pages_udf
    from tildener_spark.operators.graph import (
        build_entity_graph, canonicalize_triples)
    from tildener_spark.operators.spans import assemble_spans
    from tildener_spark.operators.tokenize import explode_tokens
    from tildener_spark.operators.triples import extract_triples
    from pyspark.sql import functions as F

    spark = get_spark(app_name=f"profile-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()

    t: dict[str, float] = {}

    def tick(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name:24s} {t[name]:8.2f}s", flush=True)
        return out

    from tildener_spark.operators.document import (
        explode_docs, make_process_document_udf)

    if pages_path and os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pages = spark.read.parquet(pages_path)
    else:
        pp = pages_path or f"/tmp/profile_pages_{n_docs}"
        if not os.path.exists(os.path.join(pp, "_SUCCESS")):
            pages_df(spark, n_docs, partitions=max(64, cpus * 2)) \
                .write.mode("overwrite").parquet(pp)
        pages = spark.read.parquet(pp)
    gaz = gazetteer_df(spark)

    warm_gaz = [(r["ne_type"], r["surface"]) for r in gaz.collect()]
    initialisms = {r["surface"] for r in gaz.filter(
        F.col("ne_type") == "ORG_INIT").collect()}
    doc_udf = make_process_document_udf(warm_gaz, cfg, initialisms)

    # warm-up python workers + codegen with the real UDF
    pages.limit(2000).repartition(cpus) \
        .select(doc_udf(F.col("text")).alias("d")) \
        .select(F.size("d.tokens").alias("n")).groupBy().sum("n").collect()

    T0 = time.perf_counter()
    docs = pages.select(
        "url", "lang", doc_udf(F.col("text")).alias("doc")).persist()
    tick("fused doc pass", lambda: docs.count())

    mentions = explode_docs(docs, "mentions")
    tick("mentions (narrow)", lambda: mentions.count())
    triples = explode_docs(docs, "triples")
    links = explode_docs(docs, "links")
    surfaces = explode_docs(docs, "surfaces")
    hub_pairs = docs.select(F.explode("doc.hub_pairs").alias("x")) \
        .select("x.*")

    graph = tick("build_graph (lazy)", lambda: build_entity_graph(
        mentions, cfg, initialisms, links=links, surfaces=surfaces,
        hub_pairs=hub_pairs))
    tick("entities", lambda: graph["entities"].count())

    from tildener_spark.operators.graph import canonicalize_triples_fused
    canon = canonicalize_triples_fused(triples, graph["corrections"])
    tick("canonical_triples", lambda: canon.count())
    total = time.perf_counter() - T0
    print(json.dumps({"cpus": cpus, "n_docs": n_docs, "stages": t,
                      "total": round(total, 2),
                      "docs_per_hour": round(n_docs / total * 3600)}))
    spark.stop()


if __name__ == "__main__":
    main()
