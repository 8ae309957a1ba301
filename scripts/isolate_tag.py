"""Isolate the tag-UDF anti-scaling: time (a) trivial pandas UDF,
(b) tokenize-only, (c) full tag UDF at a given core count.
Usage: python scripts/isolate_tag.py <cpus> [n_docs]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 48000

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType
    from tildener_spark import get_spark
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import gazetteer_df
    from tildener_spark.operators.classify import make_tag_pages_udf
    from tildener_spark.operators.tokenize import tokenize_text_py, TOKENS_TYPE

    spark = get_spark(app_name=f"iso-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"/tmp/profile_pages_{n_docs}")
    gaz_rows = [(r["ne_type"], r["surface"])
                for r in gazetteer_df(spark).collect()]
    cfg = EngineConfig()

    @F.pandas_udf(IntegerType())
    def trivial(text: pd.Series) -> pd.Series:
        return text.str.len()

    @F.pandas_udf(TOKENS_TYPE)
    def tok_only(text: pd.Series) -> pd.Series:
        return text.map(tokenize_text_py)

    tag = make_tag_pages_udf(gaz_rows, cfg)

    from tildener_spark.operators.document import make_process_document_udf
    inits = {r[1] for r in gaz_rows if r[0] == "ORG_INIT"}
    doc_udf = make_process_document_udf(gaz_rows, cfg, inits)

    t = {}

    def force(udf, agg):
        return pages.select(udf(F.col("text")).alias("o")) \
            .select(agg(F.col("o")).alias("x")).groupBy().sum("x").collect()

    # warm
    pages.limit(200).select(trivial("text").alias("o")) \
        .groupBy().sum("o").collect()
    for name, udf, agg in [
        ("trivial", trivial, lambda c: c),
        ("tok_only", tok_only, F.size),
        ("tok_only2", tok_only, F.size),
        ("full_tag", tag, F.size),
        ("full_tag2", tag, F.size),
        ("doc_udf", doc_udf, lambda c: F.size(c["tokens"])),
        ("doc_udf2", doc_udf, lambda c: F.size(c["tokens"])),
    ]:
        t0 = time.perf_counter()
        force(udf, agg)
        t[name] = round(time.perf_counter() - t0, 2)
        print(f"  {name:10s} {t[name]:8.2f}s", flush=True)

    docs = pages.select(doc_udf(F.col("text")).alias("doc")).persist()
    t0 = time.perf_counter()
    docs.count()
    t["doc_persist"] = round(time.perf_counter() - t0, 2)
    print(f"  doc_persist {t['doc_persist']:8.2f}s", flush=True)
    print(json.dumps({"cpus": cpus, **t}))
    spark.stop()


if __name__ == "__main__":
    main()
