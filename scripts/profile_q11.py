"""Decompose q11_ngram_jaccard wall time at sf0.1.

Stages timed separately in one session (each with its own action):

  shingle    shingle build + explode + count        (no window/join)
  df_window  + document-frequency window + filter   (the skew guard)
  mat        + materialize_once barrier
  join_agg   + self-join + pair aggregate + filter  (the full query)

Also prints pair-join input/output sizes so join volume is attributable.

Usage: python scripts/profile_q11.py [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import Window, functions as F
    from tildener_spark import get_spark
    from tildener_spark.materialize import materialize_once
    from tildener_spark.operators import dedup

    spark = get_spark(app_name="q11-prof", master=f"local[{cores}]",
                      shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    docs.count()  # warm scan

    t = {}
    sh = docs.select(
        F.col("doc_id"),
        dedup.word_shingles(F.col("text"), 3).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    flat = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s"))

    t0 = time.perf_counter()
    n_flat = flat.count()
    t["shingle"] = round(time.perf_counter() - t0, 2)

    rare = (
        flat.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("df") <= 1000)
        .drop("df"))

    t0 = time.perf_counter()
    n_rare = rare.count()
    t["df_window"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rare_m = materialize_once(rare)
    n_rare2 = rare_m.count()
    t["mat"] = round(time.perf_counter() - t0, 2)

    a, b = rare_m.alias("a"), rare_m.alias("b")
    common = (
        a.join(b, "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"),
                 F.col("a.n_sh").alias("n_a"),
                 F.col("b.n_sh").alias("n_b"))
        .agg(F.count(F.lit(1)).alias("n_common")))
    jac = F.col("n_common") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common"))
    out = (common.withColumn("jaccard", F.round(jac, 6))
           .filter(F.col("jaccard") >= 0.3)
           .select("doc_a", "doc_b", "jaccard"))

    t0 = time.perf_counter()
    n_out = out.count()
    t["join_agg"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    n_pairs = common.count()
    t["join_agg_2nd"] = round(time.perf_counter() - t0, 2)

    print(json.dumps({**t, "n_flat": n_flat, "n_rare": n_rare,
                      "n_rare_mat": n_rare2, "n_pair_groups": n_pairs,
                      "n_out": n_out, "cores": cores}))


if __name__ == "__main__":
    main()
