"""Adversarial-skew bench: hostile corpus vs uniform corpus.

The engine's skew guards (per-(type,band) bucket cap in
linking.lsh_candidate_pairs, per-(band_idx,band) cap in
dedup.minhash_lsh_pairs, shingle document-frequency cap in
dedup.ngram_jaccard_pairs, AQE skew-join) are functionally tested but
were never MEASURED under hostile skew (VERDICT r3 item 4).  This
script builds, from the same uniform base corpus:

  * one host owning 50% of all pages (URL rewrite);
  * one gazetteer ORG surface appearing in EVERY document (head
    entity — the reference's own gazetteers are head-heavy,
    Sample_Data/LV_Gazetteer/LV_FMEASURE_BOOTSTRAPPED_GAZETTEER.txt);
  * one word-shingle appearing in EVERY document (universal
    sentence);
  * a per-document DISTINCT near-duplicate ORG surface
    ("SIA Megabanka<num>") — thousands of vocabulary entries whose
    char-shingles nearly coincide, so minhash bands collide into one
    giant bucket (the LSH blow-up case: without the cap the vocab
    self-join is O(n²));
  * 2% of pages sharing IDENTICAL text (a cookie-wall page) — the
    doc-level minhash bucket blow-up.

and measures, at the same parallelism on both corpora:

  1. the full KG pipeline (url_dedup=True so the URL window sees the
     head host), reporting wall, n_triples and the
     lsh_bucket_guard observe() counters (rows/buckets dropped);
  2. dedup.minhash_lsh_pairs().count();
  3. dedup.ngram_jaccard_pairs().count().

PASS criterion (reported, judged against ~1.5x): skewed wall within
~1.5x of uniform wall per stage, with the guard counters proving the
caps fired rather than the input being accidentally benign.

Usage: SPARK_GRAFT_BENCH_DOCS=48000 python scripts/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "48000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

UNIVERSAL_SENTENCE = "Baltijas Banka apkalpo klientus katru darba dienu."
COOKIE_WALL = ("Šī vietne izmanto sīkdatnes. Lūdzu apstipriniet "
               "sīkdatņu izmantošanu lai turpinātu lasīt rakstu.")


def skew_corpus(pages):
    """Apply the four adversarial skews to a uniform pages corpus."""
    from pyspark.sql import functions as F
    num = F.regexp_extract("url", r"doc/([0-9]+)$", 1).cast("long")
    # 50% of pages on one mega-host (URL path kept distinct)
    url = F.when(
        num % 2 == 0,
        F.concat(F.lit("https://mega.example.com/page/"),
                 num.cast("string"))
    ).otherwise(F.col("url"))
    # every doc: universal sentence (head ORG + universal shingle)
    # + a distinct near-dup ORG surface (LSH vocabulary bucket bomb)
    text = F.concat(
        F.col("text"),
        F.lit("\n" + UNIVERSAL_SENTENCE + "\n"),
        F.lit("SIA Megabanka"),
        F.lpad(num.cast("string"), 7, "0"),
        F.lit(" šodien paziņoja rezultātus."),
    )
    # 2% of pages: identical cookie-wall text (doc-minhash bucket bomb)
    text = F.when(num % 50 == 0, F.lit(COOKIE_WALL)).otherwise(text)
    cols = [url.alias("url"), F.col("warc_ts")]
    if "html" in pages.columns:
        cols.append(F.col("html"))
    cols += [text.alias("text"), F.col("lang")]
    return pages.select(*cols)


def run_kg(spark, pages, gaz):
    from tildener_spark.config import EngineConfig
    from tildener_spark.plans.pipeline import run_pipeline
    t0 = time.perf_counter()
    res = run_pipeline(spark, pages, gaz,
                       EngineConfig(url_dedup=True))
    n = res.canonical_triples.count()
    sec = time.perf_counter() - t0
    for h in res.extra.get("caches", []):
        h.unpersist()
    return {"sec": round(sec, 2), "n_triples": n,
            "lsh_bucket_guard": res.counters.get("lsh_bucket_guard")}


def run_dedup(spark, pages):
    from tildener_spark.operators.dedup import (
        minhash_lsh_pairs, ngram_jaccard_pairs)
    out = {}
    t0 = time.perf_counter()
    out["minhash_pairs"] = minhash_lsh_pairs(
        pages, "url", "text").count()
    out["minhash_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["jaccard_pairs"] = ngram_jaccard_pairs(
        pages, "url", "text").count()
    out["jaccard_sec"] = round(time.perf_counter() - t0, 2)
    return out


def main() -> None:
    from tildener_spark import get_spark
    from tildener_spark.datagen import gazetteer_df, pages_df
    from tildener_spark.session import noise_probe

    spark = get_spark(app_name="skew-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")
    base = pages_df(spark, N_DOCS, partitions=64).persist()
    base.count()
    gaz = gazetteer_df(spark)
    report = {"n_docs": N_DOCS, "cpus": CPUS,
              "probe_before": noise_probe()}
    corpora = {"uniform": base, "skewed": skew_corpus(base).persist()}
    corpora["skewed"].count()
    # the kg ratio is the headline: run the two kg measurements
    # back-to-back (same contention window) with two interleaved
    # sweeps, min per corpus — the dedup stages run AFTER so their
    # heat does not land between the paired kg readings
    report.update({n: {} for n in corpora})
    for _sweep in range(2):
        for name, pages in corpora.items():
            row = run_kg(spark, pages, gaz)
            prev = report[name]
            if not prev or row["sec"] < prev["sec"]:
                report[name] = row
            print(json.dumps({name: row}), flush=True)
    for name, pages in corpora.items():
        report[name].update(run_dedup(spark, pages))
        print(json.dumps({name: report[name]}), flush=True)
    u, s = report["uniform"], report["skewed"]
    report["ratios"] = {
        "kg": round(s["sec"] / u["sec"], 2),
        "minhash": round(s["minhash_sec"] / max(u["minhash_sec"], .01), 2),
        "jaccard": round(s["jaccard_sec"] / max(u["jaccard_sec"], .01), 2),
    }
    report["probe_after"] = noise_probe()
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
