"""Benchmark decontamination: flag training documents that share any
n-token span with an evaluation/benchmark set.

The standard large-corpus hygiene step (the GPT-3 appendix's 13-gram
rule; n is configurable because sensible values depend on tokenizer
and document length).  Both sides are shingled into n-token windows,
each window keyed by the md5 of its space-joined lowercase tokens, and
a distinct equi-join flags overlaps — all JVM-side built-ins.

Scale notes: the benchmark side is tiny by definition (an eval set),
so its distinct shingle table is broadcast and the scan over the
10^12-document training side stays shuffle-free; the per-document
shingle explode is a narrow op.  If the "benchmark" were ever large,
dropping the broadcast hint degrades to a hash join on the md5 key —
the same shape as exact dedup.  Window keys are md5 strings rather
than raw n-gram text so shuffle/broadcast bytes stay fixed-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tildener_spark.operators.dedup import WS_RE


def _shingle_keys(df: DataFrame, id_col: str, text_col: str, n: int,
                  out_id: str) -> DataFrame:
    """(id, text) -> distinct (out_id, sh) n-gram window keys."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), WS_RE)
    windows = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias(out_id),
                  F.explode(windows).alias("sh"))
        .distinct()
    )


def flag_contaminated(docs: DataFrame, benchmark: DataFrame,
                      n: int = 13,
                      id_col: str = "doc_id", text_col: str = "text",
                      bench_id_col: str = "bench_id",
                      bench_text_col: str = "text") -> DataFrame:
    """Documents sharing >= 1 n-token window with the benchmark.

    Returns (id_col, n_hits) — n_hits = distinct overlapping windows —
    for contaminated documents only (clean documents are absent, so
    the result is benchmark-sized, not corpus-sized).
    """
    doc_sh = _shingle_keys(docs, id_col, text_col, n, id_col)
    bench_sh = _shingle_keys(
        benchmark, bench_id_col, bench_text_col, n, "_bid"
    ).select("sh").distinct()
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
