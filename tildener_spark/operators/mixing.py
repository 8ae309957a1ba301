"""Deterministic data-mixture sampling (per-stratum rates).

LLM corpus preparation reweights sources — "keep 100% of wiki, 50%
of web, 10% of everything else".  Spark's ``DataFrame.sample`` is
seed-dependent on partitioning, so instead each row's fate is a pure
function of its KEY: keep iff the first 8 hex digits of
``md5(seed ':' key)`` sort below the stratum's threshold.  That makes
the sample partition-invariant, resumable (re-runs keep the same
rows), mirrorable in SQL, and exact-in-expectation; the comparison is
done on the lowercase-hex STRING, which orders identically to the
integer it encodes, so no engine-specific hex parsing is involved.

Scale: a per-row map over whole-stage codegen — no shuffle, no RNG
state, trivially 10^12-row-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hex_threshold(fraction: float) -> str:
    """fraction in [0,1] -> 8-hex-digit keep threshold.

    'g' sorts above every hex digit, so it is the keep-everything
    sentinel (an 8-digit threshold for 1.0 would need 9 digits and
    break the string comparison)."""
    if fraction >= 1.0:
        return "g"
    return format(max(int(fraction * (1 << 32)), 0), "08x")


def _bucket(key: Column, seed: str) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(seed + ":"), key.cast("string"))), 1, 8)


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str, seed: str = "mix") -> DataFrame:
    """Keyed Bernoulli sample: keep iff bucket(key) < threshold."""
    return df.filter(
        _bucket(F.col(key_col), seed) < F.lit(hex_threshold(fraction)))


def cluster_splits(clusters: DataFrame, fractions: tuple = (0.8, 0.1),
                   cluster_col: str = "cluster",
                   seed: str = "split") -> DataFrame:
    """Assign train/val/test by CLUSTER, not by document.

    Splitting unit = the near-dup cluster label, so every member of a
    cluster lands in the same split and near-duplicate leakage across
    the train/eval boundary is impossible BY CONSTRUCTION (the
    standard failure mode of doc-level splits over a crawl: the val
    set is full of near-copies of training pages and eval loss lies).
    ``fractions`` = (train, val); test gets the rest.  Assignment is
    the mixing.py keyed-md5 rule on the cluster label — deterministic,
    partition-invariant, resumable, SQL-mirrorable.

    Scale: one md5 map over a column — zero shuffle on top of
    whatever produced the cluster labels.
    """
    t_train = hex_threshold(fractions[0])
    t_val = hex_threshold(fractions[0] + fractions[1])
    return (clusters
            .withColumn("_b", _bucket(F.col(cluster_col), seed))
            .withColumn(
                "split",
                F.when(F.col("_b") < t_train, F.lit("train"))
                .when(F.col("_b") < t_val, F.lit("val"))
                .otherwise(F.lit("test")))
            .drop("_b"))


def leakage_safe_splits(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        fractions: tuple = (0.8, 0.1),
                        seed: str = "split") -> DataFrame:
    """End-to-end leakage-safe corpus split: LSH near-dup clusters
    (operators/dedup.py near_dup_clusters) -> per-cluster md5 split.

    Output: (doc_id, cluster, split)."""
    from tildener_spark.operators.dedup import near_dup_clusters
    return cluster_splits(
        near_dup_clusters(docs, id_col, text_col),
        fractions=fractions, seed=seed,
    ).select("doc_id", "cluster", "split")


def stratified_mix(df: DataFrame, strata_col: str,
                   fractions: dict[str, float], key_col: str,
                   seed: str = "mix",
                   default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum keyed sampling (the mixture table).

    ``fractions`` maps stratum value -> keep rate; strata absent from
    the map use ``default_fraction``.  Deterministic in (key, seed)
    only — adding a stratum to the map never reshuffles which rows
    of OTHER strata survive."""
    thr = F.lit(hex_threshold(default_fraction))
    for stratum in sorted(fractions):
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(hex_threshold(fractions[stratum]))) \
               .otherwise(thr)
    return df.filter(_bucket(F.col(key_col), seed) < thr)
