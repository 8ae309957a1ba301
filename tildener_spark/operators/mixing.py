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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def shuffle_shards(docs: DataFrame, n_shards: int = 8,
                   id_col: str = "doc_id",
                   seed: str = "shuf") -> DataFrame:
    """Deterministic global training shuffle + shard layout.

    Every pretraining run shuffles the corpus before packing; a
    cluster-side ``ORDER BY rand()`` is neither reproducible nor
    resumable.  Here each document's placement is a pure function of
    its key: ``sort_key = md5(seed ':' id)`` gives the global random
    order, ``shard = pmod(first-15-hex of sort_key, n_shards)``
    scatters documents uniformly across writer shards, and
    ``pos`` ranks by sort_key WITHIN the shard — reading shards
    sequentially in pos order replays one fixed global permutation
    stream per shard (the layout a sharded dataset writer emits).

    Scale: the only shuffle is the per-shard ranking window keyed on
    shard — n_shards partitions, each holding corpus/n_shards rows;
    at 10^12 docs pick n_shards ~ output-file count (10^5-6) and the
    window per shard stays memory-bounded and embarrassingly
    parallel.  No global single-partition window anywhere.

    md5-hex → integer uses the FIRST 15 hex digits (60 bits < 2^63),
    so both engines parse it into a plain bigint; the sort key stays
    the full 32-hex string (collision-free ordering tie-broken by
    the id, making the permutation total and engine-independent).
    """
    key = F.md5(F.concat(F.lit(seed + ":"),
                         F.col(id_col).cast("string")))
    staged = docs.select(F.col(id_col).alias("doc_id"),
                         key.alias("_k"))
    shard = F.pmod(F.conv(F.substring("_k", 1, 15), 16, 10)
                   .cast("long"), F.lit(n_shards)).cast("int")
    staged = staged.select("doc_id", "_k", shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("_k", "doc_id")
    return staged.select(
        "doc_id", "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"))
