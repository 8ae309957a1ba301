"""Mode-aware one-pass materialization for multi-consumer DataFrames.

Spark has no cross-branch common-subexpression elimination: a
DataFrame consumed by both sides of a self-join (or by several
downstream branches) recomputes its whole lineage once per consumer.
The dedup/similarity/CC operators therefore materialize such tables
exactly once.  HOW they materialize is mode-dependent:

* ``local[*]`` — ``localCheckpoint(eager=False)``: blocks live in the
  single JVM that is both driver and executor, nothing can be "lost",
  and there is no persist handle to leak (ContextCleaner frees the
  RDD when the DataFrame is GC'd).
* cluster — ``persist(MEMORY_AND_DISK)``: keeps the lineage, so an
  executor loss (or dynamic-allocation decommission) RECOMPUTES the
  missing partitions instead of failing the job.  ``localCheckpoint``
  here would truncate lineage to executor-local blocks and turn any
  executor loss into a job failure (ADVICE r02) — a robustness
  regression on exactly the documented 1000-executor scale path.

``release(df)`` is the symmetric cleanup: a no-op for the
localCheckpoint path (unpersisting a localCheckpointed RDD would drop
its ONLY copy), an ``unpersist()`` for the cluster path.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def _is_local(df: DataFrame) -> bool:
    return df.sparkSession.sparkContext.master.startswith("local")


def materialize_once(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once for multiple consumers (see module doc)."""
    if _is_local(df):
        return df.localCheckpoint(eager=False)
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def release(df: DataFrame) -> None:
    """Free a :func:`materialize_once` result after its last consumer
    has run.  Safe to skip — the cluster path is also ContextCleaner-
    freed on GC — but explicit release keeps long-lived sessions lean."""
    if not _is_local(df):
        df.unpersist()


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input plan has fewer
    partitions than the cluster has task slots.

    CPU-heavy narrow stages (interpreted higher-order shingle
    expressions, Arrow-batched signature UDFs) inherit the scan's
    partitioning; a small input file then serializes the whole stage
    onto one core regardless of cluster size — measured 11 s for the
    q11 shingle build at local[32] over ONE 600 KB parquet split
    (scripts/profile_q11.py).  At production scale input partitions
    far exceed ``defaultParallelism`` and this is a metadata-only
    no-op; below it, the one extra shuffle of raw rows is orders of
    magnitude cheaper than the serialized compute it unblocks.
    Results are partition-invariant (tests/test_partition_invariance).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
