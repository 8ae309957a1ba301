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

import atexit
import os
import shutil
import tempfile

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def _is_local(df: DataFrame) -> bool:
    return df.sparkSession.sparkContext.master.startswith("local")


def materialize_once(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once for multiple consumers (see module doc)."""
    if _is_local(df):
        return df.localCheckpoint(eager=False)
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def materialize_step(df: DataFrame, tag: str = "step") -> DataFrame:
    """HARD materialization barrier for iterative parameter tables
    (train_transe's mini-batch loop): write to parquet, read back.

    Neither in-memory option survives a long step chain there:

    * ``localCheckpoint`` truncates the plan but the LogicalRDD
      carries the ORIGIN plan's statistics forward, so each step's
      join-product sizeInBytes estimate compounds on the previous
      step's (bit-length multiplying ~6x per step through the five
      keyed joins) and by ~8 chained steps Catalyst's stats visitor
      is multiplying million-bit BigIntegers — measured: step walls
      3-6 s flat, then 55 s, then unbounded;
    * ``persist()+count()`` reports real cached stats, but
      unpersisting the PRIOR step's entry cascades a re-cache of the
      dependent entry, rebuilding the full un-truncated lineage —
      measured straight to a driver OOM.

    A parquet round trip severs plan, stats, and cache ancestry
    completely and reports real file-size statistics — the same
    thing a production distributed trainer does when it snapshots
    parameters per step.  Files live under a session-scoped temp dir
    cleaned up at exit; each call writes a fresh subdir."""
    global _STEP_SEQ
    spark = df.sparkSession
    base = _step_dir()
    _STEP_SEQ += 1
    path = os.path.join(base, f"{tag}_{_STEP_SEQ:06d}")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


_STEP_BASE: str | None = None
_STEP_SEQ = 0


def _step_dir() -> str:
    global _STEP_BASE
    if _STEP_BASE is None:
        _STEP_BASE = tempfile.mkdtemp(prefix="tildener_steps_")
        atexit.register(shutil.rmtree, _STEP_BASE,
                        ignore_errors=True)
    return _STEP_BASE


def release(df: DataFrame) -> None:
    """Free a :func:`materialize_once` result after its last consumer
    has run.  Safe to skip — the cluster path is also ContextCleaner-
    freed on GC — but explicit release keeps long-lived sessions lean.
    :func:`materialize_step` results need no release (their files go
    with the session temp dir)."""
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
