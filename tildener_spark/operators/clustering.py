"""Deterministic Lloyd k-means over embedding columns.

Training-data pipeline operator (not in the reference): semantic
clustering is the backbone of cluster-balanced corpus curation
(SemDeDup/SSL-prototype pruning pick representatives per cluster;
DoReMi-style mixtures reweight by cluster) and of IVF index training.
Spark MLlib's KMeans is seed- and partitioning-dependent, so its
output can't be oracled or resumed reproducibly; this one is
bit-deterministic by construction:

  * seeds = the k vectors whose ``md5(vec_id)`` sorts first — a
    data-dependent but order-stable pseudo-random draw (the mixing.py
    keyed-md5 idea applied to initialization);
  * assignment = pure JVM expression, no UDF: argmin over clusters of
    ``c·c − 2·x·c`` (the ``‖x−c‖²`` argmin with the row-constant
    ``x·x`` dropped), the dot product a sequential
    ``aggregate(zip_with(...))`` fold; ties broken by cluster id via
    struct-ordered ``array_min``;
  * update = INTEGER sums: coordinates are pre-quantized with
    ``floor(x·10⁶ + 0.5)`` (floor is exact IEEE in every engine —
    no round() semantics in play), summed as bigint (exact,
    order-independent, partition-invariant), and the new centroid is
    ``floor(Σq/n + 0.5)/10⁶`` — every arithmetic step bitwise
    reproducible across engines, so a DuckDB replay of the loop
    reaches the same fixpoint coordinate-for-coordinate.

Scale shape: each iteration is one scan of the persisted projection
plus a (k × dim)-group partial aggregate (map-side combine absorbs
the fan-in; the shuffle moves k·dim·partitions rows, not the corpus).
Centroids live on the driver as k·dim doubles and return to the plan
as literal arrays — the data itself never collects.  bigint sums
overflow only past ~9·10¹² members per cluster at quant=10⁶ —
document-scale safe; shard the sum by ``pmod(vec_id, s)`` first if a
cluster can exceed that.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from tildener_spark.materialize import materialize_once

QUANT = 1_000_000


def _dot(a, b):
    # sequential left fold — same op order as the oracle's replay
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v)


def kmeans_clusters(emb: DataFrame, k: int = 4, n_iter: int = 3,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    dim: int = 64) -> DataFrame:
    """Cluster vectors with ``n_iter`` Lloyd rounds; returns
    (vec_id, cluster) with cluster in [0, k).

    Null / wrong-dimension vectors are dropped (the q19b real-null
    contract).  Empty clusters keep their previous centroid."""
    e = (emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("emb"))
         .filter(F.col("emb").isNotNull() & (F.size("emb") == dim))
         .withColumn(
             "embq",
             F.transform(
                 "emb",
                 lambda x: F.floor(x * QUANT + F.lit(0.5))
                 .cast("long"))))
    e = materialize_once(e)

    seeds = (e.orderBy(F.md5(F.col("vec_id").cast("string")),
                       "vec_id")
             .limit(k).select("emb").collect())
    cents = [list(r["emb"]) for r in seeds]

    def assign(df):
        choices = []
        for c, cen in enumerate(cents):
            cc = 0.0
            for v in cen:            # sequential fold == engine fold
                cc += v * v
            key = F.lit(cc) - 2.0 * _dot(
                F.col("emb"),
                F.array(*[F.lit(float(v)) for v in cen]))
            choices.append(F.struct(key.alias("k"),
                                    F.lit(c).alias("c")))
        return df.withColumn(
            "cluster", F.array_min(F.array(*choices))["c"])

    for _ in range(n_iter):
        sums = (assign(e)
                .select("cluster", F.posexplode("embq")
                        .alias("pos", "q"))
                .groupBy("cluster", "pos")
                .agg(F.sum("q").alias("sq"),
                     F.count("*").alias("cnt"))
                .collect())
        upd: dict[int, list[float]] = {}
        for r in sums:
            upd.setdefault(r["cluster"], [0.0] * dim)[r["pos"]] = (
                math.floor(float(r["sq"]) / float(r["cnt"]) + 0.5)
                / QUANT)
        for c, cen in upd.items():   # empty clusters keep centroids
            cents[c] = cen

    return assign(e).select("vec_id", "cluster")


def pq_encode(emb: DataFrame, n_subspaces: int = 4, k: int = 16,
              n_iter: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding",
              dim: int = 64) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): split each
    vector into ``n_subspaces`` contiguous subvectors, train the
    deterministic k-means of :func:`kmeans_clusters` independently
    per subspace, and emit each vector's code word — the compressed
    representation an ANN index stores (``n_subspaces·log2(k)`` bits
    instead of ``dim`` floats).

    Output: (vec_id, code) with code = '-'.joined per-subspace
    cluster ids, plus the per-subspace id columns c0..c{S-1}.

    Determinism: inherited wholesale from kmeans_clusters (md5
    seeding, expression argmin, integer centroid sums), so the full
    codebook training replays exactly in the DuckDB oracle.

    Scale shape: S independent kmeans runs over the SAME persisted
    projection — per iteration each is one scan + a (k·subdim)-group
    partial agg; the final code join is S-way on vec_id
    (co-partitioned hash joins).  A production run folds the S
    subspace argmins into ONE pass by stacking the S·k centroids as
    literals (same expressions, one scan per iteration); the
    composition here keeps each subspace bit-identical to the
    standalone q55 operator, which is what the oracle contract
    wants."""
    if dim % n_subspaces:
        raise ValueError("dim must divide into n_subspaces")
    sub = dim // n_subspaces
    base = (emb.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).cast("array<double>").alias("_full"))
            .filter(F.col("_full").isNotNull()
                    & (F.size("_full") == dim)))
    base = materialize_once(base)
    out = None
    for j in range(n_subspaces):
        e_j = base.select(
            "vec_id",
            F.slice("_full", j * sub + 1, sub).alias("embedding"))
        a_j = kmeans_clusters(e_j, k=k, n_iter=n_iter, dim=sub) \
            .withColumnRenamed("cluster", f"c{j}")
        out = a_j if out is None else out.join(a_j, "vec_id")
    code = F.concat_ws(
        "-", *[F.col(f"c{j}").cast("string")
               for j in range(n_subspaces)])
    return out.select(
        "vec_id", code.alias("code"),
        *[f"c{j}" for j in range(n_subspaces)])
