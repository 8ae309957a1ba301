"""Similarity search over embedding columns (array<float>).

Training-data pipeline operator (not in the reference).  Two paths:

  * brute-force cosine top-k — the exact baseline: pair join +
    JVM-side dot product via ``aggregate(zip_with(...))`` (no Python),
    window row_number for the top-k.  O(n²) — correct at any n but
    only *used* at small n or within buckets;
  * LSH-bucketed (random-hyperplane signs) — the 100 TB path: each
    vector gets a b-bit sign signature from deterministic pseudo-random
    hyperplanes (seeded hash of dimension index — no stored model);
    top-k computed within buckets only.  Recall < 1 by construction;
    the bench compares both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(emb: DataFrame, k: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors per vector (excluding self).

    Output: (vec_id, neighbor_id, cos_sim, rank)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(vec_col, n_bits: int = 8, dim: int = 64,
                         seed: int = 42):
    """Deterministic random-hyperplane sign signature (bigint).

    Hyperplane h's weight for dimension d = ±1 from the parity of a
    hex digit of md5(seed|h|d) — reproducible across engines, no
    stored model.  bit h = sign(w_h · v) >= 0."""
    def plane_dot(h: int):
        terms = []
        for d in range(dim):
            digit = F.substring(F.md5(F.lit(f"{seed}|{h}|{d}")), 1, 1)
            w = F.when(
                digit.isin("1", "3", "5", "7", "9", "b", "d", "f"),
                F.lit(1.0)).otherwise(F.lit(-1.0))
            terms.append(w * F.element_at(vec_col, d + 1))
        total = terms[0]
        for t in terms[1:]:
            total = total + t
        return total

    sig = F.lit(0).cast("long")
    for h in range(n_bits):
        bit = F.when(plane_dot(h) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + bit.cast("long") * F.lit(1 << h)
    return sig


def lsh_topk(emb: DataFrame, k: int = 5, n_bits: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k: exact cosine *within* hyperplane buckets.

    The bucket join replaces the n² cross join with sum of per-bucket
    squares — the ANN scale path.  Vectors in singleton buckets get no
    neighbors (acceptable for dedup/retrieval recall targets; raise
    n_bits ↓ bucket size, lower n_bits ↑ recall)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", hyperplane_signature(F.col("v"), n_bits, dim, seed))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
            .alias("cos_sim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(emb: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cos >= threshold)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("doc_a"),
            F.col("b.vec_id").alias("doc_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6)
            .alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
