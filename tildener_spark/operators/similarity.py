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

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import DoubleType

from tildener_spark.materialize import (
    ensure_min_parallelism, materialize_once)


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
    e = ensure_min_parallelism(emb).select(
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


@F.pandas_udf(DoubleType())
def cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine for the ANN candidate path.

    numpy over whole batches beats the interpreted higher-order
    aggregate ~10x at millions of pairs; the builtin-expression
    ``cosine`` stays on the brute-force/oracle path where bit-exact
    cross-engine comparison matters."""
    import numpy as np

    # null / ragged vectors must not fail the whole stage NOR sneak
    # into the ranking: invalid rows become REAL NULLS (NaN would sort
    # first under desc() and pass >= threshold filters — ADVICE r02),
    # and validity is per-row (lens equal and > 0), scored per length
    # group, so one corrupt over-long vector can't invalidate the rest
    # of its Arrow batch.
    lens = np.array([len(v) if v is not None else -1 for v in a])
    lens_b = np.array([len(v) if v is not None else -1 for v in b])
    valid = (lens == lens_b) & (lens > 0)
    a_np, b_np = a.to_numpy(), b.to_numpy()
    groups = np.unique(lens[valid])
    if valid.all() and len(groups) == 1:
        # fast path (the overwhelmingly common batch: every row valid,
        # one dim) — plain float64 out, no masked-array construction
        A = np.stack(a_np)
        B = np.stack(b_np)
        dots = np.einsum("ij,ij->i", A, B)
        norms = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(norms > 0, dots / norms, 0.0)
        return pd.Series(out, index=a.index)
    out = np.full(len(a), np.nan)
    for L in groups:
        m = valid & (lens == L)
        A = np.stack(a_np[m])
        B = np.stack(b_np[m])
        dots = np.einsum("ij,ij->i", A, B)
        norms = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out[m] = np.where(norms > 0, dots / norms, 0.0)
    # pd.array maps the NaN holes (the invalid rows — valid positions
    # can't produce NaN) to real <NA>, so Arrow emits true nulls
    return pd.Series(pd.array(out, dtype="Float64"), index=a.index)


# asNondeterministic pins the evaluation site: the cos_sim threshold
# filter in the near-dup/top-k paths otherwise gets pushed below the
# scoring Project with a CLONED cosine_batch — the expensive numpy
# cosine ran twice per candidate pair (caught by audit_plans.py
# DUP-PY-UDF).  Values are deterministic; only plan placement changes.
cosine_batch = cosine_batch.asNondeterministic()


def make_table_buckets_udf(dim: int = 64, n_bits: int = 8,
                           n_tables: int = 8, seed: int = 42):
    """Arrow-batched multi-table hyperplane bucketing UDF.

    All n_tables sign signatures in one matrix multiply: W is
    (dim, n_tables*n_bits) of ±1 deterministic pseudo-random
    hyperplane weights — weight(h, d) = parity of the first hex digit
    of md5(seed'|h|d), with seed' = seed + 7919*table — reproducible,
    no stored model; bit h of a signature = sign(w_h · v) >= 0.
    Shared by lsh_topk and embedding_near_duplicates_lsh."""
    import hashlib

    import numpy as np

    W = np.empty((dim, n_tables * n_bits))
    for t in range(n_tables):
        s = seed + 7919 * t
        for h in range(n_bits):
            for d in range(dim):
                digit = hashlib.md5(
                    f"{s}|{h}|{d}".encode()).hexdigest()[0]
                W[d, t * n_bits + h] = 1.0 if digit in "13579bdf" else -1.0
    powers = np.tile(np.power(2, np.arange(n_bits), dtype=np.int64),
                     n_tables).reshape(n_tables, n_bits)

    @F.pandas_udf("array<bigint>")
    def table_buckets(v: pd.Series) -> pd.Series:
        import numpy as np
        # null / wrong-dim vectors get a null signature array —
        # posexplode drops them, so they produce no candidates instead
        # of crashing the stage (ADVICE r02)
        v_np = v.to_numpy()
        valid = np.array(
            [x is not None and len(x) == dim for x in v_np])
        out = np.full(len(v_np), None, dtype=object)
        if valid.any():
            V = np.stack(v_np[valid])
            bits = (V @ W >= 0).astype(np.int64).reshape(
                -1, n_tables, n_bits)
            sigs = (bits * powers).sum(axis=2)
            tmp = np.empty(len(sigs), dtype=object)
            tmp[:] = list(sigs)
            out[valid] = tmp
        return pd.Series(out, index=v.index)

    return table_buckets


def _lsh_candidate_pairs(emb: DataFrame, id_col: str, vec_col: str,
                         dim: int, seed: int, n_bits: int,
                         n_tables: int, ordered: bool) -> DataFrame:
    """Distinct candidate id-pairs from multi-table bucket self-joins.

    ``ordered=True`` keeps only vec_id < neighbor_id (near-dup shape);
    False keeps both directions (top-k shape).  Dedup happens BEFORE
    scoring — the same pair surfaces from several tables and the
    cosine is the expensive part."""
    emb = ensure_min_parallelism(emb)
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        make_table_buckets_udf(dim, n_bits, n_tables, seed)(
            F.col(vec_col).cast("array<double>")).alias("bks"),
    ).select("vec_id", F.posexplode("bks").alias("t", "bucket"))
    # bucket UDF once, not per side (mode-aware: see materialize.py)
    e = materialize_once(e)
    a, b = e.alias("a"), e.alias("b")
    cond = (F.col("a.vec_id") < F.col("b.vec_id")) if ordered \
        else (F.col("a.vec_id") != F.col("b.vec_id"))
    return (
        a.join(b, ["t", "bucket"])
        .filter(cond)
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )


def _score_pairs(emb: DataFrame, cand: DataFrame,
                 id_col: str, vec_col: str) -> DataFrame:
    """Re-join vectors onto distinct id-pairs and cosine-score them."""
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    return (
        cand
        .join(base.withColumnRenamed("v", "va"), "vec_id")
        .join(base.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("v").alias("vb")), "neighbor_id")
        .select(
            "vec_id", "neighbor_id",
            F.round(cosine_batch(F.col("va"), F.col("vb")), 6)
            .alias("cos_sim"))
        # invalid vectors scored null by cosine_batch; drop them here
        # so no ranking/threshold consumer ever sees them (ADVICE r02)
        .filter(F.col("cos_sim").isNotNull())
    )


def lsh_topk(emb: DataFrame, k: int = 5, n_bits: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, seed: int = 42,
             n_tables: int = 24) -> DataFrame:
    """Approximate top-k: exact cosine within hyperplane buckets,
    unioned over ``n_tables`` independent hash tables.

    The bucket join replaces the n² cross join with sum of per-bucket
    squares — the ANN scale path.  A single sign-LSH table has low
    top-k recall (a p_bit^n_bits survival per pair; measured 6% at
    n_bits=6 on the synthetic embeddings), so candidates are unioned
    across L tables — recall 1-(1-p)^L — and deduped before ranking.
    Raise n_bits ↓ bucket size / join fan-out; raise n_tables ↑
    recall at linear candidate-generation cost.  Recall@k vs
    brute_force_topk is gated in tests/test_similarity.py and exposed
    as the q21_lsh_recall query.

    The (n_bits=5, n_tables=24) defaults are the measured knee of the
    recall-vs-candidate-volume curve (BENCH/ANN_SWEEP.md, round 4):
    recall@5 = 0.88 on both the clustered and the uniform mix at ~67k
    candidates per 500 vectors — the next recall step (0.94 at L=32)
    costs 18% more candidates, and sharper bit depths (6, 8) need
    far more tables for the same recall because per-table survival
    falls geometrically in n_bits.

    Cosine is symmetric, so candidates are generated ORDERED (a < b,
    half the bucket-join output and half the distinct), scored once,
    and the scored pairs mirrored for the per-vector ranking — the
    cosine UDF runs over half the rows the both-directions form paid
    for.  The mirror's scores are bit-identical (elementwise product
    and norms commute in IEEE), so ranking is unaffected."""
    cand = _lsh_candidate_pairs(
        emb, id_col, vec_col, dim, seed, n_bits, n_tables, ordered=True)
    scored = materialize_once(
        _score_pairs(emb, cand, id_col, vec_col))
    pairs = scored.unionByName(scored.select(
        F.col("neighbor_id").alias("vec_id"),
        F.col("vec_id").alias("neighbor_id"),
        "cos_sim"))
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates_lsh(emb: DataFrame, threshold: float = 0.95,
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  dim: int = 64, seed: int = 42,
                                  n_bits: int = 6,
                                  n_tables: int = 12) -> DataFrame:
    """LSH-bucketed embedding near-dup pairs (a < b, cos >= threshold)
    — the scale path for :func:`embedding_near_duplicates`.

    Candidate pairs from multi-table hyperplane buckets, exact cosine
    verify at the threshold.  At high thresholds the sign-agreement
    probability per bit is 1 - arccos(cos)/π (≈0.90 at cos 0.95), so
    pair survival per table is ≈0.9^n_bits and recall across L tables
    is 1-(1-0.9^n_bits)^L ≈ 0.9998 at the defaults — the residual
    miss probability is the documented approximation.  Output schema
    matches the exact operator: (doc_a, doc_b, cos_sim)."""
    cand = _lsh_candidate_pairs(
        emb, id_col, vec_col, dim, seed, n_bits, n_tables, ordered=True)
    return (
        _score_pairs(emb, cand, id_col, vec_col)
        .filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("vec_id").alias("doc_a"),
            F.col("neighbor_id").alias("doc_b"),
            "cos_sim")
    )


def contrastive_triplets(emb: DataFrame, threshold: float = 0.45,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int = 64, seed: int = 42,
                         n_bits: int = 4, n_tables: int = 16,
                         probe_k: int = 4) -> DataFrame:
    """Mine (anchor, positive, negative) triplets for contrastive
    embedding training.

    * **Positives**: LSH near-dup pairs (:func:`embedding_near_
      duplicates_lsh`), symmetrized so either member anchors; each
      anchor keeps its hardest positive — rank 1 by (cos desc, id).
    * **Negatives**: a deterministic keyed sample, NOT an
      anchor-dependent search.  Every vector is assigned one of 16
      pools by ``md5('negb:'||id)`` and ranked INSIDE its pool once
      by ``md5('negr:'||id)`` (anchor-independent — this is what
      keeps the join linear); the anchor probes the pool
      ``md5('probe:'||anchor)`` and takes the best-ranked member
      that is neither itself nor one of its positives, looking at
      most ``probe_k`` deep.  An anchor whose whole probe window
      conflicts (or whose sampled negative has an invalid vector)
      is dropped — both rare and deterministic.

    Scale shape: pool ranking is one window over 16 groups of the
    id table; the probe join has fanout ``probe_k`` per anchor; the
    anti-join against the positive set is key-partitioned.  Nothing
    is anchor × pool quadratic.  md5-keyed choices make the oracle
    replay exact (the q30 mixing parity pattern).

    Output: (anchor, pos_id, pos_cos, neg_id, neg_cos), cosines
    round(.,6).
    """
    pairs = embedding_near_duplicates_lsh(
        emb, threshold, id_col, vec_col, dim, seed, n_bits, n_tables)
    sym = (
        pairs.select(F.col("doc_a").alias("anchor"),
                     F.col("doc_b").alias("pos_id"), "cos_sim")
        .union(pairs.select(F.col("doc_b").alias("anchor"),
                            F.col("doc_a").alias("pos_id"), "cos_sim"))
    )
    # consumed twice (hardest-positive rank + negative anti-join):
    # cut the LSH/cosine lineage once, mode-aware
    sym = materialize_once(sym)
    w_pos = Window.partitionBy("anchor").orderBy(
        F.col("cos_sim").desc(), F.col("pos_id").asc())
    pos = (
        sym.withColumn("prn", F.row_number().over(w_pos))
        .filter(F.col("prn") == 1)
        .select("anchor", "pos_id", F.col("cos_sim").alias("pos_cos"))
    )

    ranked = emb.select(
        F.col(id_col).alias("nid"),
        F.substring(F.md5(F.concat(
            F.lit("negb:"), F.col(id_col).cast("string"))), 1, 1)
        .alias("bucket"),
        F.md5(F.concat(
            F.lit("negr:"), F.col(id_col).cast("string"))).alias("rk"),
    )
    w_b = Window.partitionBy("bucket").orderBy("rk", "nid")
    top = (
        ranked.withColumn("rn", F.row_number().over(w_b))
        .filter(F.col("rn") <= probe_k)
        .select("bucket", "nid", "rn")
    )
    probe = pos.withColumn(
        "bucket",
        F.substring(F.md5(F.concat(
            F.lit("probe:"), F.col("anchor").cast("string"))), 1, 1))
    cand = (
        probe.join(top, "bucket")
        .filter(F.col("nid") != F.col("anchor"))
        .join(sym.select("anchor", F.col("pos_id").alias("nid"))
              .distinct(),
              ["anchor", "nid"], "left_anti")
    )
    w_neg = Window.partitionBy("anchor").orderBy("rn")
    neg = (
        cand.withColumn("nrn", F.row_number().over(w_neg))
        .filter(F.col("nrn") == 1)
        .select("anchor", "pos_id", "pos_cos",
                F.col("nid").alias("neg_id"))
    )
    neg_scored = _score_pairs(
        emb,
        neg.select(F.col("anchor").alias("vec_id"),
                   F.col("neg_id").alias("neighbor_id")),
        id_col, vec_col,
    ).select(F.col("vec_id").alias("anchor"),
             F.col("neighbor_id").alias("neg_id"),
             F.col("cos_sim").alias("neg_cos"))
    return neg.join(neg_scored, ["anchor", "neg_id"]).select(
        "anchor", "pos_id", "pos_cos", "neg_id", "neg_cos")


def semantic_dedup(emb: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   dim: int = 64, seed: int = 42,
                   n_bits: int = 6,
                   n_tables: int = 12) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup END ARTIFACT: cluster
    semantically near-identical documents and pick one representative
    per cluster (Abbas et al. 2023 'SemDeDup' shape: near-duplicate
    pairs in embedding space -> transitive clusters -> keep one).

    Pairs come from :func:`embedding_near_duplicates_lsh` (bucketed,
    exact-cosine-verified at ``threshold``), clusters from connected
    components (operators/components.py — same composition as the
    minhash keep-list, operators/dedup.py near_dup_clusters, so the
    lexicographically-smallest-id survivor rule matches).  Output:
    (vec_id, cluster, keep); singletons are their own cluster and are
    kept.

    Scale: the pair stage is bucketed (no all-pairs path); CC input is
    bounded by the near-duplicate pair count, not corpus size; the
    join back to the corpus is on the id — one co-partitioned shuffle.
    """
    from tildener_spark.operators.components import connected_components
    pairs = embedding_near_duplicates_lsh(
        emb, threshold, id_col, vec_col, dim, seed, n_bits, n_tables)
    cc = connected_components(
        pairs.select(F.col("doc_a").alias("src"),
                     F.col("doc_b").alias("dst")))
    return (
        emb.select(F.col(id_col).alias("vec_id"))
        .join(cc.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .withColumn("cluster", F.coalesce("component", F.col("vec_id")))
        .withColumn("keep", F.col("cluster") == F.col("vec_id"))
        .select("vec_id", "cluster", "keep")
    )


def ivf_topk(emb: DataFrame, k: int = 5, n_cells: int = 16,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64,
             seed: int = 42) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    sibling of the hyperplane :func:`lsh_topk`.

    Cells are deterministic pseudo-random unit centroids (md5-parity
    ±1 vectors, normalized — no trained model, fully reproducible).
    Every vector is ASSIGNED to its best cell (one posting list per
    cell, the classic IVF layout); every query PROBES its n_probe
    best cells and scores only those postings — candidate volume is
    ~n_probe/n_cells of the corpus instead of n².  On clustered
    embeddings (the case IVF exists for) recall approaches 1 because
    a query's neighbors share its cells; the pytest gate plants
    clusters and asserts recall >= 0.9.  On WEAKLY clustered data the
    sweep (BENCH/ANN_SWEEP.md) shows recall tracks ~n_probe/n_cells
    (0.46-0.48 at the 16/4 default on the driver's embeddings table,
    ~1.0 at 8/8) — IVF's economy only materializes when the corpus
    is genuinely clustered; for unstructured mixes use lsh_topk.

    Scale shape: the probe->postings equi-join on cell id is a plain
    hash join; a hot cell is AQE-skew-split, and the per-cell posting
    lists are the partition layout a 1000-executor run would bucket
    by.  Output schema matches lsh_topk: (vec_id, neighbor_id,
    cos_sim, rank)."""
    import hashlib

    import numpy as np

    C = np.empty((n_cells, dim))
    for c in range(n_cells):
        for d in range(dim):
            digit = hashlib.md5(
                f"ivf|{seed}|{c}|{d}".encode()).hexdigest()[0]
            C[c, d] = 1.0 if digit in "13579bdf" else -1.0
    C /= np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf("array<int>")
    def top_cells(v: pd.Series) -> pd.Series:
        # null cell list for null / wrong-dim vectors (see
        # make_table_buckets_udf) — explode drops them from both the
        # posting lists and the probe set
        v_np = v.to_numpy()
        valid = np.array(
            [x is not None and len(x) == dim for x in v_np])
        out = np.full(len(v_np), None, dtype=object)
        if valid.any():
            V = np.stack(v_np[valid])
            scores = V @ C.T  # (n_valid, n_cells)
            order = np.argsort(
                -scores, axis=1)[:, :n_probe].astype(np.int32)
            tmp = np.empty(len(order), dtype=object)
            tmp[:] = list(order)
            out[valid] = tmp
        return pd.Series(out, index=v.index)

    e = ensure_min_parallelism(emb).select(
        F.col(id_col).alias("vec_id"),
        top_cells(F.col(vec_col).cast("array<double>")).alias("cells"),
        # assignment + probe branches both read this: one UDF pass
    )
    e = materialize_once(e)
    assign = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cells")[0].alias("cell"))
    probe = e.select(
        "vec_id", F.explode("cells").alias("cell"))
    # each neighbor lives in exactly one posting list and probe cells
    # are distinct per query, so candidate pairs are already unique —
    # no distinct() shuffle needed (unlike the multi-table LSH union)
    cand = (
        probe.join(assign, "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id")
    )
    pairs = _score_pairs(emb, cand, id_col, vec_col)
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(emb: DataFrame, threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-dup pairs (a < b, cos >= threshold).

    EXACT baseline (O(n²) cross join) — kept as the oracle/test
    reference; use :func:`embedding_near_duplicates_lsh` at scale."""
    e = ensure_min_parallelism(emb).select(
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
