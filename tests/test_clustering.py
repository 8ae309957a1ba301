"""Deterministic Lloyd k-means (operators/clustering.py)."""

import math

from pyspark.sql import functions as F

from tildener_spark.operators.clustering import kmeans_clusters


def _clustered(spark, n_per=30, k=3, dim=8):
    # k well-separated blobs on coordinate axes + small deterministic
    # jitter: Lloyd must recover the planted structure
    rows = []
    for c in range(k):
        for i in range(n_per):
            v = [0.0] * dim
            v[c] = 10.0
            v[(c + 1) % dim] = math.sin(i * 0.7 + c) * 0.3
            rows.append((c * n_per + i, [float(x) for x in v], c))
    return spark.createDataFrame(
        rows, "vec_id: bigint, embedding: array<float>, label: int")


def test_recovers_planted_clusters(spark):
    df = _clustered(spark)
    out = kmeans_clusters(df, k=3, n_iter=4, dim=8)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert len(got) == 90
    # every planted blob maps to exactly one k-means cluster and the
    # three blobs map to three DIFFERENT clusters
    blob_to = {}
    for c in range(3):
        assigned = {got[c * 30 + i] for i in range(30)}
        assert len(assigned) == 1, f"blob {c} split: {assigned}"
        blob_to[c] = assigned.pop()
    assert len(set(blob_to.values())) == 3


def test_partition_invariance_and_determinism(spark):
    df = _clustered(spark)
    a = sorted((r["vec_id"], r["cluster"]) for r in
               kmeans_clusters(df, k=3, n_iter=2, dim=8).collect())
    b = sorted((r["vec_id"], r["cluster"]) for r in
               kmeans_clusters(df.repartition(17), k=3, n_iter=2,
                               dim=8).collect())
    assert a == b


def test_drops_null_and_wrong_dim(spark):
    df = _clustered(spark).unionByName(spark.createDataFrame(
        [(900, None, 0), (901, [1.0, 2.0], 0)],
        "vec_id: bigint, embedding: array<float>, label: int"))
    out = kmeans_clusters(df, k=3, n_iter=1, dim=8)
    ids = {r["vec_id"] for r in out.collect()}
    assert 900 not in ids and 901 not in ids
    assert len(ids) == 90


def test_fewer_vectors_than_k(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id: bigint, embedding: array<float>")
    out = kmeans_clusters(df, k=5, n_iter=2, dim=2).collect()
    assert len(out) == 2
    assert {r["cluster"] for r in out} == {0, 1}


def test_zero_shuffle_assignment_plan(spark):
    # assignment must be pure expression work: no UDF, no exchange
    df = _clustered(spark)
    out = kmeans_clusters(df, k=3, n_iter=0, dim=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("InMemoryTableScan")[0]
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
