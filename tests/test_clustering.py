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


def test_pq_encode_shape_and_determinism(spark):
    from tildener_spark.operators.clustering import pq_encode
    df = _clustered(spark, n_per=20, k=3, dim=8)
    out = pq_encode(df, n_subspaces=2, k=3, n_iter=2, dim=8)
    rows = out.collect()
    assert len(rows) == 60
    assert set(out.columns) == {"vec_id", "code", "c0", "c1"}
    for r in rows:
        assert r["code"] == f'{r["c0"]}-{r["c1"]}'
        assert 0 <= r["c0"] < 3 and 0 <= r["c1"] < 3
    # subspace 0 (dims 1-4) contains the separating coordinates for
    # blobs 0..2 when dim=8, k=3: planted blobs get distinct c0 codes
    by_blob = {}
    got = {r["vec_id"]: r["c0"] for r in rows}
    for c in range(3):
        assigned = {got[c * 20 + i] for i in range(20)}
        assert len(assigned) == 1
        by_blob[c] = assigned.pop()
    # blobs 0 and 1 differ within subspace 0 (coords 0 and 1)
    assert by_blob[0] != by_blob[1]
    # repartition invariance
    b = pq_encode(df.repartition(17), n_subspaces=2, k=3, n_iter=2,
                  dim=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))


def test_pq_encode_drops_bad_vectors(spark):
    from tildener_spark.operators.clustering import pq_encode
    df = _clustered(spark, n_per=10, k=2, dim=8).unionByName(
        spark.createDataFrame(
            [(900, None, 0), (901, [1.0] * 4, 0)],
            "vec_id: bigint, embedding: array<float>, label: int"))
    ids = {r["vec_id"] for r in
           pq_encode(df, n_subspaces=2, k=2, n_iter=1, dim=8).collect()}
    assert 900 not in ids and 901 not in ids and len(ids) == 20
