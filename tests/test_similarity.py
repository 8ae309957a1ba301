"""Similarity search: brute-force exactness + LSH bucket recall."""

import pytest

from tildener_spark.operators.similarity import (
    brute_force_topk, embedding_near_duplicates, lsh_topk)

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.14, 0.0, 0.0]),   # close to 0
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.98, 0.2, 0.0]),    # close to 2
    (4, [-1.0, 0.0, 0.0, 0.0]),    # opposite of 0
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    out = brute_force_topk(_emb(spark), k=1).collect()
    best = {r["vec_id"]: r["neighbor_id"] for r in out}
    assert best[0] == 1 and best[1] == 0
    assert best[2] == 3 and best[3] == 2


def test_cosine_value(spark):
    out = brute_force_topk(_emb(spark), k=4).collect()
    sims = {(r["vec_id"], r["neighbor_id"]): r["cos_sim"] for r in out}
    assert sims[(0, 4)] == pytest.approx(-1.0, abs=1e-6)


def test_near_duplicates_threshold(spark):
    out = embedding_near_duplicates(_emb(spark), threshold=0.95)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in got and (2, 3) in got
    assert (0, 2) not in got


def test_lsh_topk_subset_of_bruteforce(spark):
    # LSH results must agree with brute force wherever they exist
    bf = {(r["vec_id"], r["neighbor_id"]): r["cos_sim"]
          for r in brute_force_topk(_emb(spark), k=4, ).collect()}
    approx = lsh_topk(_emb(spark), k=4, n_bits=2, dim=4).collect()
    for r in approx:
        assert bf[(r["vec_id"], r["neighbor_id"])] == r["cos_sim"]
