"""Inverted index + BM25 retrieval (operators/retrieval.py)."""

import math

from pyspark.sql import functions as F

from tildener_spark.operators.retrieval import (
    B, K1, bm25_search, bm25_topk, build_postings, corpus_queries)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (0, "apple banana cherry apple"),
    (1, "banana cherry date"),
    (2, "apple apple apple fig"),
    (3, "grape fig date banana"),
    (4, ""),
]


def test_postings_tf_df_dl(spark):
    rows = {(r["term"], r["doc_id"]): r
            for r in build_postings(_docs(spark, CORPUS)).collect()}
    assert rows[("apple", 0)]["tf"] == 2
    assert rows[("apple", 0)]["dl"] == 4
    assert rows[("apple", 2)]["tf"] == 3
    assert rows[("apple", 0)]["df"] == 2        # docs 0 and 2
    assert rows[("banana", 1)]["df"] == 3       # docs 0, 1, 3
    # empty doc contributes no postings but counts in n_docs/avgdl
    assert rows[("fig", 3)]["n_docs"] == 5
    assert rows[("fig", 3)]["avgdl"] == (4 + 3 + 4 + 4 + 0) / 5
    assert not any(d == 4 for (_, d) in rows)


def test_max_df_guard_drops_head_terms(spark):
    # banana df=3 of 5 docs: ratio 0.5 drops it, 0.6 keeps it
    terms = {r["term"] for r in build_postings(
        _docs(spark, CORPUS), max_df_ratio=0.5).collect()}
    assert "banana" not in terms and "grape" in terms
    terms = {r["term"] for r in build_postings(
        _docs(spark, CORPUS), max_df_ratio=0.6).collect()}
    assert "banana" in terms


def test_bm25_matches_scalar_model(spark):
    postings = build_postings(_docs(spark, CORPUS))
    queries = spark.createDataFrame(
        [(100, "apple"), (100, "date")], "query_id long, term string")
    got = {r["doc_id"]: r for r in
           bm25_topk(postings, queries, k=10).collect()}

    n, avgdl = 5, 15 / 5

    def score(tf, df, dl):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * (K1 + 1.0)) / (
            tf + K1 * (1.0 - B + B * dl / avgdl))

    # doc 0: apple tf=2 dl=4; doc 2: apple tf=3 dl=4;
    # doc 1: date dl=3; doc 3: date dl=4 (df apple=2, date=2)
    assert got[0]["score"] == round(score(2, 2, 4), 6)
    assert got[2]["score"] == round(score(3, 2, 4), 6)
    assert got[1]["score"] == round(score(1, 2, 3), 6)
    assert got[0]["n_hit"] == 1
    # ranks: desc score, doc_id tie-break
    ranks = {r["doc_id"]: r["rank"] for r in got.values()}
    order = sorted(got, key=lambda d: (-got[d]["score"], d))
    assert [ranks[d] for d in order] == list(range(1, len(order) + 1))


def test_multi_term_sum_and_nhit(spark):
    postings = build_postings(_docs(spark, CORPUS))
    q1 = spark.createDataFrame([(7, "apple")], "query_id long, term string")
    q2 = spark.createDataFrame([(7, "fig")], "query_id long, term string")
    both = spark.createDataFrame(
        [(7, "apple"), (7, "fig")], "query_id long, term string")
    s1 = {r["doc_id"]: r["score"]
          for r in bm25_topk(postings, q1).collect()}
    s2 = {r["doc_id"]: r["score"]
          for r in bm25_topk(postings, q2).collect()}
    got = {r["doc_id"]: r for r in bm25_topk(postings, both).collect()}
    # doc 2 matches both terms: score is the sum, n_hit = 2
    assert got[2]["n_hit"] == 2
    assert abs(got[2]["score"] - (s1[2] + s2[2])) < 2e-6
    assert got[0]["n_hit"] == 1 and got[0]["score"] == s1[0]


def test_corpus_queries_deterministic_slice(spark):
    docs = _docs(spark, [(i, " ".join(f"t{i}w{j}" for j in range(10)))
                         for i in range(120)])
    rows = corpus_queries(docs, every=50, start=5, n_terms=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["term"])
    # docs 0, 50, 100 qualify; tokens 5..7 are w4..w6 (1-indexed slice)
    assert set(by_q) == {0, 50, 100}
    assert by_q[50] == {"t50w4", "t50w5", "t50w6"}


def test_short_docs_yield_no_query(spark):
    docs = _docs(spark, [(0, "a b c"), (50, " ".join("x" * 1 for _ in range(8)))])
    rows = corpus_queries(docs, every=50, start=5, n_terms=3).collect()
    assert {r["query_id"] for r in rows} == {50}


def test_partition_invariance(spark):
    docs = _docs(spark, [(i, f"w{i % 7} w{i % 5} w{i % 3} w{i % 11} "
                             f"w{i % 2} common w{i % 13} tail{i % 4}")
                         for i in range(200)])
    a = sorted(map(tuple, bm25_search(docs, every=20).collect()))
    b = sorted(map(tuple, bm25_search(docs.repartition(17),
                                      every=20).collect()))
    assert a == b and len(a) > 0


def test_rank_is_dense_per_query(spark):
    docs = _docs(spark, [(i, f"w{i % 7} w{i % 5} w{i % 3} w{i % 11} "
                             f"w{i % 2} common w{i % 13} tail{i % 4}")
                         for i in range(200)])
    out = bm25_search(docs, every=20, k=5)
    bad = (out.groupBy("query_id")
           .agg(F.count("*").alias("n"), F.max("rank").alias("mx"),
                F.min("rank").alias("mn"))
           .filter("mx != n or mn != 1").count())
    assert bad == 0
    assert out.filter("rank > 5").count() == 0
