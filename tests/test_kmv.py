"""KMV / theta bottom-k sketch (operators/sketches.py).

q75's oracle pins cross-engine bitwise parity; these tests pin the
sketch math itself: bottom-k correctness under salting and
repartitioning, the under-full exact-set regime, and estimator
sanity on sets with known overlap.
"""

from pyspark.sql import functions as F

from tildener_spark.operators.sketches import (
    KMV_K, _kmv_hash, bottom_k_hashes, kmv_set_ops)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "grp string, tok string") \
        .select("grp", _kmv_hash(F.col("tok")).alias("h"))


def test_bottom_k_matches_global_sort(spark):
    rows = [("a", f"tok{i}") for i in range(500)] \
        + [("b", f"tok{i}") for i in range(40)]
    toks = _toks(spark, rows)
    for variant in (toks, toks.repartition(13), toks.coalesce(1)):
        got = {
            (r["grp"], r["h"], r["rk"])
            for r in bottom_k_hashes(variant, k=16).collect()}
        for grp, n in (("a", 500), ("b", 40)):
            expect = sorted({r["h"] for r in toks
                             .filter(F.col("grp") == grp).collect()})[:16]
            assert {(h, i + 1) for i, h in enumerate(expect)} == {
                (h, rk) for g, h, rk in got if g == grp}


def test_bottom_k_duplicate_tolerant(spark):
    # the same token repeated must occupy ONE rank, not k of them
    rows = [("a", "dup")] * 50 + [("a", f"tok{i}") for i in range(20)]
    toks = _toks(spark, rows)
    got = bottom_k_hashes(toks, k=8).collect()
    assert len(got) == 8
    assert len({r["h"] for r in got}) == 8


def _docs_df(spark, spec):
    # spec: {source: [tokens]}
    rows = [(src, " ".join(toks)) for src, toks in spec.items()]
    return spark.createDataFrame(rows, "source string, text string")


def test_underfull_sketch_is_exact(spark):
    # both sides far below k distinct -> theta = full space -> the
    # estimates ARE the exact cardinalities
    docs = _docs_df(spark, {
        "a": [f"w{i}" for i in range(20)],
        "b": [f"w{i}" for i in range(10, 30)],
    })
    [r] = kmv_set_ops(docs).collect()
    assert (r["src_a"], r["src_b"]) == ("a", "b")
    assert r["union_exact"] == 30 and r["inter_exact"] == 10
    assert r["union_est"] == 30.0
    assert r["inter_est"] == 10.0
    assert abs(r["jaccard_est"] - 10 / 30) < 1e-6


def test_estimator_accuracy_on_large_overlap(spark):
    # 2000 vs 2000 distinct with 1000 shared: k=64 sketch estimates
    # should land within ~35% (3/sqrt(k) ~ 0.375 relative error)
    docs = _docs_df(spark, {
        "a": [f"w{i}" for i in range(2000)],
        "b": [f"w{i}" for i in range(1000, 3000)],
    })
    [r] = kmv_set_ops(docs, k=KMV_K).collect()
    assert r["union_exact"] == 3000 and r["inter_exact"] == 1000
    assert abs(r["union_est"] - 3000) / 3000 < 0.35
    assert abs(r["inter_est"] - 1000) / 1000 < 0.55
    assert 0.1 < r["jaccard_est"] < 0.6


def test_disjoint_sets(spark):
    docs = _docs_df(spark, {
        "a": [f"left{i}" for i in range(300)],
        "b": [f"right{i}" for i in range(300)],
    })
    [r] = kmv_set_ops(docs).collect()
    assert r["inter_exact"] == 0
    assert r["inter_est"] == 0.0
    assert r["jaccard_est"] == 0.0


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "source string, text string")
    assert kmv_set_ops(docs).count() == 0
