"""Hashed n-gram quality classifier (operators/quality_clf.py)."""

import hashlib

from pyspark.sql import functions as F

from tildener_spark.operators.quality_clf import (
    _CENTER, classify_quality, filter_quality)


def _w(feat: str, seed: str = "qc50") -> int:
    h = hashlib.md5(f"{seed}|{feat}".encode()).hexdigest()
    return int(h[:8], 16) - _CENTER


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_margin_matches_scalar_model(spark):
    text = "The quick brown Fox  jumps"
    out = classify_quality(_docs(spark, [(1, text)])).collect()[0]
    toks = text.lower().strip().split()
    feats = [f"u:{t}" for t in toks] + [
        f"b:{a}_{b}" for a, b in zip(toks, toks[1:])]
    assert out["n_features"] == len(feats) == 9
    assert out["margin"] == sum(_w(f) for f in feats)
    assert out["keep"] == (out["margin"] >= 0)


def test_empty_and_single_token_docs(spark):
    rows = classify_quality(
        _docs(spark, [(1, ""), (2, "   "), (3, "word")])) \
        .orderBy("doc_id").collect()
    assert [r["n_features"] for r in rows] == [0, 0, 1]
    assert rows[0]["margin"] == 0 and rows[0]["score"] == 0.5
    assert rows[0]["keep"] is True  # margin 0 >= 0
    assert rows[2]["margin"] == _w("u:word")


def test_score_monotone_in_margin(spark):
    # two one-feature docs: the one with the larger weight scores higher
    rows = {r["doc_id"]: r for r in classify_quality(
        _docs(spark, [(1, "alpha"), (2, "bravo")])).collect()}
    w1, w2 = _w("u:alpha"), _w("u:bravo")
    hi, lo = (1, 2) if w1 > w2 else (2, 1)
    assert rows[hi]["score"] > rows[lo]["score"]
    assert 0.0 <= rows[lo]["score"] <= rows[hi]["score"] <= 1.0


def test_filter_keeps_exactly_nonnegative_margin(spark):
    docs = _docs(spark, [(i, f"tok{i} tok{i + 1} tok{i + 2}")
                         for i in range(40)])
    scored = classify_quality(docs)
    expect = {r["doc_id"] for r in scored.filter("margin >= 0").collect()}
    kept = {r["doc_id"] for r in filter_quality(docs).collect()}
    assert kept == expect
    assert 0 < len(kept) < 40  # seed splits the corpus both ways


def test_partition_invariance(spark):
    docs = _docs(spark, [(i, f"w{i % 7} w{i % 5} w{i % 3}")
                         for i in range(60)])
    a = sorted(classify_quality(docs).collect())
    b = sorted(classify_quality(docs.repartition(13)).collect())
    assert a == b


def test_plan_is_map_only(spark):
    # no shuffle: the physical plan has no Exchange and no Python UDF
    plan = classify_quality(_docs(spark, [(1, "a b c")])) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
