"""DSIR importance resampling (operators/importance.py)."""

import hashlib
import math

from tildener_spark.operators.importance import (
    bucket_log_ratios, _doc_features, importance_scores, resample_topk)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bucket(feat: str, n: int = 1024) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % n


def _gumbel(doc_id: int, seed: str = "dsir") -> float:
    h = int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h + 1) / 4294967297.0
    return -math.log(-math.log(u))


CORPUS = [
    (0, "alpha beta alpha"),      # target slice (0 % 5 == 0)
    (1, "beta gamma"),
    (2, "delta delta epsilon"),
    (3, ""),
    (5, "alpha zeta"),            # target slice
]


def test_matches_scalar_model(spark):
    # scalar replay: features, buckets, Laplace log-ratios, sums
    feats = {}
    for did, text in CORPUS:
        toks = text.lower().strip().split()
        fs = [f"u:{t}" for t in toks] + [
            f"b:{a}_{b}" for a, b in zip(toks, toks[1:])]
        feats[did] = [_bucket(f) for f in fs]
    raw, tgt = {}, {}
    for did, bs in feats.items():
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if did % 5 == 0:
                tgt[b] = tgt.get(b, 0) + 1
    tq, tp = sum(raw.values()), sum(tgt.values())
    lam = {b: round(math.log((tgt.get(b, 0) + 1) / (tp + 1024))
                    - math.log((rc + 1) / (tq + 1024)), 9)
           for b, rc in raw.items()}
    got = {r["doc_id"]: r for r in
           importance_scores(_docs(spark, CORPUS)).collect()}
    assert set(got) == {0, 1, 2, 3, 5}
    for did, bs in feats.items():
        lw = sum(lam[b] for b in bs)
        assert got[did]["n_feats"] == len(bs)
        assert abs(got[did]["log_w"] - round(lw, 6)) < 2e-6
        assert abs(got[did]["g_key"]
                   - round(lw + _gumbel(did), 6)) < 2e-6
    assert got[3]["n_feats"] == 0 and got[3]["log_w"] == 0.0


def test_target_docs_score_higher_on_target_vocab(spark):
    # docs made of target-only vocabulary outrank raw-only vocabulary
    rows = [(i, "tgtword " * 5) for i in range(0, 50, 5)]       # targets
    rows += [(i, "rawword " * 5) for i in range(50) if i % 5]   # raw-only
    got = {r["doc_id"]: r["log_w"] for r in
           importance_scores(_docs(spark, rows)).collect()}
    t = min(v for d, v in got.items() if d % 5 == 0)
    r = max(v for d, v in got.items() if d % 5 != 0)
    assert t > r


def test_topk_size_and_order(spark):
    rows = [(i, f"w{i % 11} w{i % 7} w{i % 3}") for i in range(80)]
    out = resample_topk(_docs(spark, rows), k=25).collect()
    kept = [r for r in out if r["kept"]]
    assert len(out) == 80 and len(kept) == 25
    # the kept set is exactly the 25 best (g_key desc, doc_id asc)
    ranked = sorted(out, key=lambda r: (-r["g_key"], r["doc_id"]))
    assert {r["doc_id"] for r in ranked[:25]} == \
        {r["doc_id"] for r in kept}


def test_partition_invariance(spark):
    rows = [(i, f"w{i % 11} w{i % 7} w{i % 3}") for i in range(80)]
    a = sorted(map(tuple, resample_topk(_docs(spark, rows), 10).collect()))
    b = sorted(map(tuple, resample_topk(
        _docs(spark, rows).repartition(13), 10).collect()))
    assert a == b


def test_lambda_table_is_bucket_bounded(spark):
    rows = [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(200)]
    lam = bucket_log_ratios(_doc_features(_docs(spark, rows),
                                          "text", "doc_id"))
    assert lam.count() <= 1024


def test_no_python_udf_in_plan(spark):
    plan = importance_scores(_docs(spark, CORPUS)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
