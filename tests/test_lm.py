"""Stupid-Backoff bigram LM quality scoring (operators/lm.py),
hand-computed on a tiny corpus (q41_lm_perplexity in
__spark_entry__.py carries the DuckDB oracle)."""

import math

from tildener_spark.operators.lm import (
    BACKOFF, perplexity_score, train_ngram_lm)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_counts_only_slice(spark):
    # train_mod=2: docs 0 and 2 train, doc 1 does not
    d = _docs(spark, [(0, "a b a"), (1, "zzz zzz"), (2, "b a")])
    lm = train_ngram_lm(d, train_mod=2)
    uni = {r["w"]: r["c1"] for r in lm.uni.collect()}
    assert uni == {"a": 3, "b": 2}
    assert lm.n_tokens == 5 and lm.vocab == 2
    bi = {(r["w_prev"], r["w"]): r["c2"] for r in lm.bi.collect()}
    # doc 0: (a,b), (b,a); doc 2: (b,a) — no cross-doc bigram
    assert bi == {("a", "b"): 1, ("b", "a"): 2}


def test_score_hand_computed(spark):
    d = _docs(spark, [(0, "a b a"), (1, "zzz a"), (2, "")])
    lm = train_ngram_lm(d, train_mod=2)  # trains on docs 0, 2
    got = {r["doc_id"]: r for r in perplexity_score(d, lm).collect()}

    t, v = lm.n_tokens, lm.vocab  # 3, 2 (doc 2 is empty)
    uni = {"a": 2, "b": 1}
    denom = t + v

    def u(w):
        return (uni.get(w, 0) + 1) / denom

    # doc 0 "a b a": uni(a), bi(a,b)=1/c1(a)=1/2, bi(b,a)=1/1
    s0 = [u("a"), 1 / 2, 1 / 1]
    want0 = round(-sum(math.log(x) for x in s0) / 3, 6)
    assert got[0]["n_tokens"] == 3
    assert math.isclose(got[0]["nats_per_tok"], want0, abs_tol=1e-9)

    # doc 1 "zzz a": uni(zzz) unseen, then backoff (no bigram zzz->a)
    s1 = [u("zzz"), BACKOFF * u("a")]
    want1 = round(-sum(math.log(x) for x in s1) / 2, 6)
    assert got[1]["n_tokens"] == 2
    assert math.isclose(got[1]["nats_per_tok"], want1, abs_tol=1e-9)

    # empty doc: flagged by n_tokens, score 0
    assert got[2]["n_tokens"] == 0
    assert got[2]["nats_per_tok"] == 0.0


def test_fluent_text_scores_below_gibberish(spark):
    """The filter's point: in-distribution text gets fewer nats per
    token than out-of-vocabulary gibberish."""
    fluent = "the cat sat on the mat"
    rows = [(i, fluent) for i in range(0, 40, 2)]
    rows += [(1, fluent), (3, "qq ww ee rr tt yy")]
    d = _docs(spark, rows)
    lm = train_ngram_lm(d, train_mod=2)
    got = {r["doc_id"]: r["nats_per_tok"]
           for r in perplexity_score(d, lm).collect()}
    assert got[1] < got[3]


def test_score_partition_invariant(spark):
    d = _docs(spark, [(i, f"w{i % 3} w{(i + 1) % 3} end")
                      for i in range(30)])
    lm = train_ngram_lm(d)
    base = sorted(map(tuple, perplexity_score(d, lm).collect()))
    again = sorted(map(tuple, perplexity_score(
        d.repartition(11), lm).collect()))
    assert base == again
