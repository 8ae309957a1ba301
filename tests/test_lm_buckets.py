"""CCNet perplexity-bucket partitioning (operators/lm.py)."""

from pyspark.sql import functions as F

from tildener_spark.operators.lm import perplexity_buckets, train_ngram_lm


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string")


def _corpus():
    rows = []
    for i in range(60):
        lang = "lv" if i % 2 == 0 else "en"
        # doc_id%5==0 rows are the LM training slice; vary fluency by
        # how much of the doc is in-distribution vocabulary
        common = "riga is the capital of latvia"
        rare = " ".join(f"zz{i}q{j}" for j in range(i % 7))
        rows.append((i, f"{common} {rare}".strip(), lang))
    rows.append((100, "", "lv"))
    rows.append((101, "   ", "en"))
    return rows


def test_bucket_partition_is_language_local_terciles(spark):
    out = perplexity_buckets(
        _docs(spark, _corpus()),
        train_ngram_lm(_docs(spark, _corpus()))).collect()
    rows = {r["doc_id"]: r for r in out}
    assert rows[100]["bucket"] == "empty" and not rows[100]["kept"]
    assert rows[101]["bucket"] == "empty"
    # per language: head/middle/tail split ~ terciles of scoreable docs
    for lang in ("lv", "en"):
        sub = [r for r in out if r["lang"] == lang and r["n_tokens"] > 0]
        n = len(sub)
        heads = [r for r in sub if r["bucket"] == "head"]
        tails = [r for r in sub if r["bucket"] == "tail"]
        assert 0 < len(heads) <= n / 2
        assert 0 < len(tails) <= n / 2
        # every head score <= every middle score <= every tail score
        h = max(r["nats_per_tok"] for r in heads)
        t = min(r["nats_per_tok"] for r in tails)
        assert h <= t
        for r in sub:
            assert r["kept"] == (r["bucket"] in ("head", "middle"))


def test_bucket_thresholds_are_per_language(spark):
    # language B's scores are uniformly worse than A's, but each
    # language still gets its own head bucket
    rows = [(i, "aa bb cc dd", "A") for i in range(0, 30)]
    rows += [(i, f"xx{i % 7} yy{i % 5} zz{i % 3}", "B")
             for i in range(30, 60)]
    out = perplexity_buckets(
        _docs(spark, rows), train_ngram_lm(_docs(spark, rows))).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["bucket"])
    assert "head" in by_lang["A"] and "head" in by_lang["B"]


def test_partition_invariance(spark):
    d = _docs(spark, _corpus())
    lm = train_ngram_lm(d)
    a = sorted(map(tuple, perplexity_buckets(d, lm).collect()))
    b = sorted(map(tuple,
                   perplexity_buckets(d.repartition(13), lm).collect()))
    assert a == b


def test_thresholds_broadcast(spark):
    d = _docs(spark, _corpus())
    plan = perplexity_buckets(d, train_ngram_lm(d)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
