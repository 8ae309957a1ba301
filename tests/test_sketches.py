"""From-scratch HyperLogLog (operators/sketches.py): estimate
accuracy on known cardinalities, partition invariance (the integer
register sum is order-independent), and the generated CASE chains
(q68_hll_cardinality's bitwise oracle in __spark_entry__.py)."""

import math

from pyspark.sql import functions as F

from tildener_spark.operators.sketches import (
    M_REG, W_BITS, hll_cardinality, lincount_case_sql, rho_case_sql,
)


def _docs(spark, groups):
    """groups: {source: [token, ...]} -> one one-token-per-word doc
    per source (one row per source keeps the test fast)."""
    rows = [(src, " ".join(toks)) for src, toks in groups.items()]
    return spark.createDataFrame(rows, "source string, text string")


def test_hll_small_groups_use_linear_counting(spark):
    """Cardinalities far below 2.5*m land in the linear-counting
    branch, whose literals are exact for the occupied-register count
    — tiny groups estimate within a few percent."""
    groups = {
        "a": [f"tok{i}" for i in range(10)],
        "b": [f"word{i}" for i in range(100)],
    }
    got = {r["source"]: r for r in
           hll_cardinality(_docs(spark, groups)).collect()}
    assert got["a"]["n_exact"] == 10
    assert got["b"]["n_exact"] == 100
    for r in got.values():
        assert abs(r["hll_est"] - r["n_exact"]) / r["n_exact"] < 0.15
        assert r["err_pct"] == round(
            abs(r["hll_est"] - r["n_exact"]) / r["n_exact"] * 100, 4)


def test_hll_large_group_within_theoretical_error(spark):
    """n=5000 >> 2.5*m exercises the raw-estimate branch; the
    standard error for m=256 is 1.04/sqrt(256) = 6.5%, assert 4
    sigma."""
    groups = {"big": [f"t{i}" for i in range(5000)]}
    [r] = hll_cardinality(_docs(spark, groups)).collect()
    assert r["n_exact"] == 5000
    assert abs(r["hll_est"] - 5000) / 5000 < 4 * 1.04 / math.sqrt(M_REG)


def test_hll_duplicate_insensitive_and_partition_invariant(spark):
    """Same token multiset, different duplication and partitioning
    -> bit-identical estimate (registers are max-merged; the sum is
    integer)."""
    toks = [f"x{i}" for i in range(300)]
    one = _docs(spark, {"s": toks})
    # 5 docs per source, heavy duplication, adversarial partitioning
    rows = [("s", " ".join(toks[i::5] + toks[:50])) for i in range(5)]
    many = spark.createDataFrame(
        rows, "source string, text string").repartition(7)
    [a] = hll_cardinality(one).collect()
    [b] = hll_cardinality(many).collect()
    assert a["hll_est"] == b["hll_est"]
    assert a["n_exact"] == b["n_exact"] == 300


def test_generated_cases_match_python_reference(spark):
    """The rho CASE equals a pure-Python leading-zero rank over
    probe values covering every branch boundary."""
    probes = [0, 1, 2, 3]
    probes += [(1 << k) - 1 for k in range(1, W_BITS + 1)]
    probes += [1 << k for k in range(W_BITS)]
    df = spark.createDataFrame([(v,) for v in probes], "w long")
    got = df.select("w", F.expr(rho_case_sql("w")).alias("rho")).collect()
    for r in got:
        expect = W_BITS + 1 if r["w"] == 0 else W_BITS - r["w"].bit_length() + 1
        assert r["rho"] == expect, r

    # linear-counting literals: spot-check the formula
    df2 = spark.createDataFrame([(1,), (128,), (255,)], "n_zero int")
    got2 = {r["n_zero"]: r["lc"] for r in df2.select(
        "n_zero", F.expr(lincount_case_sql("n_zero")).alias("lc"))
        .collect()}
    for v, lc in got2.items():
        assert lc == round(M_REG * math.log(M_REG / v), 6)


# --- Count-Min ------------------------------------------------------


def test_cms_one_sided_and_exact_on_sparse_input(spark):
    """CMS never underestimates (overcount >= 0 for every token);
    with far fewer distinct tokens than buckets, collisions are
    rare enough that the known heavy hitter is estimated exactly."""
    from tildener_spark.operators.sketches import cms_heavy_hitters

    text = " ".join(["hot"] * 80 + [f"cold{i}" for i in range(20)])
    docs = spark.createDataFrame([(text,)], "text string")
    rows = {r["token"]: r for r in
            cms_heavy_hitters(docs, threshold=50).collect()}
    assert "hot" in rows
    assert rows["hot"]["n_exact"] == 80
    assert rows["hot"]["cms_est"] >= 80
    for r in rows.values():
        assert r["overcount"] >= 0
        assert r["cms_est"] == r["n_exact"] + r["overcount"]


def test_cms_partition_invariant(spark):
    """Same token multiset under adversarial partitioning/splitting
    -> identical sketch estimates (all-integer partial aggregation)."""
    from tildener_spark.operators.sketches import cms_heavy_hitters

    toks = ["alpha"] * 60 + ["beta"] * 55 + [f"z{i}" for i in range(30)]
    one = spark.createDataFrame([(" ".join(toks),)], "text string")
    many = spark.createDataFrame(
        [(" ".join(toks[i::7]),) for i in range(7)],
        "text string").repartition(5)
    a = sorted(map(tuple, cms_heavy_hitters(one, threshold=50).collect()))
    b = sorted(map(tuple, cms_heavy_hitters(many, threshold=50).collect()))
    assert a == b


def test_cms_bucket_rule_matches_python(spark):
    """The Spark bucket expression equals a pure-Python md5 replay
    for every hash row — the rule the DuckDB oracle also mirrors."""
    import hashlib

    from pyspark.sql import functions as F

    from tildener_spark.operators.sketches import (
        CMS_D, CMS_W, cms_bucket_spark)

    words = ["the", "entity", "ü-umlaut", "x1f\x1e", "123"]
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    cols = [cms_bucket_spark(F.col("tok"), j).alias(f"b{j}")
            for j in range(CMS_D)]
    got = {r["tok"]: r for r in df.select("tok", *cols).collect()}
    for w in words:
        for j in range(CMS_D):
            h = hashlib.md5(f"r{j}\x1f{w}".encode()).hexdigest()
            assert got[w][f"b{j}"] == int(h[:8], 16) % CMS_W
