"""Deterministic data-mixture sampling (operators/mixing.py)."""

from pyspark.sql import functions as F

from tildener_spark.operators.mixing import (
    cluster_splits, deterministic_sample, hex_threshold,
    leakage_safe_splits, stratified_mix)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
         .when(F.col("id") % 3 == 1, "de")
         .otherwise("zz").alias("lang"))


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(0.5) == "80000000"
    # 'g' sorts above every hex digit -> keep-everything sentinel
    assert "ffffffff" < "g"


def test_sample_rate_and_determinism(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in
         deterministic_sample(df, 0.5, "doc_id", "s1").collect()}
    b = {r["doc_id"] for r in deterministic_sample(
        df.repartition(17), 0.5, "doc_id", "s1").collect()}
    assert a == b                       # partition-invariant
    assert 0.4 < len(a) / 2000 < 0.6    # ~Bernoulli(0.5)
    c = {r["doc_id"] for r in
         deterministic_sample(df, 0.5, "doc_id", "s2").collect()}
    assert a != c                       # seed changes the sample


def test_stratified_rates_and_isolation(spark):
    df = _docs(spark)
    out = stratified_mix(df, "lang", {"en": 1.0, "de": 0.25},
                         "doc_id", "s1", default_fraction=0.0)
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n"))
               .collect()}
    assert by_lang.get("en") == 667     # 1.0 keeps every en row
    assert 100 < by_lang.get("de", 0) < 233
    assert "zz" not in by_lang          # default 0.0 drops the rest
    # adding a stratum to the table never reshuffles other strata
    out2 = stratified_mix(df, "lang", {"en": 1.0, "de": 0.25,
                                       "zz": 0.9},
                          "doc_id", "s1", default_fraction=0.0)
    de1 = {r["doc_id"] for r in out.filter("lang = 'de'").collect()}
    de2 = {r["doc_id"] for r in out2.filter("lang = 'de'").collect()}
    assert de1 == de2


def test_cluster_splits_rates_and_partition_invariance(spark):
    cl = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        # ~3-member clusters: the split must key on this label
        (F.col("id") - F.col("id") % 3).cast("string").alias("cluster"))
    out = cluster_splits(cl, fractions=(0.8, 0.1))
    rows = out.collect()
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], 0)
        by_split[r["split"]] += 1
    assert set(by_split) == {"train", "val", "test"}
    assert 0.7 < by_split["train"] / 3000 < 0.9
    assert by_split["val"] / 3000 < 0.2
    # every cluster lives in exactly one split
    n_mixed = (out.groupBy("cluster")
               .agg(F.countDistinct("split").alias("k"))
               .filter("k > 1").count())
    assert n_mixed == 0
    # partition-invariant
    again = {(r["doc_id"], r["split"])
             for r in cluster_splits(
                 cl.repartition(13), fractions=(0.8, 0.1)).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in rows}


def test_leakage_safe_splits_co_locates_near_dups(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight") * 3
    rows = []
    for i in range(40):
        rows.append((f"d{i:03d}", base + f" unique marker {i}"))
        # near-duplicate of each: must land in the SAME split
        rows.append((f"d{i:03d}x", base + f" unique marker {i}!"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = leakage_safe_splits(docs)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(split_of) == 80
    for i in range(40):
        assert split_of[f"d{i:03d}"] == split_of[f"d{i:03d}x"], i


def test_shuffle_shards_layout(spark):
    from tildener_spark.operators.mixing import shuffle_shards
    docs = spark.createDataFrame([(i,) for i in range(200)],
                                 "doc_id: long")
    out = shuffle_shards(docs, n_shards=4).collect()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # every shard populated, positions dense 0..k-1 within shard
    assert set(by_shard) == {0, 1, 2, 3}
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    # roughly uniform scatter (md5): no shard owns > 45% of 200
    assert max(len(p) for p in by_shard.values()) < 90
    # the layout is a permutation, not identity order
    pos_of = {r["doc_id"]: (r["shard"], r["pos"]) for r in out}
    first_ids = sorted(d for d, (s, p) in pos_of.items() if p == 0)
    assert first_ids != [0, 1, 2, 3]


def test_shuffle_shards_deterministic(spark):
    from tildener_spark.operators.mixing import shuffle_shards
    docs = spark.createDataFrame([(i,) for i in range(100)],
                                 "doc_id: long")
    a = sorted(map(tuple, shuffle_shards(docs, 8).collect()))
    b = sorted(map(tuple,
                   shuffle_shards(docs.repartition(17), 8).collect()))
    assert a == b
    c = sorted(map(tuple,
                   shuffle_shards(docs, 8, seed="other").collect()))
    assert a != c
