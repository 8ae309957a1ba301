"""Cross-source n-gram overlap matrix (operators/overlap.py)."""

from tildener_spark.operators.overlap import source_overlap


def _docs(spark):
    rows = [
        ("A", "one two three four five"),        # shingles: 3
        ("B", "one two three four five"),        # == A
        ("C", "one two three something else"),   # shares 1 with A/B
        ("D", "totally disjoint text corpus here"),
    ]
    return spark.createDataFrame(rows, "source string, text string")


def test_hand_computed_matrix(spark):
    out = {(r["src_a"], r["src_b"]): r
           for r in source_overlap(_docs(spark), n=3).collect()}
    assert len(out) == 6                        # full 4-choose-2
    ab = out[("A", "B")]
    assert ab["n_a"] == 3 and ab["n_b"] == 3 and ab["n_common"] == 3
    assert ab["jaccard"] == 1.0
    assert ab["contain_a"] == 1.0 and ab["contain_b"] == 1.0
    ac = out[("A", "C")]
    assert ac["n_common"] == 1                   # "one two three"
    assert abs(ac["jaccard"] - 1 / 5) < 1e-6
    assert abs(ac["contain_a"] - 1 / 3) < 1e-6
    ad = out[("A", "D")]
    assert ad["n_common"] == 0 and ad["jaccard"] == 0.0
    assert ad["contain_a"] == 0.0 and ad["contain_b"] == 0.0


def test_short_and_dup_docs(spark):
    rows = [("A", "x y"), ("A", "x y"),          # short-tail shingle
            ("B", "x y z"), ("B", "")]
    d = spark.createDataFrame(rows, "source string, text string")
    out = {(r["src_a"], r["src_b"]): r
           for r in source_overlap(d, n=3).collect()}
    ab = out[("A", "B")]
    # A = {"x y"}; B = {"x y z"} (empty doc contributes nothing,
    # duplicate docs count once)
    assert ab["n_a"] == 1 and ab["n_b"] == 1 and ab["n_common"] == 0


def test_partition_invariance(spark):
    d = _docs(spark)
    a = sorted(map(tuple, source_overlap(d, n=2).collect()))
    b = sorted(map(tuple,
                   source_overlap(d.repartition(13), n=2).collect()))
    assert a == b
