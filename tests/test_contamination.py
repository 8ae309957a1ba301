"""Benchmark decontamination (operators/contamination.py)."""

from tildener_spark.operators.contamination import flag_contaminated


def _docs(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "quick brown fox jumps over the lazy dog"),
         (3, "a completely different training document with no overlap"),
         (4, "short text")],
        "doc_id int, text string")


def test_flags_exact_window_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "brown fox jumps over the lazy dog")],
        "bench_id int, text string")
    got = {r["doc_id"]: r["n_hits"] for r in
           flag_contaminated(_docs(spark), bench, n=7).collect()}
    # docs 1 and 2 contain the benchmark's single 7-gram; 3 and 4 do
    # not appear at all (the result is benchmark-sized)
    assert got == {1: 1, 2: 1}


def test_window_length_gates_detection(spark):
    bench = spark.createDataFrame(
        [(100, "brown fox jumps over the lazy dog")],
        "bench_id int, text string")
    # at n=8 the 7-token benchmark yields no windows -> nothing flags
    assert flag_contaminated(_docs(spark), bench, n=8).count() == 0


def test_hits_count_distinct_windows(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i")], "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, "a b c d e f g h")], "bench_id int, text string")
    # benchmark has two 7-grams (a..g, b..h); doc contains both
    rows = flag_contaminated(docs, bench, n=7).collect()
    assert rows == [(1, 2)] or [tuple(r) for r in rows] == [(1, 2)]


def test_case_and_whitespace_normalized(spark):
    docs = spark.createDataFrame(
        [(1, "  The QUICK brown   fox jumps over the lazy dog ")],
        "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy")],
        "bench_id int, text string")
    assert flag_contaminated(docs, bench, n=7).count() == 1
