"""Distributed BPE training + encoding (operators/bpe.py)."""

from tildener_spark.operators.bpe import apply_bpe, train_bpe


def _corpus(spark):
    # Sennrich's worked example, as document text with the same word
    # multiplicities: low x5, lower x2, newest x6, widest x3
    text = " ".join(["low"] * 5 + ["lower"] * 2
                    + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(0, text)],
                                 "doc_id long, text string")


def test_train_matches_hand_derivation(spark):
    out = [tuple(r) for r in
           train_bpe(spark, _corpus(spark), n_merges=4).collect()]
    # step 1: (e,s) and (s,t) tie at 9 -> lexicographic (e,s)
    # step 2: (es,t) 9; step 3: (l,o)/(o,w) tie at 7 -> (l,o);
    # step 4: (lo,w) 7
    assert out == [
        (0, "e", "s", "es", 9),
        (1, "es", "t", "est", 9),
        (2, "l", "o", "lo", 7),
        (3, "lo", "w", "low", 7),
    ]


def test_apply_encodes_unseen_word(spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    d = spark.createDataFrame([(0, "lowest"), (1, "slow tes")],
                              "doc_id long, text string")
    got = {r["doc_id"]: r["tokens"]
           for r in apply_bpe(d, merges).collect()}
    assert got[0] == ["low", "est"]
    assert got[1] == ["s", "low", "t", "es"]


def test_merge_is_left_to_right_nonoverlapping(spark):
    # the x==y case that breaks regex-replace loops: runs merge at
    # even offsets only
    d = spark.createDataFrame(
        [(0, "aaa"), (1, "aaaa"), (2, "aaaaa")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["tokens"]
           for r in apply_bpe(d, [("a", "a")]).collect()}
    assert got[0] == ["aa", "a"]
    assert got[1] == ["aa", "aa"]
    assert got[2] == ["aa", "aa", "a"]


def test_overlap_pair_counts(spark):
    # 'aaaa' x1: pair (a,a) counted 3x (Sennrich get_stats counts
    # overlapping occurrences)
    d = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    out = [tuple(r) for r in train_bpe(spark, d, n_merges=2).collect()]
    assert out == [(0, "a", "a", "aa", 3), (1, "aa", "aa", "aaaa", 1)]


def test_empty_corpus_stops(spark):
    d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    # single 1-char word: no pairs at all -> empty merge log
    assert train_bpe(spark, d, n_merges=3).count() == 0
