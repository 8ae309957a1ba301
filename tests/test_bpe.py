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


def test_bpe_fertility_hand_corpus(spark):
    """With no merges every char is a token: fertility = chars/words
    exactly; one merge ('a','b') shrinks lang-x's token count only."""
    from tildener_spark.operators.bpe import bpe_fertility

    df = spark.createDataFrame(
        [(1, "x", "ab ab"), (2, "y", "cd")],
        "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in bpe_fertility(df, []).collect()}
    assert (got["x"]["n_words"], got["x"]["n_tokens"],
            got["x"]["n_chars"]) == (2, 4, 4)
    assert got["x"]["fertility"] == 2.0
    assert got["y"]["fertility"] == 2.0
    assert got["x"]["chars_per_token"] == 1.0

    got2 = {r["lang"]: r for r in
            bpe_fertility(df, [("a", "b")]).collect()}
    assert got2["x"]["n_tokens"] == 2 and got2["x"]["fertility"] == 1.0
    assert got2["x"]["chars_per_token"] == 2.0
    assert got2["y"]["n_tokens"] == 2  # untouched
