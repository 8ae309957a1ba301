"""Text analysis: language-ID, quality features, counts, fingerprints."""

from tildener_spark.operators.textstats import (
    corpus_summary, detect_language, fingerprints, quality_features,
    token_counts)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_detect_language(spark):
    d = _docs(spark, [
        (0, "the cat and the dog of a house"),
        (1, "der Hund und die Katze ist nicht da"),
        (2, "xyzzy qwerty plugh"),
    ])
    out = {r["doc_id"]: r["detected_lang"]
           for r in detect_language(d).collect()}
    assert out[0] == "en" and out[1] == "de" and out[2] == "und"


def test_quality_features_bounds(spark):
    d = _docs(spark, [(0, "word " * 100), (1, "a b c d e f g h")])
    rows = {r["doc_id"]: r for r in quality_features(d).collect()}
    rep = rows[0]
    assert rep["repetition_ratio"] > 0.9  # 100x same word
    assert 0.0 <= rep["quality_score"] <= 1.0
    assert rows[1]["repetition_ratio"] == 0.0


def test_token_counts(spark):
    d = _docs(spark, [(0, "hello world 123 !")])
    r = token_counts(d).collect()[0]
    assert r["ws_tokens"] == 4
    # hell+o, worl+d, 123, ! -> 6 subword pieces
    assert r["subword_tokens"] == 6


def test_fingerprint_equal_for_equal_docs(spark):
    d = _docs(spark, [
        (0, "a b c d e f"), (1, "a b c d e f"), (2, "z y x w v u")])
    rows = {r["doc_id"]: r["fingerprint"]
            for r in fingerprints(d).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


def test_top_keywords_tfidf(spark):
    from tildener_spark.operators.textstats import top_keywords
    docs = spark.createDataFrame(
        [(1, "apple apple banana common common"),
         (2, "cherry common banana common"),
         (3, "durian common durian")],
        "doc_id long, text string")
    out = top_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rank"], r["token"], r["tf"], r["df"]))
    # 'common' appears in every doc -> idf ln(3/3)=0 -> never the
    # TOP keyword despite the highest tf (it can still fill the tail
    # of a top-k when a doc has fewer than k distinct tokens)
    for doc, kws in by_doc.items():
        assert sorted(kws)[0][1] != "common", (doc, kws)
    # doc 1: apple (tf=2, df=1) ranks above banana (tf=1, df=2)
    assert sorted(by_doc[1])[0][1] == "apple"
    assert sorted(by_doc[3])[0][1] == "durian"
    # df is corpus-wide
    assert {t: d for _, t, _, d in by_doc[1]}["banana"] == 2


def test_repetition_profile_hand_computed(spark):
    from tildener_spark.operators.textstats import repetition_profile
    # doc 0: 4 lines, "aaa bbb" appears 3x -> dup_line_frac = 2/4,
    # dup chars = 2*7 of 4*7+3... lines: aaa bbb(7)x3 + ccc(3)
    # total=24, distinct=10, dup_char_frac=14/24
    # bigram "aaa bbb" count 3, char cov 3*6=18; words: aaa,bbb x3 +
    # ccc = 21 word chars -> top = 18/21
    d = _docs(spark, [
        (0, "aaa bbb\naaa bbb\nccc\naaa bbb"),
        # long all-distinct doc: top-bigram coverage dilutes below
        # the 0.18 threshold (short docs trip it structurally)
        (1, " ".join(f"tok{i:02d}" for i in range(30)) + "\n"
            + " ".join(f"second{i:02d}" for i in range(10))),
        (2, ""),  # degenerate: no lines, no words
    ])
    rows = {r["doc_id"]: r for r in
            repetition_profile(d).collect()}
    r0 = rows[0]
    assert r0["n_lines"] == 4
    assert r0["dup_line_frac"] == 0.5
    assert abs(r0["dup_line_char_frac"] - 14 / 24) < 1e-6
    assert abs(r0["top_bigram_char_frac"] - 18 / 21) < 1e-6
    assert r0["flagged"]
    r1 = rows[1]
    assert r1["dup_line_frac"] == 0.0
    assert r1["dup_line_char_frac"] == 0.0
    assert not r1["flagged"]
    r2 = rows[2]
    assert r2["n_lines"] == 0 and not r2["flagged"]
    assert r2["top_bigram_char_frac"] == 0.0


def test_repetition_profile_single_word_doc(spark):
    from tildener_spark.operators.textstats import repetition_profile
    # one word -> zero bigrams; one line, no dups
    rows = repetition_profile(_docs(spark, [(0, "hello")])).collect()
    r = rows[0]
    assert r["n_lines"] == 1
    assert r["top_bigram_char_frac"] == 0.0
    assert not r["flagged"]


def test_corpus_summary_exact_percentiles(spark):
    from tildener_spark.operators.textstats import corpus_summary
    rows = [("en", "a b c"), ("en", "a b c d e"), ("en", "a"),
            ("de", "x y")]
    d = spark.createDataFrame(rows, "lang string, text string")
    out = {r["lang"]: r for r in corpus_summary(d).collect()}
    en = out["en"]
    assert en["n_docs"] == 3
    assert en["total_tokens"] == 3 + 5 + 1
    # exact interpolated median of [1, 3, 5] token counts
    assert en["p50_tokens"] == 3.0
    # p90 of [1,3,5]: 1 + 0.9*2 interpolation -> between 3 and 5
    assert 3.0 < en["p90_tokens"] <= 5.0
    assert out["de"]["n_docs"] == 1
    assert out["de"]["p50_tokens"] == 2.0


def test_whitespace_class_pins_vertical_tab(spark):
    """Java's \\s matches \\x0b, RE2's classically does not; the
    operators pin an explicit class so a vertical tab splits tokens
    identically in Spark and the DuckDB oracle (ADVICE r3)."""
    import duckdb
    d = spark.createDataFrame(
        [("v", "alpha\x0bbeta gamma", "en")],
        "url string, text string, lang string")
    row = corpus_summary(d, "lang", "text").collect()[0]
    assert row["total_tokens"] == 3  # \x0b is a separator
    oracle = duckdb.sql(
        "select len(string_split_regex(trim('alpha' || chr(11) || "
        "'beta gamma'), '[ \\t\\n\\x0b\\f\\r]+')) n").fetchone()[0]
    assert oracle == 3


def test_ngram_repetition_hand_computed(spark):
    from tildener_spark.operators.textstats import (
        ngram_repetition_profile)
    d = _docs(spark, [
        # "a b c d e" x3: every 5-gram duplicated; word chars = 15
        # dup5 = (3+2+2+2+2)*5/15 (can exceed 1.0 — documented);
        # 10-grams: pos1==pos6 dup, pos2..5 unique -> 2*10/15;
        # top bigram "a b" count 3, char_len 2 -> 6/15
        (0, "a b c d e a b c d e a b c d e"),
        (1, " ".join(f"w{i:02d}" for i in range(40))),  # all distinct
        (2, ""),
        (3, "x y z"),  # short doc structurally trips top-2gram
    ])
    rows = {r["doc_id"]: r for r in
            ngram_repetition_profile(d).collect()}
    r0 = rows[0]
    assert r0["n_words"] == 15
    assert abs(r0["dup_5gram_char_frac"] - 55 / 15) < 1e-6
    assert abs(r0["dup_10gram_char_frac"] - 20 / 15) < 1e-6
    assert abs(r0["top_2gram_char_frac"] - 6 / 15) < 1e-6
    assert r0["flagged"]
    r1 = rows[1]
    assert not r1["flagged"]
    for n in range(5, 11):
        assert r1[f"dup_{n}gram_char_frac"] == 0.0
    assert abs(r1["top_2gram_char_frac"] - 6 / 120) < 1e-6
    r2 = rows[2]
    assert r2["n_words"] == 0 and not r2["flagged"]
    assert r2["top_4gram_char_frac"] == 0.0
    r3 = rows[3]
    # 3 words: no 4..10-grams; "x y" coverage 2/3 > 0.20
    assert r3["dup_5gram_char_frac"] == 0.0
    assert r3["top_4gram_char_frac"] == 0.0
    assert abs(r3["top_2gram_char_frac"] - 2 / 3) < 1e-6
    assert r3["flagged"]


def test_ngram_repetition_zero_shuffle_plan(spark):
    from tildener_spark.operators.textstats import (
        ngram_repetition_profile)
    out = ngram_repetition_profile(_docs(spark, [(0, "a b c")]))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pmi_collocations_known_corpus(spark):
    """'new york' always co-occurs (perfect collocation) while 'the
    of' pairs are independent fillers — PMI must rank the bound pair
    on top with the hand-computed value."""
    import math

    from tildener_spark.operators.textstats import pmi_collocations

    # 10 docs: "new york" x1 each + 4 filler tokens drawn so that
    # fillers pair with many different partners
    rows = [(f"new york a{i} b{i} a{i} c{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "text string")
    got = pmi_collocations(df, min_count=3, top_n=10).collect()
    assert got, "no collocations found"
    top = got[0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    # n12=10, n1=n2=10, n_tok=60, n_bi=50 (5 bigrams per doc)
    expect = round(math.log((10 * 60 / 50) * (60 / (10 * 10))), 6)
    assert top["pmi"] == expect
    assert top["n12"] == 10 and top["n1"] == 10 and top["n2"] == 10


def test_pmi_min_count_filters(spark):
    from tildener_spark.operators.textstats import pmi_collocations

    df = spark.createDataFrame([("rare pair",), ("rare pair",)],
                               "text string")
    assert pmi_collocations(df, min_count=3).count() == 0
    assert pmi_collocations(df, min_count=2).count() == 1
