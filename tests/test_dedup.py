"""Dedup operators: exact, jaccard, minhash-LSH, simhash."""

from tildener_spark.operators.dedup import (
    exact_duplicates, minhash_lsh_pairs, ngram_jaccard_pairs,
    simhash_duplicates)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "The  quick brown fox jumps over the lazy dog today"),  # ws/case
    (2, "the quick brown fox jumps over the lazy cat today"),   # near-dup
    (3, "completely different text about spark shuffle joins"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates_normalized(spark):
    out = exact_duplicates(_docs(spark)).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["representative"] == 0


def test_ngram_jaccard(spark):
    out = ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_pairs(spark):
    got = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_pairs(_docs(spark)).collect()}
    assert (0, 1) in got
    assert (0, 3) not in got


def test_simhash(spark):
    out = simhash_duplicates(_docs(spark), max_hamming=4)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in got
    assert (0, 3) not in got


def test_skew_guard_max_df(spark):
    # with max_df=1 every shared shingle is dropped -> no pairs
    out = ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.1, max_df=1)
    assert out.collect() == []


def test_near_dup_clusters_end_artifact(spark):
    from tildener_spark.operators.dedup import near_dup_clusters
    rows = {r["doc_id"]: (r["cluster"], r["keep"])
            for r in near_dup_clusters(_docs(spark)).collect()}
    assert set(rows) == {0, 1, 2, 3}           # every doc labeled
    # 0/1 (and possibly 2) collapse into the min-id cluster, which
    # keeps exactly its representative
    assert rows[0] == (0, True)
    assert rows[1] == (0, False)
    # the unrelated doc is a kept singleton
    assert rows[3] == (3, True)
    # exactly one keeper per cluster
    from collections import Counter
    keepers = Counter(c for c, k in rows.values() if k)
    assert all(v == 1 for v in keepers.values())


def test_cross_doc_dup_score(spark):
    """Shared 8-gram windows across docs are counted per doc; unique
    docs score 0; short docs get n_windows = 0, not a null/crash."""
    from tildener_spark.operators.dedup import cross_doc_dup_score
    shared = "viens divi tris cetri pieci sesi septini astoni"
    rows = [
        (0, shared + " devini desmit"),            # shares the 8-gram
        (1, shared + " vienpadsmit divpadsmit"),   # with doc 0
        (2, "pavisam cita lapa bez sakritibam nekur neatkartojas "
            "nemaz vispar"),                       # unique
        (3, "isa lapa"),                           # < 8 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cross_doc_dup_score(docs, n=8).collect()}
    assert len(out) == 4
    assert out[0]["n_shared"] >= 1 and out[1]["n_shared"] >= 1
    # the shared window count is symmetric for the common prefix
    assert out[0]["n_shared"] == out[1]["n_shared"]
    assert out[2]["n_shared"] == 0 and out[2]["dup_frac"] == 0.0
    assert out[3]["n_windows"] == 0 and out[3]["dup_frac"] == 0.0
    for r in out.values():
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_dup_span_removal(spark):
    """ExactSubstr-style span cutting (Lee et al. 2022): shared
    5-token windows merge into maximal spans and are removed; the
    unique remainder survives token-exactly; within-doc repeats of a
    cross-doc gram are all removed; empty/short docs pass through."""
    from tildener_spark.operators.dedup import dup_span_removal
    rows = [
        (1, "SHARED HEADER LINE ONE TWO unique alpha beta gamma delta"),
        (2, "SHARED HEADER LINE ONE TWO other content here now ok"),
        (3, "totally unique document with no overlap at all whatsoever"),
        (4, ""),
        (5, "short doc"),
        (6, "x y SHARED HEADER LINE ONE TWO z SHARED HEADER "
            "LINE ONE TWO tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_removal(docs, n=5).collect()}
    assert len(out) == 6
    assert out[1]["kept_text"] == "unique alpha beta gamma delta"
    assert out[2]["kept_text"] == "other content here now ok"
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 5
    assert out[1]["dup_ratio"] == 0.5
    # unique doc untouched
    assert out[3]["kept_text"] == rows[2][1] and out[3]["n_spans"] == 0
    # empty + shorter-than-n docs survive unchanged
    assert out[4]["kept_text"] == "" and out[4]["n_tokens"] == 0
    assert out[5]["kept_text"] == "short doc" and out[5]["dup_ratio"] == 0.0
    # both occurrences inside doc 6 are cut; spans don't merge across
    # the 'z' gap
    assert out[6]["kept_text"] == "x y z tail"
    assert out[6]["n_spans"] == 2 and out[6]["dup_tokens"] == 10


def test_dup_span_removal_overlap_merge(spark):
    """Overlapping windows coalesce into ONE maximal span: a 7-token
    run shared between two docs yields three 5-gram hits (pos 0,1,2)
    merging to a single [0,7) span, not three."""
    from tildener_spark.operators.dedup import dup_span_removal
    run = "a b c d e f g"
    rows = [(1, run + " uniq1 uniq2"), (2, run + " cits gals te")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dup_span_removal(docs, n=5).collect()}
    assert out[1]["n_spans"] == 1 and out[1]["dup_tokens"] == 7
    assert out[1]["kept_text"] == "uniq1 uniq2"
    assert out[2]["kept_text"] == "cits gals te"


def test_incremental_dedup_flags_recrawls(spark):
    from tildener_spark.operators.dedup import incremental_dedup
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    old = spark.createDataFrame(
        [(1, base), (2, "an entirely different old document about "
                        "shipping container logistics and ports")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, base),                              # exact re-crawl
         (11, base.replace("tonight", "today")),  # near-dup
         (12, "completely fresh content mentioning nothing that "
              "appeared in any previously held document at all")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           incremental_dedup(old, new).collect()}
    assert len(out) == 3                          # every new doc
    assert out[10]["is_dup"] and out[10]["first_match"] == 1
    assert out[11]["is_dup"] and out[11]["first_match"] == 1
    assert not out[12]["is_dup"]
    assert out[12]["n_matches"] == 0 and out[12]["first_match"] is None


def test_incremental_dedup_old_bucket_guard(spark):
    from tildener_spark.operators.dedup import incremental_dedup
    # 30 identical old docs blow past max_bucket=10: the index-side
    # guard drops that bucket, so the matching new doc reports clean
    # (guard fired, documented trade)
    txt = ("repeated boilerplate page body that is long enough to "
           "produce a full set of character shingles for hashing")
    old = spark.createDataFrame([(i, txt) for i in range(30)],
                                "doc_id long, text string")
    new = spark.createDataFrame([(100, txt)], "doc_id long, text string")
    out = incremental_dedup(old, new, max_bucket=10).collect()
    assert len(out) == 1 and not out[0]["is_dup"]
