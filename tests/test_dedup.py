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
