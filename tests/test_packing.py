"""Sequence packing (operators/packing.py) + NFC normalization
(operators/scrub.py normalize_nfc)."""

import unicodedata

from pyspark.sql import functions as F

from tildener_spark.operators.packing import pack_sequences
from tildener_spark.operators.scrub import NFC_PAIRS, normalize_nfc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_single_shard_layout(spark):
    # one shard (n_shards=1): 3+4+2+5 tokens, budget 4
    d = _docs(spark, [
        (0, "a b c"),            # toks 0-2   -> seq 0
        (1, "d e f g"),          # toks 3-6   -> seqs 0-1
        (2, "h i"),              # toks 7-8   -> seqs 1-2
        (3, "j k l m n"),        # toks 9-13  -> seqs 2-3
    ])
    got = {r["doc_id"]: r for r in
           pack_sequences(d, budget=4, n_shards=1).collect()}
    assert (got[0]["start_tok"], got[0]["seq_first"],
            got[0]["seq_last"], got[0]["n_seqs"]) == (0, 0, 0, 1)
    assert (got[1]["start_tok"], got[1]["seq_first"],
            got[1]["seq_last"], got[1]["n_seqs"]) == (3, 0, 1, 2)
    assert (got[2]["seq_first"], got[2]["seq_last"]) == (1, 2)
    assert (got[3]["seq_first"], got[3]["seq_last"],
            got[3]["n_seqs"]) == (2, 3, 2)


def test_pack_sequences_blank_doc_occupies_nothing(spark):
    d = _docs(spark, [(0, "a b"), (1, "   "), (2, "c d e")])
    got = {r["doc_id"]: r for r in
           pack_sequences(d, budget=4, n_shards=1).collect()}
    assert got[1]["n_tokens"] == 0 and got[1]["n_seqs"] == 0
    assert got[1]["start_tok"] == 2
    assert got[1]["seq_first"] == got[1]["seq_last"] == 0
    # the blank doc does not shift doc 2: tokens 2-4 straddle the
    # budget-4 boundary, so it touches two sequences
    assert got[2]["start_tok"] == 2
    assert got[2]["n_seqs"] == 2


def test_pack_sequences_shards_are_independent(spark):
    rows = [(i, "w " * (i + 1)) for i in range(20)]
    d = _docs(spark, [(i, t.strip()) for i, t in rows])
    got = pack_sequences(d, budget=8, n_shards=4).collect()
    # shard assignment is doc_id mod 4
    assert all(r["shard"] == r["doc_id"] % 4 for r in got)
    # within each shard, offsets are the running sum in doc_id order
    by_shard = {}
    for r in sorted(got, key=lambda r: (r["shard"], r["doc_id"])):
        expect = by_shard.get(r["shard"], 0)
        assert r["start_tok"] == expect
        by_shard[r["shard"]] = expect + r["n_tokens"]
    # partition-invariance: same placement under a different layout
    again = pack_sequences(d.repartition(13), budget=8,
                           n_shards=4).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_nfc_pairs_are_canonical_decompositions():
    for pre, dec in NFC_PAIRS:
        assert len(pre) == 1 and len(dec) == 2
        assert unicodedata.normalize("NFD", pre) == dec
        assert unicodedata.normalize("NFC", dec) == pre


def test_normalize_nfc_recomposes_and_passes_through(spark):
    decomposed = "".join(dec for _, dec in NFC_PAIRS)
    precomposed = "".join(pre for pre, _ in NFC_PAIRS)
    d = spark.createDataFrame(
        [(0, decomposed), (1, "plain ascii"), (2, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r["text_nfc"]
           for r in normalize_nfc(d).collect()}
    assert got[0] == precomposed
    assert got[1] == "plain ascii"
    assert got[2] is None


def test_chunk_documents_hand_computed(spark):
    from tildener_spark.operators.packing import chunk_documents
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))),  # 10 toks
         (1, "a b c"),                               # short: 1 chunk
         (2, ""), (3, "   ")],                       # no chunks
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=4, stride=2)
    rows = sorted((r["doc_id"], r["chunk_id"], r["start_token"],
                   r["n_tokens"], r["chunk_text"])
                  for r in out.collect())
    # doc 0: starts 0,2,4,6 -> last window t6..t9 ends at n_tok
    assert [r for r in rows if r[0] == 0] == [
        (0, 0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 2, 4, "t2 t3 t4 t5"),
        (0, 2, 4, 4, "t4 t5 t6 t7"),
        (0, 3, 6, 4, "t6 t7 t8 t9"),
    ]
    assert [r for r in rows if r[0] == 1] == [(1, 0, 0, 3, "a b c")]
    assert not [r for r in rows if r[0] >= 2]


def test_chunk_documents_no_contained_tail(spark):
    from tildener_spark.operators.packing import chunk_documents
    # 5 tokens, chunk 4, stride 2: starts 0,2 (naive loop would
    # also emit start 4, fully inside the start-2 window's range)
    docs = spark.createDataFrame([(0, "a b c d e")],
                                 "doc_id long, text string")
    rows = sorted((r["chunk_id"], r["start_token"], r["chunk_text"])
                  for r in chunk_documents(
                      docs, chunk_tokens=4, stride=2).collect())
    assert rows == [(0, 0, "a b c d"), (1, 2, "c d e")]


def test_chunk_documents_zero_shuffle(spark):
    from tildener_spark.operators.packing import chunk_documents
    docs = spark.createDataFrame([(0, "a b c")],
                                 "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
