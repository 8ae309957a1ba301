"""Positional writeback joins (WriteNEtagsInTokens / AddNewTags)."""

from tildener_spark.operators.retag import add_new_tags, write_tags_from_spans


def _tokens(spark):
    rows = [
        # url, tok_id, line_from, col_from, line_to, col_to
        ("u1", 0, 0, 0, 0, 4),
        ("u1", 1, 0, 6, 0, 12),
        ("u1", 2, 0, 14, 0, 15),
        ("u1", 3, 1, 0, 1, 3),
    ]
    return spark.createDataFrame(
        rows, "url string, tok_id int, line_from int, col_from int, "
              "line_to int, col_to int")


def test_write_tags_from_spans(spark):
    spans = spark.createDataFrame(
        [("u1", 0, 1, "PERS", 0.9)],
        "url string, begin_tok int, end_tok int, ne_type string, "
        "avg_prob double")
    out = {r["tok_id"]: (r["ne_tag"], r["ne_prob"])
           for r in write_tags_from_spans(_tokens(spark), spans).collect()}
    assert out[0] == ("B-PERS", 0.9)
    assert out[1] == ("I-PERS", 0.9)
    assert out[2] == ("O", 0.0)
    assert out[3] == ("O", 0.0)


def test_add_new_tags_alignment_and_drop(spark):
    standoff = spark.createDataFrame(
        [
            ("u1", "PERS", 0, 0, 0, 12),   # aligns tok 0..1
            ("u1", "LOC", 1, 0, 1, 3),     # aligns tok 3
            ("u1", "ORG", 0, 7, 0, 12),    # start misaligned -> dropped
            ("u1", "ORG", 0, 14, 0, 99),   # end misaligned -> dropped
        ],
        "url string, ne_type string, line_from int, col_from int, "
        "line_to int, col_to int")
    out = {r["tok_id"]: r["ne_tag"]
           for r in add_new_tags(_tokens(spark), standoff).collect()}
    assert out == {0: "B-PERS", 1: "I-PERS", 2: "O", 3: "B-LOC"}
