"""Evaluator semantics (NEEvaluation_v2.pl re-expression)."""

from tildener_spark.operators.evaluate import span_eval, token_eval


def test_token_eval_counts(spark):
    gold = spark.createDataFrame(
        [("u", 0, "B-LOC"), ("u", 1, "O"), ("u", 2, "B-LOC"),
         ("u", 3, "B-ORG")],
        "url string, tok_id int, ne_tag string")
    pred = spark.createDataFrame(
        [("u", 0, "B-LOC"), ("u", 1, "B-LOC"), ("u", 2, "O"),
         ("u", 3, "B-ORG")],
        "url string, tok_id int, ne_tag string")
    rows = {r["label"]: r for r in token_eval(gold, pred).collect()}
    loc = rows["B-LOC"]
    # relevant 2, retrieved 2, rr 1 -> P=R=50%; nn = 4-2-2+1 = 1
    assert (loc["relevant"], loc["retrieved"], loc["rr"]) == (2, 2, 1)
    assert loc["precision"] == 50.0 and loc["recall"] == 50.0
    assert loc["accuracy"] == 50.0  # (1+1)/4
    org = rows["B-ORG"]
    assert org["precision"] == 100.0 and org["recall"] == 100.0
    tot = rows["TOTAL_TOKEN"]
    assert (tot["relevant"], tot["retrieved"], tot["rr"]) == (3, 3, 2)


def test_token_eval_zero_denominator_is_null(spark):
    gold = spark.createDataFrame([("u", 0, "B-LOC")],
                                 "url string, tok_id int, ne_tag string")
    pred = spark.createDataFrame([("u", 0, "O")],
                                 "url string, tok_id int, ne_tag string")
    rows = {r["label"]: r for r in token_eval(gold, pred).collect()}
    assert rows["B-LOC"]["precision"] is None  # retrieved = 0 -> '-'
    assert rows["B-LOC"]["recall"] == 0.0


def test_span_eval_exact_match_only(spark):
    schema = ("url string, line_from int, col_from int, line_to int,"
              "col_to int, ne_type string")
    gold = spark.createDataFrame(
        [("u", 0, 0, 0, 5, "PERS"), ("u", 1, 0, 1, 3, "LOC")], schema)
    pred = spark.createDataFrame(
        [("u", 0, 0, 0, 5, "PERS"), ("u", 1, 0, 1, 4, "LOC")], schema)
    rows = {r["label"]: r for r in span_eval(gold, pred).collect()}
    assert rows["PERS"]["f1"] == 100.0
    assert rows["LOC"]["rr"] == 0  # boundary mismatch -> not correct
    assert rows["TOTAL_NE"]["rr"] == 1
