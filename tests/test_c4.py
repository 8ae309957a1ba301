"""C4-style page cleaning (operators/c4.py)."""

from pyspark.sql import functions as F

from tildener_spark.operators.c4 import c4_clean, filter_c4

GOOD = ("this is a perfectly fine sentence with many words .\n"
        "another long and useful sentence follows right here .\n"
        "a third sentence keeps the page above the line bar .")


def _pages(spark):
    rows = [
        ("u1", GOOD),
        ("u2", GOOD + "\nplease enable javascript to view this ."),
        ("u3", GOOD + "\nthis site uses cookies to improve it ."),
        ("u4", GOOD + "\nread more ."),          # short line
        ("u5", GOOD + "\nno terminal punctuation on this line"),
        ("u6", GOOD + "\nlorem ipsum dolor sit amet consectetur ."),
        ("u7", GOOD + "\nvar config = { mode : production } ."),
        ("u8", GOOD + "\nthe reviewer wrote badword1 in a post ."),
        ("u9", "only two surviving sentences live on this page .\n"
               "the second surviving sentence is right here ."),
        ("u10", ""),                             # empty page
    ]
    return spark.createDataFrame(rows, "url: string, text: string")


def test_rule_matrix(spark):
    out = {r["url"]: r for r in c4_clean(_pages(spark)).collect()}
    assert len(out) == 10                        # no row vanishes
    assert out["u1"]["kept"] and out["u1"]["drop_reason"] is None
    assert out["u1"]["n_kept"] == 3
    # line rules strip the junk line but keep the page
    for u in ("u2", "u3", "u4", "u5"):
        assert out[u]["kept"], u
        assert out[u]["n_lines"] == 4 and out[u]["n_kept"] == 3, u
        assert out[u]["text_clean"] == GOOD
    # page rules drop the page with the right reason
    assert out["u6"]["drop_reason"] == "lorem_ipsum"
    assert out["u7"]["drop_reason"] == "brace"
    assert out["u8"]["drop_reason"] == "badword"
    assert out["u9"]["drop_reason"] == "too_few_lines"
    assert out["u10"]["drop_reason"] == "too_few_lines"
    assert out["u10"]["n_lines"] == 0
    for u in ("u6", "u7", "u8", "u9", "u10"):
        assert not out[u]["kept"] and out[u]["text_clean"] == ""


def test_whitespace_pinning(spark):
    # trailing spaces/tabs/CR before the terminal mark are stripped;
    # \x0b is NOT whitespace under the pinned [ \t\r] classes
    df = spark.createDataFrame(
        [("a", "one two three four five six . \t\r\n"
               "seven eight nine ten eleven twelve !  "),
         ("b", "one two three four five\x0b.")],
        "url: string, text: string")
    out = {r["url"]: r for r in c4_clean(df, min_lines=1).collect()}
    assert out["a"]["n_kept"] == 2 and out["a"]["kept"]
    assert out["a"]["text_clean"] == (
        "one two three four five six .\n"
        "seven eight nine ten eleven twelve !")
    # five\x0b. is one token "five\x0b." -> 5 words, ends '.', kept
    assert out["b"]["n_kept"] == 1


def test_filter_form_preserves_schema(spark):
    df = _pages(spark).withColumn("lang", F.lit("en"))
    kept = filter_c4(df)
    assert kept.columns == ["url", "text", "lang"]
    urls = {r["url"] for r in kept.collect()}
    assert urls == {"u1", "u2", "u3", "u4", "u5"}
    row = kept.filter(F.col("url") == "u2").collect()[0]
    assert row["text"] == GOOD and row["lang"] == "en"


def test_zero_shuffle_plan(spark):
    out = c4_clean(_pages(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
