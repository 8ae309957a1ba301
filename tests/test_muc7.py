"""MUC-7 inline markup round trip (NEPreprocess.pm:81-161, 422-506)."""

import pyspark.sql.functions as F

from tildener_spark.functions.muc7 import (
    add_markup, add_markup_py, detag_muc7, detag_muc7_py,
)

TAGGED = (
    'Vakar <ENAMEX TYPE="PERSON">Jānis Bērziņš</ENAMEX> apmeklēja '
    '<ENAMEX TYPE="LOCATION">Rīgu</ENAMEX>.\n'
    '<TIMEX TYPE="DATE">2001 janvārī</TIMEX> <ENAMEX TYPE="ORGANIZATION">'
    'SIA Grauds</ENAMEX> maksāja <NUMEX TYPE="MONEY">100 latu</NUMEX>.'
)


def test_detag_offsets_and_types():
    d = detag_muc7_py(TAGGED)
    text = d["text"]
    assert "<" not in text and ">" not in text
    by_type = {}
    for s in d["spans"]:
        lines = text.split("\n")
        frag = lines[s["line_from"]][s["col_from"]:s["col_to"] + 1]
        by_type.setdefault(s["ne_type"], []).append(frag)
    assert by_type["PERS"] == ["Jānis Bērziņš"]
    assert by_type["LOC"] == ["Rīgu"]
    assert by_type["ORG"] == ["SIA Grauds"]
    assert by_type["DATE"] == ["2001 janvārī"]
    assert by_type["MON"] == ["100 latu"]


def test_round_trip_exact():
    d = detag_muc7_py(TAGGED)
    retagged = add_markup_py(d["text"], d["spans"])
    assert retagged == TAGGED
    d2 = detag_muc7_py(retagged)
    assert d2 == d


def test_empty_and_plain():
    assert detag_muc7_py(None) == {"text": "", "spans": []}
    assert detag_muc7_py("plain text") == {
        "text": "plain text", "spans": []}
    assert add_markup_py("plain", []) == "plain"


def test_udfs_on_dataframe(spark):
    df = spark.createDataFrame(
        [("u1", TAGGED), ("u2", "nothing here")], ["url", "tagged"])
    out = (
        df.withColumn("d", detag_muc7("tagged"))
        .withColumn("rt", add_markup(F.col("d.text"), F.col("d.spans")))
    )
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u1"]["rt"] == TAGGED
    assert rows["u2"]["d"]["text"] == "nothing here"
    assert rows["u2"]["rt"] == "nothing here"


def test_pipeline_mentions_produce_valid_markup(spark):
    """Markup built from real pipeline mentions detags back to the
    same offsets (the flagship output of NEMuc7TagPlaintext.pl)."""
    from tildener_spark.config import EngineConfig
    from tildener_spark.datagen import corpus_df, gazetteer_df, split_gold
    from tildener_spark.plans.pipeline import run_pipeline

    corpus = corpus_df(spark, 10)
    pages, *_ = split_gold(corpus)
    res = run_pipeline(spark, pages, gazetteer_df(spark), EngineConfig())
    spans = (
        res.mentions.groupBy("url").agg(
            F.collect_list(F.struct(
                "ne_type", "line_from", "col_from", "line_to", "col_to"))
            .alias("spans"))
    )
    tagged = (
        pages.join(spans, "url", "left")
        .withColumn("muc7", add_markup(
            F.col("text"),
            F.coalesce("spans", F.array().cast(
                "array<struct<ne_type:string,line_from:int,col_from:int,"
                "line_to:int,col_to:int>>"))))
        .withColumn("rt", detag_muc7("muc7"))
    )
    bad = tagged.filter(F.col("rt.text") != F.col("text")).count()
    assert bad == 0
    n_spans = tagged.select(
        F.sum(F.size("rt.spans")).alias("n")).collect()[0]["n"]
    n_mentions = res.mentions.count()
    assert n_spans == n_mentions
