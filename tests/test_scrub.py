"""PII redaction + cross-document paragraph dedup
(operators/scrub.py)."""

from pyspark.sql import functions as F

from tildener_spark.operators.scrub import dedup_paragraphs, redact_pii


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b-c@x.co.uk now"),
         (2, "server 192.168.0.1 up"),
         (3, "call +371 2234 5678 today"),
         (4, "clean text stays clean"),
         (5, "a@b.io at 10.0.0.7 +1 800 555 0100 mixed")],
        "id int, text string")
    got = {r["id"]: r["clean"]
           for r in redact_pii(df).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server <IP> up"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "clean text stays clean"
    assert got[5] == "<EMAIL> at <IP> <PHONE> mixed"


def test_redact_pii_replaces_every_occurrence(spark):
    df = spark.createDataFrame(
        [(1, "x@y.de then z@w.fr")], "id int, text string")
    assert redact_pii(df).first()["clean"] == "<EMAIL> then <EMAIL>"


def test_dedup_paragraphs_global_first_occurrence(spark):
    df = spark.createDataFrame(
        [("a", "shared line\nunique a\n\nshared line"),
         ("b", "unique b\nshared line"),
         ("c", "shared line")],
        "url string, text string")
    rows = {r["url"]: r for r in
            dedup_paragraphs(df, "url", "text").collect()}
    # doc a: 3 non-empty pars; the in-doc repeat of "shared line" at
    # idx 3 loses to its own idx 0 occurrence
    assert rows["a"]["n_pars"] == 3 and rows["a"]["n_kept"] == 2
    assert rows["a"]["text_dedup"] == "shared line\nunique a"
    # doc b keeps only its unique line ("a" owns "shared line")
    assert rows["b"]["text_dedup"] == "unique b"
    # doc c becomes empty but is still present
    assert rows["c"]["n_kept"] == 0 and rows["c"]["text_dedup"] == ""


def test_dedup_paragraphs_partition_invariant(spark):
    from tildener_spark.datagen import gen_doc
    rows = [(f"u{i:03d}", gen_doc(i)["text"]) for i in range(40)]
    df = spark.createDataFrame(rows, "url string, text string")
    a = sorted(map(tuple, dedup_paragraphs(df).collect()))
    b = sorted(map(tuple, dedup_paragraphs(
        df.repartition(13, F.col("text"))).collect()))
    assert a == b
    # the synthetic corpus genuinely contains cross-doc duplicates
    assert sum(r[1] for r in a) > sum(r[2] for r in a)


def test_remove_boilerplate_host_scoped(spark):
    from tildener_spark.operators.scrub import remove_boilerplate
    # "menu home about" appears on 3 a.com pages -> boilerplate at
    # min_docs=3; the same line on b.com (1 page) survives there
    rows = [
        ("https://a.com/1", "menu home about\nunique one"),
        ("https://a.com/2", "menu home about\nunique two"),
        ("https://a.com/3", "menu home about\nmenu home about\nunique three"),
        ("https://b.com/1", "menu home about\nother host line"),
    ]
    d = spark.createDataFrame(rows, "url string, text string")
    out = {r["url"]: r for r in
           remove_boilerplate(d, min_docs=3).collect()}
    assert out["https://a.com/1"]["text_clean"] == "unique one"
    # every occurrence goes, including intra-page repeats
    a3 = out["https://a.com/3"]
    assert a3["n_lines"] == 3 and a3["n_kept"] == 1
    assert a3["text_clean"] == "unique three"
    # df counts DISTINCT pages: 3 distinct a.com urls, not 4 copies
    b1 = out["https://b.com/1"]
    assert b1["n_kept"] == 2  # b.com never crosses the threshold
    assert b1["text_clean"] == "menu home about\nother host line"


def test_remove_boilerplate_all_boiler_page(spark):
    from tildener_spark.operators.scrub import remove_boilerplate
    rows = [(f"https://h.com/{i}", "footer line") for i in range(5)]
    d = spark.createDataFrame(rows, "url string, text string")
    out = remove_boilerplate(d, min_docs=5).collect()
    assert len(out) == 5
    assert all(r["n_kept"] == 0 and r["text_clean"] == "" for r in out)


def test_empty_text_pages_survive(spark):
    """Empty / all-whitespace pages must surface in the output with
    zero counts rather than silently dropping (the aggregate is
    left-joined back onto the input)."""
    from tildener_spark.operators.scrub import remove_boilerplate
    rows = [("https://h.com/empty", ""),
            ("https://h.com/blank", "   \n  \n"),
            ("https://h.com/real", "a real line")]
    d = spark.createDataFrame(rows, "url string, text string")
    out = {r["url"]: r for r in remove_boilerplate(d, min_docs=5).collect()}
    assert len(out) == 3
    assert out["https://h.com/empty"]["n_lines"] == 0
    assert out["https://h.com/empty"]["text_clean"] == ""
    assert out["https://h.com/blank"]["n_lines"] == 0
    assert out["https://h.com/real"]["n_kept"] == 1

    ded = {r["url"]: r for r in dedup_paragraphs(d, "url", "text").collect()}
    assert len(ded) == 3
    assert ded["https://h.com/empty"]["n_pars"] == 0
    assert ded["https://h.com/empty"]["text_dedup"] == ""
    assert ded["https://h.com/blank"]["n_pars"] == 0
