"""JSONL source/sink (sources/jsonl.py)."""

import os
import tempfile

from pyspark.sql import functions as F

from tildener_spark.sources.jsonl import (
    bad_line_count, read_jsonl, write_jsonl)


def test_roundtrip_unicode_and_escapes(spark):
    rows = [(0, 'plain text', 'en'),
            (1, 'diakritikas āčē un "citāts" \\ backslash', 'lv'),
            (2, 'tab\there newline\nthere', 'en'),
            (3, '', 'und')]
    df = spark.createDataFrame(rows,
                               "doc_id bigint, text string, lang string")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "docs")
        write_jsonl(df, p, n_files=3)
        back = read_jsonl(spark, p, "doc_id bigint, text string, "
                                    "lang string")
        assert bad_line_count(back) == 0
        got = sorted(map(tuple, back.drop("_corrupt").collect()))
        assert got == sorted(rows)


def test_corrupt_lines_surface_not_throw(spark):
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "in")
        os.makedirs(p)
        with open(os.path.join(p, "part-0.json"), "w") as f:
            f.write('{"doc_id": 1, "text": "ok"}\n')
            f.write('not json at all\n')
            f.write('{"doc_id": 2, "text": "also ok"}\n')
        back = read_jsonl(spark, p, "doc_id bigint, text string")
        assert bad_line_count(back) == 1
        good = back.filter(F.col("_corrupt").isNull())
        assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]


def test_shard_count_controls_parallelism(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"))
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "out")
        write_jsonl(df, p, n_files=5, compression="none")
        parts = [f for f in os.listdir(p) if f.startswith("part-")]
        assert len(parts) == 5
        back = read_jsonl(spark, p, "doc_id bigint, text string")
        assert back.count() == 100
