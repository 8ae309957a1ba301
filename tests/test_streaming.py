"""Structured Streaming ingest (Trigger.AvailableNow drain)."""

from tildener_spark.datagen import corpus_df, split_gold, world_gazetteer
from tildener_spark.streaming.incremental import (
    run_available_now, stream_pages, tag_stream)


def test_available_now_drain(spark, tmp_path):
    corpus = corpus_df(spark, 8)
    pages, *_ = split_gold(corpus)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    pages.write.parquet(in_dir)

    stream = stream_pages(spark, in_dir)
    assert stream.isStreaming
    tagged = tag_stream(stream, world_gazetteer())
    run_available_now(tagged, out_dir, ck_dir)

    out = spark.read.parquet(out_dir)
    assert out.count() == 8
    assert set(out.columns) == {"url", "lang", "tokens"}

    # idempotent re-run: no new input -> no duplicate output
    stream2 = stream_pages(spark, in_dir)
    run_available_now(tag_stream(stream2, world_gazetteer()),
                      out_dir, ck_dir)
    assert spark.read.parquet(out_dir).count() == 8
