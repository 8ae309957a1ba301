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


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a content hash is
    emitted exactly once over the life of the query."""
    import pyspark.sql.functions as F
    from tildener_spark.streaming.dedup import (
        dedup_stream, run_dedup_available_now)
    from tildener_spark.streaming.incremental import stream_pages

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    corpus = corpus_df(spark, 6)
    pages, *_ = split_gold(corpus)
    pages = pages.orderBy("url").cache()
    cols = ["url", "warc_ts", "html", "text", "lang"]
    all_rows = pages.select(*cols).collect()

    def write(rows, mode):
        spark.createDataFrame(rows, pages.select(*cols).schema) \
            .write.mode(mode).parquet(in_dir)

    # batch 1: 4 docs plus one exact-duplicate text under another url
    b1 = all_rows[:4]
    dup = b1[0].asDict()
    dup["url"] = dup["url"] + "#copy"
    write(b1 + [type(b1[0])(**dup)], "overwrite")

    run_dedup_available_now(
        dedup_stream(stream_pages(spark, in_dir)), out_dir, ck_dir)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 4  # 5 rows in, 1 duplicate swallowed
    assert out1.select("text_hash").distinct().count() == 4
    # representative is the min url of the duplicate pair
    assert out1.filter(F.col("url").endswith("#copy")).count() == 0

    # batch 2: re-send one old doc + two genuinely new docs
    old = b1[1].asDict()
    old["url"] = old["url"] + "#resend"
    write([type(b1[0])(**old)] + all_rows[4:6], "append")

    run_dedup_available_now(
        dedup_stream(stream_pages(spark, in_dir)), out_dir, ck_dir)
    out2 = spark.read.parquet(out_dir)
    # only the two new hashes were appended; the resent hash stayed
    # swallowed by the cross-batch state
    assert out2.count() == 6
    assert out2.select("text_hash").distinct().count() == 6
    assert out2.filter(F.col("url").endswith("#resend")).count() == 0


def test_watermarked_window_aggregation(spark, tmp_path):
    """Event-time windows + watermark: closed windows emit once; an
    event far behind the watermark is dropped, a late-but-within-
    horizon event updates its window before it closes."""
    import datetime as dt
    import pyspark.sql.functions as F
    from tildener_spark.streaming.windows import (
        run_windowed_available_now, stream_events, windowed_counts)

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ck_dir = str(tmp_path / "ev_ck")
    T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(specs):
        return [(i, 1, T0 + dt.timedelta(minutes=m), et, 1.0)
                for i, (m, et) in enumerate(specs)]

    schema = ("event_id long, user_id long, ts timestamp, "
              "event_type string, value double")

    # batch 1: events in hours 0,1,2 and far ahead (hour 6) to push
    # the watermark past hours 0-3
    spark.createDataFrame(
        rows([(5, "a"), (65, "a"), (125, "b"), (360, "z")]),
        schema).write.mode("overwrite").parquet(in_dir)
    run_windowed_available_now(
        windowed_counts(stream_events(spark, in_dir)), out_dir, ck_dir)
    out1 = spark.read.parquet(out_dir)
    got1 = {(r["win_start"].hour, r["event_type"]): r["n"]
            for r in out1.collect()}
    # hours 0-2 closed (watermark = 6:00 - 2h = 4:00); hour 6 still open
    assert got1 == {(0, "a"): 1, (1, "a"): 1, (2, "b"): 1}

    # batch 2: an event at hour 1 is BEHIND the watermark -> dropped;
    # one in hour 5 is within horizon -> counted when its window
    # closes (push watermark with an hour-9 event)
    spark.createDataFrame(
        rows([(70, "late"), (310, "c"), (540, "z")]),
        schema).write.mode("append").parquet(in_dir)
    run_windowed_available_now(
        windowed_counts(stream_events(spark, in_dir)), out_dir, ck_dir)
    got2 = {(r["win_start"].hour, r["event_type"]): r["n"]
            for r in spark.read.parquet(out_dir).collect()}
    assert (5, "c") in got2        # late-but-in-horizon counted
    assert (6, "z") in got2        # previously open window now closed
    assert not any(et == "late" for _h, et in got2)  # dropped
